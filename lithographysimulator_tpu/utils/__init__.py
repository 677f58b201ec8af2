from .artifacts import (
    SOCSCache,
    config_fingerprint,
    load_image,
    load_socs,
    save_image,
    save_socs,
)
from .profiling import StageTimer, annotate, trace
