from ..xfer import to_device_complex, to_host_complex
from .artifacts import (
    SOCSCache,
    config_fingerprint,
    load_image,
    load_socs,
    save_image,
    save_socs,
)
from .profiling import StageTimer, annotate, device_info, trace
