from .mask import (Mask, alternating_psm, attenuated_psm, contact_holes, demo_bars, from_array, lines_and_spaces)
from .pupil import Pupil, pupil_function
from .source import LightSource
from .resist import (MackResist, ResistModel, critical_dimension, exposure_latitude, meef, pattern_fidelity, process_window)
