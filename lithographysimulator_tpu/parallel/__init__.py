from .abbe_sharded import abbe_image_sharded, padded_source_arrays, through_focus_sharded
from .fem_sharded import fem_cd_matrix_sharded
from .film_sharded import film_images_sharded, film_stack_sharded
from .mesh import FOCUS_AXIS, SOURCE_AXIS, focus_source_mesh, source_mesh
from .socs_build_sharded import (
    randomized_socs_components_sharded,
    randomized_socs_sharded,
)
from .socs_sharded import pad_socs_rank, socs_image_sharded
from .stochastic_sharded import (print_probability_sharded,
                                print_probability_volume_sharded)
from .tiled_sharded import tiled_socs_image_sharded
from .distributed import initialize as initialize_distributed
