"""lithographysimulator_tpu — TPU-native Fourier-optics lithography imaging.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
quarterwave0/LithographySimulator: Fraunhofer binary-mask diffraction (direct
and Gau'23 wavelength-scaling FFT solvers), Zernike-aberrated pupil
functions, classical/annular/quasar illumination, and Abbe partial-coherence
aerial-image formation — all as jit-compiled XLA programs with static shapes,
batched FFTs, and ICI-sharded source-point parallelism.
"""

from .config import (DEMO_CONFIG, LaserSpectrum, OpticsConfig,
                     WavelengthScaling, nearest_pow2)
from .grid import Grid, unit_disk_mask
from .models.mask import (
    Mask,
    alternating_psm,
    attenuated_psm,
    contact_holes,
    demo_bars,
    from_array,
    lines_and_spaces,
)
from .metrology import (apply_dose_map, defect_printability,
                        dose_correction_map, orc_check,
                        tiled_fem, tiled_focus_images,
                        tiled_meef, tiled_meef_map, tiled_stochastic)
from .models.pupil import Pupil, pupil_function
from .models.resist import (DepthResist, MackResist, ResistModel,
                            cd_uniformity, critical_dimension,
                            aligned_edge_positions,
                            edge_placement_errors, feature_table,
                            hotspots, nils_table,
                            pattern_fidelity, swing_curve)
from .models.calibrate import calibrate_resist, gauge_cd
from .models.mrc import MaskRules, mrc_check, mrc_clean
from .models.multipatterning import (decompose_lele,
                                     decompose_multipatterning, lele_print,
                                     multipatterning_print)
from .models.sraf import sraf_band, sraf_insert, sraf_print_check
from .models.source import LightSource
from .models.stochastic import (StochasticResist, acf_correlation_length,
                                edge_psd, exposure_summary, exposure_trials,
                                fit_psd_model, stochastic_ensemble,
                                stochastic_psd)
from .ops.compensated import matmul_compensated
from .ops.abbe import (
    SourcePoints,
    abbe_image,
    abbe_image_points,
    accumulate_intensity,
    source_points,
)
from .ops.focus import (chromatic_aberrations, focus_stack_aberrations,
                        through_focus_images)
from .ops.fraunhofer import mask_spectrum, spectrum_direct, spectrum_fft
from .ops.hopkins import (SOCSKernels, principal_channel_rotation,
                          randomized_socs,
                          randomized_socs_chromatic, randomized_socs_components,
                          randomized_socs_vector, socs_image,
                          tcc_eigensystem)
from .ops.filmstack import (WaferStack, film_component_multipliers,
                            film_depth_factors, open_frame_profile,
                            substrate_reflectance, underlayer_sweep)
from .ops.perturb import ImagePerturbation, apply_perturbation
from .ops.mask3d import (BoundaryLayer, EdgeKernelM3D, apply_boundary_layers,
                         apply_edge_kernel, boundary_layer_from_rcwa,
                         edge_fields_signed, fit_boundary_layer,
                         fit_edge_kernel, model_from_json, model_to_json)
from .ops.rcwa import (GratingLayer, MASK_STACKS, MaskStack, rcwa_effective_mask,
                       rcwa_orders, resolve_stack, thin_mask_transmission)
from .ops.tiled import (array_window_fn, default_halo, tiled_film_stack,
                        tiled_socs_image, tiled_socs_image_field,
                        tiled_socs_image_scan, tiled_socs_image_stream)
from .ops.vector import polarization_states, vector_abbe_image, vector_pupils
from .ops.zernike import (fringe_index_to_mn, noll_index_to_mn,
                          osa_index_to_mn, to_osa_coefficients,
                          wavefront_error, zernike_basis)
from .simulate import (SimulationResult, film_socs_kernels, film_socs_stack,
                       film_stack_images, simulate, simulate_batch)

__version__ = "0.1.0"

__all__ = [
    "DEMO_CONFIG",
    "Grid",
    "LightSource",
    "MackResist",
    "Mask",
    "LaserSpectrum",
    "OpticsConfig",
    "Pupil",
    "ResistModel",
    "SimulationResult",
    "SOCSKernels",
    "SourcePoints",
    "WavelengthScaling",
    "BoundaryLayer",
    "ImagePerturbation",
    "apply_perturbation",
    "abbe_image",
    "abbe_image_points",
    "alternating_psm",
    "apply_boundary_layers",
    "attenuated_psm",
    "accumulate_intensity",
    "fit_boundary_layer",
    "boundary_layer_from_rcwa",
    "EdgeKernelM3D",
    "apply_edge_kernel",
    "edge_fields_signed",
    "fit_edge_kernel",
    "model_from_json",
    "model_to_json",
    "GratingLayer",
    "MASK_STACKS",
    "MaskStack",
    "rcwa_effective_mask",
    "rcwa_orders",
    "resolve_stack",
    "thin_mask_transmission",
    "contact_holes",
    "StochasticResist",
    "cd_uniformity",
    "critical_dimension",
    "nils_table",
    "hotspots",
    "calibrate_resist",
    "gauge_cd",
    "MaskRules",
    "mrc_check",
    "mrc_clean",
    "decompose_lele",
    "decompose_multipatterning",
    "lele_print",
    "multipatterning_print",
    "sraf_band",
    "sraf_insert",
    "sraf_print_check",
    "exposure_trials",
    "exposure_summary",
    "stochastic_ensemble",
    "stochastic_psd",
    "edge_psd",
    "fit_psd_model",
    "acf_correlation_length",
    "aligned_edge_positions",
    "edge_placement_errors",
    "feature_table",
    "default_halo",
    "demo_bars",
    "DepthResist",
    "matmul_compensated",
    "simulate_batch",
    "WaferStack",
    "film_component_multipliers",
    "film_depth_factors",
    "film_socs_kernels",
    "film_socs_stack",
    "film_stack_images",
    "open_frame_profile",
    "substrate_reflectance",
    "underlayer_sweep",
    "tiled_fem",
    "tiled_focus_images",
    "tiled_meef",
    "apply_dose_map",
    "defect_printability",
    "dose_correction_map",
    "orc_check",
    "tiled_meef_map",
    "tiled_stochastic",
    "chromatic_aberrations",
    "focus_stack_aberrations",
    "from_array",
    "lines_and_spaces",
    "mask_spectrum",
    "nearest_pow2",
    "pattern_fidelity",
    "swing_curve",
    "osa_index_to_mn",
    "noll_index_to_mn",
    "fringe_index_to_mn",
    "to_osa_coefficients",
    "pupil_function",
    "randomized_socs",
    "randomized_socs_chromatic",
    "principal_channel_rotation",
    "randomized_socs_components",
    "randomized_socs_vector",
    "simulate",
    "socs_image",
    "source_points",
    "spectrum_direct",
    "spectrum_fft",
    "tcc_eigensystem",
    "tiled_film_stack",
    "tiled_socs_image",
    "tiled_socs_image_field",
    "tiled_socs_image_scan",
    "tiled_socs_image_stream",
    "array_window_fn",
    "through_focus_images",
    "unit_disk_mask",
    "vector_abbe_image",
    "vector_pupils",
    "polarization_states",
    "wavefront_error",
    "zernike_basis",
]
