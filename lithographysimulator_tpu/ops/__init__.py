from .abbe import SourcePoints, abbe_image, abbe_image_points, accumulate_intensity, source_points
from .fourier import centered_fft2, centered_ifft2, crop_center, pad_center
from .fraunhofer import mask_spectrum, separable_dft, spectrum_direct, spectrum_fft
from .resize import bilinear_resize
from .zernike import osa_index_to_mn, wavefront_error, zernike_basis

# .focus is imported lazily by the top-level package: it depends on
# models.pupil, which itself imports ops.zernike — an eager import here
# would be circular.
from .hopkins import (SOCSKernels, randomized_socs,
                      randomized_socs_vector, socs_image, tcc_eigensystem)
from .tiled import default_halo, tiled_socs_image, tiled_socs_image_scan
