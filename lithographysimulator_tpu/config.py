"""Optics configuration and wavelength-scaling (Gau 2023) parameters.

All static geometry/solver parameters live here as frozen dataclasses so they
are hashable and can be closed over by ``jax.jit`` as compile-time constants.
Everything the reference spreads across four copies of grid code
(reference ``mask.py:32-35,63-72``, ``pupil.py:50-54``, ``lightsource.py:36-45``,
``imageformation.py:5-8``) is derived once from :class:`OpticsConfig`.

Grid conventions (shared-grid invariant of the whole framework):

* sigma/pupil plane: sigma in [-2, 2), step ``4 / pixel_number``; the unit
  pupil (r <= 1) occupies the central half of the array.
* frequency (k) plane: identical to the sigma plane (``delta_k = 4/n``), which
  is why a source point at integer array offset shifts the pupil by an integer
  roll with no interpolation.
* spatial plane: x in [-n/2 * pixel_size, n/2 * pixel_size) nm.
"""

from __future__ import annotations

import dataclasses

SIGMA_SPAN = 2.0  # sigma grid spans [-2, 2); unit pupil is the central half.

# Power-of-two FFT sizes considered by the wavelength-scaling solver
# (reference mask.py:63-65 uses the same fixed table).
_POW2_TABLE = (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)


def nearest_pow2(value: float) -> int:
    """Nearest power of two from the fixed table (ties -> smaller, matching
    ``argmin`` over the ascending table in reference ``mask.py:63-65``)."""
    return min(_POW2_TABLE, key=lambda s: (abs(s - value), s))


@dataclasses.dataclass(frozen=True)
class WavelengthScaling:
    """Gau'23 wavelength-scaling parameters (reference ``mask.py:67-72``).

    beta = wavelength / (delta_k * pixel_size); N = nearest power of two;
    epsilon = N / beta is the mask upsample factor that makes the FFT grid
    wavelength-consistent.
    """

    beta: float
    fft_size: int  # N
    epsilon: float

    @property
    def n(self) -> int:
        return self.fft_size


@dataclasses.dataclass(frozen=True)
class OpticsConfig:
    """Static configuration of the imaging system.

    Parameters mirror the knobs of the reference constructors
    (``mask.py:5``, ``pupil.py:6``, ``lightsource.py:5``) but live in one
    place: ``pixel_number`` (grid size n), ``pixel_size`` (nm), ``wavelength``
    (nm), ``na`` (projection numerical aperture).
    """

    pixel_number: int = 64
    pixel_size: float = 25.0
    wavelength: float = 193.0
    na: float = 0.7
    #: refractive index of the medium between lens and wafer (1.0 = dry;
    #: 1.437 = water at 193 nm). Consumed by the vector/high-NA engine:
    #: sin(theta) = NA * rho / n_medium, and pupil positions with
    #: NA * rho >= n_medium are evanescent (cannot propagate) and carry no
    #: field. The scalar engine is index-independent (parity with the
    #: scalar reference).
    immersion_index: float = 1.0

    def __post_init__(self):
        if self.pixel_number < 2 or self.pixel_number % 2 != 0:
            raise ValueError(
                f"pixel_number must be an even integer >= 2, got {self.pixel_number}"
            )
        if self.pixel_size <= 0 or self.wavelength <= 0:
            raise ValueError("pixel_size and wavelength must be > 0")
        if not (0 < self.na <= 1.7):
            # immersion lithography reaches NA ~1.35 (water) / ~1.55+
            # (high-index fluids); nothing in the sigma-grid math caps at 1
            raise ValueError(f"na must be in (0, 1.7], got {self.na}")
        if self.immersion_index < 1.0:
            raise ValueError(
                f"immersion_index must be >= 1, got {self.immersion_index}")

    # --- derived grid constants (reference mask.py:32-35) -----------------
    @property
    def n(self) -> int:
        return self.pixel_number

    @property
    def delta_k(self) -> float:
        return 2.0 * SIGMA_SPAN / self.pixel_number  # = 4 / n

    @property
    def k_bound(self) -> float:
        return self.pixel_number / 2 * self.delta_k  # = 2.0

    @property
    def delta_sigma(self) -> float:
        return self.delta_k

    @property
    def pixel_bound(self) -> float:
        return self.pixel_number / 2 * self.pixel_size

    @property
    def field_nm(self) -> float:
        """Physical field width in nm."""
        return self.pixel_number * self.pixel_size

    # --- wavelength scaling (Gau'23) --------------------------------------
    def wavelength_scaling(self) -> WavelengthScaling:
        beta = self.wavelength / (self.delta_k * self.pixel_size)
        fft_size = nearest_pow2(beta)
        return WavelengthScaling(beta=beta, fft_size=fft_size, epsilon=fft_size / beta)

    def defocus_nm_to_waves(self, defocus_nm: float) -> float:
        """Convert nm of defocus into waves of the Z4 (OSA index 4) Zernike
        coefficient: NA^2 / (4 * wavelength) (Mack eq. 3.24; reference
        ``pupil.py:92`` — but pure, without mutating the caller's array)."""
        return defocus_nm * self.na**2 / (4.0 * self.wavelength)


DEMO_CONFIG = OpticsConfig(pixel_number=64, pixel_size=25.0, wavelength=193.0, na=0.7)
