"""Aerial-image perturbation models: scanner stage blur (MSD) and flare.

Two standard imaging-model extensions that act on the INTENSITY (both are
incoherent effects, so they compose with any solver — scalar, SOCS,
vector, chromatic — by post-processing the aerial image):

* **Stage blur**: scanner stage vibration / synchronization error smears
  the image during the scan. Modeled as a separable Gaussian with
  independent x / y moving-standard-deviations (MSD, nm) — the scan
  direction usually dominates. CD loss and NILS loss grow quadratically
  in MSD/CD (Mack ch. 10 treatment of image blur).
* **Flare**: long-range scattered light (lens roughness) adds a nearly
  uniform background: I' = (1 - TIS) I + TIS * <I>, with TIS the total
  integrated scatter. A DC background directly erodes NILS
  (ILS' = ILS * I/(I + TIS <I>)) and shrinks exposure latitude — the
  effect the perturbation exists to quantify. A ``kernel_nm`` > 0 makes
  the background a wide Gaussian instead of the field mean (mid-range
  flare).

``ImagePerturbation`` is a frozen (jit-static) config that
:func:`..simulate.simulate`, the batch path, FEM metrology and serving
thread through; :func:`apply_perturbation` is the jit-traceable core (the
FFT blurs are complex math — on the TPU tunnel it must run under jit,
which every integrated path does).

No reference counterpart (ideal-scanner reference).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig


@dataclasses.dataclass(frozen=True)
class ImagePerturbation:
    """Scanner non-idealities applied to the aerial intensity.

    msd_x_nm / msd_y_nm: Gaussian stage-blur sigmas (0 = off).
    flare_tis: total integrated scatter in [0, 1) (0 = off).
    flare_kernel_nm: 0 = uniform (field-mean) flare background; > 0
        spreads the background with a Gaussian of this sigma instead
        (mid-range flare).
    """

    msd_x_nm: float = 0.0
    msd_y_nm: float = 0.0
    flare_tis: float = 0.0
    flare_kernel_nm: float = 0.0

    def __post_init__(self):
        if min(self.msd_x_nm, self.msd_y_nm, self.flare_kernel_nm) < 0:
            raise ValueError("blur sigmas must be >= 0")
        if not (0.0 <= self.flare_tis < 1.0):
            raise ValueError(f"flare_tis must be in [0, 1), got {self.flare_tis}")

    @property
    def active(self) -> bool:
        return (self.msd_x_nm > 0 or self.msd_y_nm > 0
                or self.flare_tis > 0)


def _gauss_transfer(n: int, pixel_size: float, sigma_x: float,
                    sigma_y: float) -> np.ndarray:
    freqs = np.fft.fftfreq(n, d=pixel_size)
    return np.exp(-2.0 * np.pi ** 2 * (sigma_x ** 2 * freqs[None, :] ** 2
                                       + sigma_y ** 2 * freqs[:, None] ** 2))


def apply_perturbation(image, perturb: ImagePerturbation,
                       config_or_pixel) -> jnp.ndarray:
    """Apply stage blur then flare to an intensity image (jit-traceable;
    ``perturb`` and the pixel size are trace-time constants). Energy is
    conserved by both steps (unit-DC transfer; flare redistributes)."""
    px = (config_or_pixel.pixel_size
          if isinstance(config_or_pixel, OpticsConfig)
          else float(config_or_pixel))
    image = jnp.asarray(image)
    n = image.shape[-1]
    if perturb.msd_x_nm > 0 or perturb.msd_y_nm > 0:
        transfer = jnp.asarray(
            _gauss_transfer(n, px, perturb.msd_x_nm, perturb.msd_y_nm),
            jnp.complex64)
        image = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(image) * transfer))
    if perturb.flare_tis > 0:
        if perturb.flare_kernel_nm > 0:
            transfer = jnp.asarray(
                _gauss_transfer(n, px, perturb.flare_kernel_nm,
                                perturb.flare_kernel_nm), jnp.complex64)
            background = jnp.real(
                jnp.fft.ifft2(jnp.fft.fft2(image) * transfer))
        else:
            background = jnp.mean(image)
        image = (1.0 - perturb.flare_tis) * image \
            + perturb.flare_tis * background
    return image
