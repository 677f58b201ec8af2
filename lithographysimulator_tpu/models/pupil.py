"""Projection-pupil model: Zernike-aberrated complex pupil function.

Parity target: reference ``pupil.py:4-38,88-111`` — wavefront error as an
OSA-ordered Zernike sum (entry 4 given in nm of defocus), pupil function
P = exp(i * 2pi * WE) hard-clipped to the unit disk on the sigma plane.

All functions are pure; the aberration vector may be a traced jnp array so
that aerial images are differentiable w.r.t. the aberrations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..grid import Grid, unit_disk_mask
from ..ops.zernike import wavefront_error


@dataclasses.dataclass(frozen=True)
class Pupil:
    """Aberration description for one imaging configuration.

    ``aberrations`` are OSA/ANSI-ordered Zernike coefficients in waves,
    except entry 4 (defocus) which is in nm when ``defocus_in_nm`` (the
    reference's convention, ``pupil.py:91-92``). ``None`` -> perfect lens.
    """

    config: OpticsConfig
    aberrations: tuple[float, ...] | None = None
    defocus_in_nm: bool = True

    def coefficients(self) -> jnp.ndarray:
        if self.aberrations is None:
            return jnp.zeros((1,), dtype=jnp.float32)
        return jnp.asarray(self.aberrations, dtype=jnp.float32)

    def wavefront(self, dtype=jnp.float32) -> jnp.ndarray:
        return wavefront_error(
            self.coefficients(), self.config,
            defocus_in_nm=self.defocus_in_nm, dtype=dtype,
        )

    def function(self, dtype=jnp.complex64) -> jnp.ndarray:
        return pupil_function(
            self.coefficients(), self.config,
            defocus_in_nm=self.defocus_in_nm, dtype=dtype,
        )


def pupil_function(
    aberrations,
    config: OpticsConfig,
    *,
    defocus_in_nm: bool = True,
    dtype=jnp.complex64,
) -> jnp.ndarray:
    """(n, n) complex pupil P = exp(i*2pi*WE) on r <= 1, zero outside
    (reference ``pupil.py:102-111``)."""
    real_dtype = jnp.finfo(dtype).dtype
    we = wavefront_error(
        jnp.asarray(aberrations), config,
        defocus_in_nm=defocus_in_nm, dtype=real_dtype,
    )
    phase = (2.0 * np.pi) * we
    phi = jax.lax.complex(jnp.cos(phase), jnp.sin(phase)).astype(dtype)
    grid = Grid(config)
    disk = unit_disk_mask(grid)
    if config.obscuration > 0.0:
        # high-NA EUV central obscuration: an annular pupil (the obscured
        # zone carries no field); host-side numpy, jit-static like the disk
        disk = disk & (grid.radius() >= config.obscuration)
    return phi * jnp.asarray(disk, dtype=dtype)
