"""Mask-spectrum solvers: Gau'23 wavelength-scaling FFT and direct Fraunhofer.

Two solvers behind one API, mirroring the reference's ``fft: bool`` switch
(reference ``mask.py:37-61``):

* :func:`spectrum_fft` — the Gau 2023 wavelength-scaling algorithm
  (``mask.py:74-90``): bilinear-upsample the mask by epsilon, zero-pad to the
  power-of-two FFT size N, centered unnormalized ``fft2``, crop back to n.

* :func:`spectrum_direct` — the literal discrete Fraunhofer integral
  (``mask.py:42-59``). The reference materializes the full 4-D outer product
  ``exp(c * (kx*x + ky*y))`` — (n, n, n, n) complex64, 134 MB at n=64 and
  ~34 TB at n=2048 — then double-trapz-integrates it. The kernel is
  *separable*, so here it is two complex matmuls with trapezoid weights
  folded in: ``S = Kw @ G @ Kw^T`` with ``K[a, b] = exp(c * k[a] * x[b])``.
  O(n^3) FLOPs on the MXU, O(n^2) memory — same math, no blow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..grid import Grid
from .fourier import centered_fft2, crop_center, pad_center
from .resize import bilinear_resize


def trapezoid_weights(n: int) -> np.ndarray:
    """Uniform-spacing trapezoid quadrature weights [0.5, 1, ..., 1, 0.5]."""
    w = np.ones(n, dtype=np.float64)
    w[0] = w[-1] = 0.5
    return w


@functools.lru_cache(maxsize=16)
def _dft_kernel_cached(config: OpticsConfig, sign: int) -> np.ndarray:
    """Weighted separable Fourier kernel ``Kw[a, b] = exp(sign*2i*pi/lambda *
    k[a] * x[b]) * w[b]``, float64 complex on the host."""
    grid = Grid(config)
    c = sign * 2j * np.pi / config.wavelength
    k = grid.k[:, None]
    x = grid.x[None, :]
    kernel = np.exp(c * k * x)
    return kernel * trapezoid_weights(config.n)[None, :]


def separable_dft(field: jnp.ndarray, config: OpticsConfig, sign: int,
                  dtype=jnp.complex64) -> jnp.ndarray:
    """Apply the trapezoid-weighted separable Fourier transform to the
    trailing two dims: ``Kw @ field @ Kw^T``."""
    kw = jnp.asarray(_dft_kernel_cached(config, sign), dtype=dtype)
    out = jnp.einsum("ip,...pq->...iq", kw, field.astype(dtype),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...iq,jq->...ij", out, kw,
                      precision=jax.lax.Precision.HIGHEST)


def spectrum_direct(geometry: jnp.ndarray, config: OpticsConfig,
                    dtype=jnp.complex64) -> jnp.ndarray:
    """Direct Fraunhofer mask spectrum (reference ``mask.py:42-59``; the
    fraunhofer constant there is +2i*pi/lambda, ``mask.py:42``)."""
    return separable_dft(geometry, config, sign=+1, dtype=dtype)


def spectrum_fft(geometry: jnp.ndarray, config: OpticsConfig,
                 dtype=jnp.complex64) -> jnp.ndarray:
    """Gau'23 wavelength-scaling FFT mask spectrum (``mask.py:74-90``)."""
    ws = config.wavelength_scaling()
    real_dtype = jnp.finfo(dtype).dtype if jnp.issubdtype(dtype, jnp.complexfloating) else dtype
    geometry = jnp.asarray(geometry)
    if jnp.issubdtype(geometry.dtype, jnp.complexfloating):
        # phase-shift masks carry complex transmission
        scaled = bilinear_resize(geometry, ws.epsilon, dtype=real_dtype)
    else:
        scaled = bilinear_resize(geometry.astype(real_dtype), ws.epsilon,
                                 dtype=real_dtype)
    padded = pad_center(scaled, ws.fft_size)
    spectrum = centered_fft2(padded.astype(dtype))
    return crop_center(spectrum, config.n)


def mask_spectrum(geometry: jnp.ndarray, config: OpticsConfig, *,
                  solver: str = "gau23", dtype=jnp.complex64) -> jnp.ndarray:
    """Dispatch on solver kind: ``'gau23'`` (fast FFT) or ``'direct'``."""
    if solver == "gau23":
        return spectrum_fft(geometry, config, dtype=dtype)
    if solver == "direct":
        return spectrum_direct(geometry, config, dtype=dtype)
    raise ValueError(f"unknown spectrum solver {solver!r}")
