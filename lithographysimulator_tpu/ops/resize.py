"""Separable bilinear resize as two matmuls (MXU-friendly).

The reference resamples the mask by the wavelength-scaling factor epsilon with
``torch.nn.functional.interpolate(mode='bilinear')`` (reference ``mask.py:77``)
and the aerial image back down by 1/epsilon (``imageformation.py:71``). Exact
parity requires torch's coordinate convention, verified empirically against
torch 2.13 in this environment:

* output size = ``floor(n * scale)``;
* source coordinate = ``(dst + 0.5) / scale - 0.5`` using the *given* scale
  factor (not the output/input ratio), clamped to ``[0, n - 1]``;
* identity shortcut when output size equals input size.

Instead of a gather, we build the 1-D interpolation matrix ``W`` (out, in) on
the host (shapes are static — scale and sizes are config-time constants) and
compute ``W @ img @ W.T``. On TPU this runs on the MXU and batches trivially.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix_cached(n: int, scale: float, out_size: int) -> np.ndarray:
    src = (np.arange(out_size, dtype=np.float64) + 0.5) / scale - 0.5
    src = np.clip(src, 0.0, n - 1.0)
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    hi = np.minimum(lo + 1, n - 1)
    w = np.zeros((out_size, n), dtype=np.float64)
    np.add.at(w, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(w, (np.arange(out_size), hi), frac)
    return w


def output_size(n: int, scale: float) -> int:
    return int(math.floor(n * scale))


def interp_matrix(n: int, scale: float, out_size: int | None = None) -> np.ndarray:
    """1-D bilinear interpolation matrix of shape ``(out_size, n)``, f64."""
    if out_size is None:
        out_size = output_size(n, scale)
    return _interp_matrix_cached(n, float(scale), int(out_size))


def bilinear_resize(img: jnp.ndarray, scale: float, dtype=jnp.float32) -> jnp.ndarray:
    """Resize the trailing two dims of ``img`` by ``scale`` (torch-parity).

    Works on any leading batch dims; runs as two matmuls.
    """
    n_rows, n_cols = img.shape[-2], img.shape[-1]
    out_r, out_c = output_size(n_rows, scale), output_size(n_cols, scale)
    if jnp.issubdtype(jnp.asarray(img).dtype, jnp.complexfloating):
        # complex masks (phase-shift masks): resize re/im planes
        re = bilinear_resize(jnp.real(img), scale, dtype=dtype)
        im = bilinear_resize(jnp.imag(img), scale, dtype=dtype)
        return jax.lax.complex(re, im)
    if out_r == n_rows and out_c == n_cols:
        return img.astype(dtype)
    w_r = jnp.asarray(interp_matrix(n_rows, scale, out_r), dtype=dtype)
    w_c = jnp.asarray(interp_matrix(n_cols, scale, out_c), dtype=dtype)
    x = img.astype(dtype)
    x = jnp.einsum("ri,...ic->...rc", w_r, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("...rc,oc->...ro", x, w_c, precision=jax.lax.Precision.HIGHEST)
    return x
