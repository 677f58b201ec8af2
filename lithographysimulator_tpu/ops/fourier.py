"""Centered 2-D Fourier transforms and pad/crop arithmetic.

The reference wraps every FFT in a ``fftshift -> transform -> ifftshift``
sandwich so that DC sits at the array center on both sides (reference
``mask.py:83-85``, ``imageformation.py:39-41``). Padding/cropping between the
mask grid (n x n) and the wavelength-scaled FFT grid (N x N) uses exact
even/odd fixups that must be reproduced for bit-comparable outputs (reference
``mask.py:79-81``, ``imageformation.py:36-37,73-75``).

Normalization follows the reference exactly: the forward mask transform is the
unnormalized ``fft2`` (torch ``norm='backward'``, ``mask.py:84``) and the
imaging transform is the unnormalized ``ifft2`` (torch ``norm='forward'``,
``imageformation.py:40``).
"""

from __future__ import annotations

import jax.numpy as jnp


def centered_fft2(field: jnp.ndarray) -> jnp.ndarray:
    """DC-centered unnormalized forward FFT over the trailing two dims."""
    shifted = jnp.fft.fftshift(field, axes=(-2, -1))
    transformed = jnp.fft.fft2(shifted, norm="backward")
    return jnp.fft.ifftshift(transformed, axes=(-2, -1))


def centered_ifft2(field: jnp.ndarray) -> jnp.ndarray:
    """DC-centered unnormalized inverse FFT over the trailing two dims.

    ``norm='forward'`` makes the *inverse* transform the plain positive-
    exponent sum with no 1/N^2 factor, matching ``imageformation.py:40``.
    """
    shifted = jnp.fft.fftshift(field, axes=(-2, -1))
    transformed = jnp.fft.ifft2(shifted, norm="forward")
    return jnp.fft.ifftshift(transformed, axes=(-2, -1))


def pad_center(field: jnp.ndarray, target: int) -> jnp.ndarray:
    """Resize the trailing two dims to ``target`` with the reference's
    centering rule: ``pW = (target - m) // 2`` on the low side and
    ``pW + (m % 2)`` on the high side (``mask.py:79-81``).

    Negative pads crop, matching ``torch.nn.functional.pad`` — the reference
    hits this in the epsilon < 1 wavelength-scaling regime (coarse pixels /
    long wavelengths make the scaled mask larger than the FFT grid)."""
    m = field.shape[-1]
    if field.shape[-2] != m:
        raise ValueError("pad_center expects square trailing dims")
    p = (target - m) // 2
    corr = m % 2
    if p >= 0:
        pads = [(0, 0)] * (field.ndim - 2) + [(p, p + corr), (p, p + corr)]
        return jnp.pad(field, pads)
    start = -p
    return field[..., start : start + target, start : start + target]


def crop_center(field: jnp.ndarray, target: int) -> jnp.ndarray:
    """Center-crop the trailing two dims from N down to ``target`` with
    ``t = (N - target) // 2`` (``mask.py:87-88``, ``imageformation.py:43``);
    a negative ``t`` zero-pads instead, matching the reference's
    ``F.pad(x, (-t, ...))`` spelling (``mask.py:88``) when N < n."""
    big = field.shape[-1]
    t = (big - target) // 2
    if t >= 0:
        return field[..., t : t + target, t : t + target]
    pads = [(0, 0)] * (field.ndim - 2) + [(-t, -t), (-t, -t)]
    return jnp.pad(field, pads)
