"""Independent float64 NumPy oracle of the imaging physics.

A from-scratch reimplementation of the pipeline (no jax, no torch) in
complex128, used to measure the absolute numerical accuracy of the fp32 TPU
framework against the BASELINE target (<= 1e-6 normalized RMS vs an
fp32-hardened oracle). It follows the same mathematical conventions
(sigma ≡ k grid, torch-style bilinear resize, centered unnormalized
transforms, reference scaling) but shares no code with either implementation.
"""

from __future__ import annotations

import math

import numpy as np


def bilinear_resize64(img: np.ndarray, scale: float) -> np.ndarray:
    n = img.shape[-1]
    m = int(math.floor(n * scale))
    if m == n:
        return img.astype(np.float64)
    src = np.clip((np.arange(m) + 0.5) / scale - 0.5, 0, n - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n - 1)
    frac = src - lo
    rows = (img[lo, :] * (1 - frac)[:, None] + img[hi, :] * frac[:, None])
    return rows[:, lo] * (1 - frac)[None, :] + rows[:, hi] * frac[None, :]


def zernike_basis64(n: int, count: int) -> np.ndarray:
    ax = -2.0 + (4.0 / n) * np.arange(n)
    xx = ax[None, :]
    yy = ax[:, None]
    r = np.sqrt(xx**2 + yy**2)
    th = np.arctan2(yy, np.broadcast_to(xx, (n, n)))
    out = np.zeros((count, n, n))
    for j in range(count):
        nn = math.ceil((-3 + math.sqrt(9 + 8 * j)) / 2)
        mm = 2 * j - nn * (nn + 2)
        am = abs(mm)
        rad = np.zeros_like(r)
        for k in range((nn - am) // 2 + 1):
            c = ((-1) ** k * math.factorial(nn - k)) / (
                math.factorial(k) * math.factorial((nn + am) // 2 - k)
                * math.factorial((nn - am) // 2 - k))
            rad += c * r ** (nn - 2 * k)
        norm = math.sqrt((2 * nn + 1) / (1 + (1 if mm == 0 else 0)))
        ang = np.cos(mm * th) if mm >= 0 else np.sin(am * th)
        out[j] = np.where(r <= 1.0, norm * rad * ang, 0.0)
    return out


def pupil64(aberrations, n: int, na: float, wavelength: float) -> np.ndarray:
    ab = np.asarray(aberrations, np.float64).copy()
    if len(ab) >= 5:
        ab[4] *= na**2 / (4.0 * wavelength)
    basis = zernike_basis64(n, len(ab))
    we = np.tensordot(ab, basis, axes=1)
    ax = -2.0 + (4.0 / n) * np.arange(n)
    r = np.hypot(ax[None, :], ax[:, None])
    return np.where(r <= 1.0, np.exp(2j * np.pi * we), 0.0)


def wavelength_scaling64(n: int, pixel_size: float, wavelength: float):
    beta = wavelength / ((4.0 / n) * pixel_size)
    table = [2 ** k for k in range(1, 15)]
    big_n = min(table, key=lambda s: (abs(s - beta), s))
    return big_n, big_n / beta


def place_center64(field: np.ndarray, target: int) -> np.ndarray:
    """Center field in a target x target array: pads when growing, crops when
    shrinking (torch negative-pad semantics; pW = (target - m)//2)."""
    m = field.shape[-1]
    p = (target - m) // 2
    if p >= 0:
        out = np.zeros(field.shape[:-2] + (target, target), field.dtype)
        out[..., p : p + m, p : p + m] = field
        return out
    s = -p
    return field[..., s : s + target, s : s + target]


def crop_center64(field: np.ndarray, target: int) -> np.ndarray:
    big = field.shape[-1]
    t = (big - target) // 2
    if t >= 0:
        return field[..., t : t + target, t : t + target]
    out = np.zeros(field.shape[:-2] + (target, target), field.dtype)
    out[..., -t : -t + big, -t : -t + big] = field
    return out


def spectrum64(geometry: np.ndarray, pixel_size: float, wavelength: float):
    n = geometry.shape[0]
    big_n, eps = wavelength_scaling64(n, pixel_size, wavelength)
    scaled = bilinear_resize64(geometry.astype(np.float64), eps)
    padded = place_center64(scaled, big_n)
    spec = np.fft.ifftshift(np.fft.fft2(np.fft.fftshift(padded)))
    return crop_center64(spec, n), big_n, eps


def _separable_kernel64(n: int, pixel_size: float, wavelength: float,
                        sign: int) -> np.ndarray:
    """Trapezoid-weighted separable Fraunhofer kernel
    Kw[a, b] = exp(sign*2i*pi/lambda * k[a] * x[b]) * w[b], complex128."""
    dk = 4.0 / n
    k = -2.0 + dk * np.arange(n)
    x = -(n / 2) * pixel_size + pixel_size * np.arange(n)
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    c = sign * 2j * np.pi / wavelength
    return np.exp(c * np.outer(k, x)) * w[None, :]


def direct_spectrum64(geometry, pixel_size: float, wavelength: float):
    """Direct (non-FFT) Fraunhofer mask spectrum in complex128 — the
    reference's 4-D trapz integral (mask.py:42-59) in separable form."""
    n = geometry.shape[0]
    kw = _separable_kernel64(n, pixel_size, wavelength, +1)
    return kw @ geometry.astype(np.complex128) @ kw.T


def direct_abbe64(geometry, source_map, aberrations, *, pixel_size: float,
                  wavelength: float, na: float) -> np.ndarray:
    """Direct-solver aerial image in complex128 (reference
    imageformation.py:3-30 / :47-77 with fft=False): per illuminated source
    point, inverse-transform (constant -2i*pi/lambda) the rolled-pupil x
    direct-spectrum product and accumulate |E|^2."""
    n = geometry.shape[0]
    spec = direct_spectrum64(geometry, pixel_size, wavelength)
    pup = pupil64(aberrations, n, na, wavelength)
    kb = _separable_kernel64(n, pixel_size, wavelength, -1)
    image = np.zeros((n, n))
    pts = np.argwhere(np.asarray(source_map) > 0) - n // 2
    for dy, dx in pts:
        prod = np.roll(pup, (dy, dx), axis=(0, 1)) * spec
        e = kb @ prod @ kb.T
        image += np.abs(e) ** 2
    return image


def abbe64(geometry, source_map, aberrations, *, pixel_size: float,
           wavelength: float, na: float) -> np.ndarray:
    n = geometry.shape[0]
    spec, big_n, eps = spectrum64(geometry, pixel_size, wavelength)
    pup = pupil64(aberrations, n, na, wavelength)
    image = np.zeros((n, n))
    pts = np.argwhere(np.asarray(source_map) > 0) - n // 2
    for dy, dx in pts:
        prod = np.roll(pup, (dy, dx), axis=(0, 1)) * spec
        padded = place_center64(prod, big_n)
        field = np.fft.ifftshift(
            np.fft.ifft2(np.fft.fftshift(padded))) * big_n * big_n
        e = crop_center64(field, n)
        image += np.abs(e) ** 2
    down = bilinear_resize64(image, 1.0 / eps)
    return place_center64(down, n)
