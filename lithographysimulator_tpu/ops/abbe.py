"""Abbe partial-coherence imaging engine.

Parity target: reference ``imageformation.py:3-77`` — for every illuminated
source point, shift the pupil by the point's integer sigma-grid offset,
multiply by the mask spectrum, inverse-transform to the image plane, and
accumulate intensity incoherently: ``I = sum_s w_s |E_s|^2``.

TPU-first design (none of this mirrors the reference's implementation):

* The reference's serial Python loop over ``argwhere(lightsource)`` with a
  per-point ``torch.roll`` + FFT (``imageformation.py:59-67``) becomes a
  ``lax.scan`` over fixed-size *chunks* of source points, each chunk batched
  with ``vmap`` into one batched padded iFFT. Shapes are static; the on-chip
  carry is a single (n, n) float32 intensity accumulator — per-point field
  stacks are never materialized (the reference direct path's 134 MB/point
  failure mode, ``imageformation.py:24``).
* Source points come in two flavors: a *static* point list extracted on the
  host from a concrete source map (dead grid points never enter the scan),
  or a *dense* weighted reduction over the whole sigma grid (every point,
  weight 0 for dark ones) for traced/differentiable source maps
  (SURVEY §2.2.6).
* The direct (non-FFT) solver replaces the reference's O(n^4)-memory
  4-D trapezoid integral (``imageformation.py:3-30``) with the separable
  two-matmul transform from :mod:`..ops.fraunhofer` — same math, MXU FLOPs.

Normalization matches the reference exactly (unnormalized 'forward' iFFT,
no division by source-point count — SURVEY §2.2.4); pass ``normalize=True``
to divide by the total source weight.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from .fourier import centered_ifft2, crop_center, pad_center
from .fraunhofer import separable_dft
from .resize import bilinear_resize

Solver = Literal["gau23", "direct"]


def resolve_engine(engine: str,
                   *, allowed=("fft", "matmul", "int8", "int8_fast")) -> str:
    """'auto' -> fastest engine for the backend; validates explicit names.

    Measured on TPU v5e at 1024^2 (262 us/pt for the round-1 windowed
    'highest' matmul engine):

    * ``fft``: XLA's large c64 FFT runs at ~100 GB/s effective — the right
      engine on CPU, 2.7-3.7x slower than matmuls on TPU.
    * ``matmul``: phase-free windowed zoom-DFT, f32 'highest' 3M complex
      matmuls — 207 us/pt, engine-exact (~7e-8 vs round-1).
    * ``int8``: fused Pallas kernels emulating fp32 contractions with int8
      limb dots (the v5e MXU runs int8 at ~1.7x its bf16 rate) — 144 us/pt
      at ~1e-6 normalized RMS vs the f32 engine (reference's own fp16
      grids floor at ~1e-3). 'pallas' is accepted as an alias.
    * ``int8_fast``: opt-in 2-limb mode of the same kernels — the
      2^-16-weight limb-pair group is dropped, halving the int8 dot count
      (9 passes per point instead of 18) at ~1.5e-5 normalized RMS: a
      different accuracy class (never auto-selected), still ~100x below
      the reference's fp16-grid floor.
    """
    if engine == "pallas":
        engine = "int8"
    if engine != "auto" and engine not in allowed:
        raise ValueError(
            f"unknown field-transform engine {engine!r} (allowed: {allowed})")
    if engine != "auto":
        return engine
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        return "fft"
    return "int8" if "int8" in allowed else "matmul"


# ---------------------------------------------------------------------------
# Source points
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SourcePoints:
    """Static source-point list: integer sigma-grid offsets (y, x) of each
    illuminated point relative to the array center, plus per-point weights.

    ``shifts``/``weights`` may be padded with zero-weight entries so the
    count divides the scan chunk size evenly.
    """

    shifts: np.ndarray  # (p, 2) int32, (dy, dx)
    weights: np.ndarray  # (p,) float32
    live_count: int

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())


def source_points(source_map, *, threshold: float = 0.0) -> SourcePoints:
    """Extract live source points from a concrete (host) source map, in the
    same row-major order as the reference's ``argwhere`` loop
    (``imageformation.py:59``)."""
    m = np.asarray(source_map)
    n = m.shape[0]
    idx = np.argwhere(m > threshold)
    shifts = (idx - n // 2).astype(np.int32)
    weights = m[idx[:, 0], idx[:, 1]].astype(np.float32)
    return SourcePoints(shifts=shifts, weights=weights, live_count=len(idx))


def dense_source_points(n: int) -> np.ndarray:
    """All (n*n, 2) integer grid offsets, row-major, for the dense path."""
    iy, ix = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return (np.stack([iy.ravel(), ix.ravel()], axis=-1) - n // 2).astype(np.int32)


def _pad_points(shifts: np.ndarray, weights: np.ndarray, chunk: int):
    p = len(weights)
    pad = (-p) % chunk
    if pad:
        shifts = np.concatenate([shifts, np.zeros((pad, 2), np.int32)])
        weights = np.concatenate([weights, np.zeros((pad,), np.float32)])
    return shifts, weights


# ---------------------------------------------------------------------------
# Per-chunk coherent fields
# ---------------------------------------------------------------------------

def _roll2(field: jnp.ndarray, shift_yx: jnp.ndarray) -> jnp.ndarray:
    """Circular shift by a traced (dy, dx) pair (reference's ``torch.roll``,
    ``imageformation.py:63``)."""
    return jnp.roll(field, (shift_yx[0], shift_yx[1]), axis=(0, 1))


def _tiled(pupil: jnp.ndarray) -> jnp.ndarray:
    """2n x 2n periodic tiling of the pupil, built once per image so every
    circular shift becomes one contiguous ``dynamic_slice``."""
    return jnp.tile(pupil, (2, 2))


def _rolled_products(pupil_tiled, spectrum, shifts):
    """(B, n, n) stack of roll(pupil, s_b) * spectrum.

    Measured on TPU v5e: a traced-shift ``jnp.roll`` (and its vmap) lowers to
    a gather that costs ~160 us/point at n=512 — 16x the entire padded-FFT
    stage. A ``dynamic_slice`` into the periodic 2n x 2n tiling is a
    contiguous block copy instead; the chunk is static, so unrolling the
    per-point slices in Python keeps everything slice-shaped.
    """
    n = spectrum.shape[-1]
    prods = []
    for b in range(shifts.shape[0]):
        start0 = (-shifts[b, 0]) % n
        start1 = (-shifts[b, 1]) % n
        rolled = jax.lax.dynamic_slice(pupil_tiled, (start0, start1), (n, n))
        prods.append(rolled * spectrum)
    return jnp.stack(prods)


@functools.lru_cache(maxsize=16)
def _zoom_dft_kernel(n: int, fft_size: int) -> np.ndarray:
    """Closed form of ``crop_n . centered_ifft2_N . pad_center_N`` as an
    (n, n) matrix: substituting the pad/crop offsets into the centered DFT
    collapses them to ``T[a, b] = exp(+2i pi (a - n/2)(b - n/2) / N)`` per
    axis, so the whole padded transform is ``E = T X T^T`` — no N x N array
    is ever built, and the MXU does the work. (Exact for even n, N >= n;
    this is the fractional-stride 'zoom' DFT of the wavelength-scaling
    construction.)

    For N < n (the epsilon < 1 regime) the pad becomes a center-crop and the
    final crop a zero-pad; both collapse to masking T's rows/columns to the
    central N indices."""
    a = np.arange(n, dtype=np.float64) - n / 2
    t = np.exp(2j * np.pi * np.outer(a, a) / fft_size)
    if fft_size < n:
        lo = (n - fft_size) // 2
        mask = np.zeros(n)
        mask[lo : lo + fft_size] = 1.0
        t = t * np.outer(mask, mask)
    return t


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _window_size(n: int) -> int:
    """Support window of a rolled pupil product: the unit disk spans
    n/2 + 1 samples; +2 guard, rounded to a multiple of 8."""
    return min(n, ((n // 2 + 3 + 7) // 8) * 8)


@functools.lru_cache(maxsize=16)
def _zoom_dft_window(n: int, fft_size: int) -> np.ndarray:
    """Static (n, w) slice T0 = T[:, lo:lo+w] shared by every source point
    in the phase-free windowed contraction (requires fft_size >= n so T is
    the pure chirp with no central-band mask)."""
    assert fft_size >= n
    w = _window_size(n)
    lo = n // 4 - 1
    return _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]


def _windowed_products(pupil_tiled, spectrum, shifts, w: int, lo: int):
    """(B, w, w) windows of roll(P, s_b) * M, one fused dynamic slice each.

    For |shift| <= n/4 - 2 the rolled pupil's unit disk stays interior, so
    the product's support lies in a (w, w) window at (lo + shift) — the
    window fully captures every nonzero entry (exactness guard in
    ``accumulate_intensity``)."""
    n = spectrum.shape[-1]
    xs = []
    for b in range(shifts.shape[0]):
        r0 = jnp.clip(lo + shifts[b, 0], 0, n - w)
        c0 = jnp.clip(lo + shifts[b, 1], 0, n - w)
        start0 = (-shifts[b, 0]) % n + r0
        start1 = (-shifts[b, 1]) % n + c0
        pup = jax.lax.dynamic_slice(pupil_tiled, (start0, start1), (w, w))
        spec = jax.lax.dynamic_slice(spectrum, (r0, c0), (w, w))
        xs.append(pup * spec)
    return jnp.stack(xs)


def _cmatmul_3m(ar, ai, br, bi, contract: str, precision):
    """Complex matmul as 3 real contractions (Karatsuba): 25% fewer real
    FLOPs than the 4-multiplication form at identical pass precision."""
    m1 = jnp.einsum(contract, ar, br, precision=precision)
    m2 = jnp.einsum(contract, ai, bi, precision=precision)
    m3 = jnp.einsum(contract, ar + ai, br + bi, precision=precision)
    return m1 - m2, m3 - m1 - m2


def _intensity_windowed_3m(x, t0, weights, matmul_precision="highest"):
    """sum_b w_b |T0 @ X_b @ T0^T|^2 — phase-free windowed zoom-DFT.

    The per-point column slices of T differ from T0 only by unit-magnitude
    per-row/column phases (T[i, r0+j] = T[i, lo+j] exp(2i pi (i-n/2)(r0-lo)/N)),
    which vanish under |.|^2, so ONE static T0 serves every source point.
    Replaces the reference's per-point pad+ifft2 (imageformation.py:32-45).
    """
    prec = _PRECISIONS[matmul_precision]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    xr = jnp.real(x)
    xi = jnp.imag(x)
    yr, yi = _cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", prec)
    er, ei = _cmatmul_3m(yr, yi, t0r, t0i, "biv,jv->bij", prec)
    return jnp.sum(weights[:, None, None] * (er * er + ei * ei), axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _intensity_windowed_int8_impl(fast, x, t0r, t0i, weights):
    """Same contraction as :func:`_intensity_windowed_3m` but on fused
    Pallas int8 limb kernels (~1.8x the f32 engine on v5e; ~1e-6 normalized
    RMS vs it; ``fast`` drops the 2^-16 limb-pair group — half the dots at
    ~1.5e-5 RMS). Forward-only int8: the VJP recomputes through the f32
    path (limb rounding has no useful gradient), so ILT/SMO losses
    differentiate correctly through this engine."""
    from .kernels.intensity_int8 import (
        column_intensity_int8, fused_window_intensity_int8,
        prepare_t0_limbs, row_transform_int8)

    n, w = t0r.shape
    # The column kernel's double-buffered (3, B, 128, w) int8 y-blocks grow
    # with B*w; past w ~ 1400 a batched call overflows the 16 MB scoped-VMEM
    # budget (measured at the 2048^2 SOCS full-grid case: 22.6 MB at B=4,
    # still 16.5 MB at B=2; tile_m and tile_n are both pinned at 128 by
    # layout rules). Split to single-field calls: B=1 at w=2048 is ~9.4 MB.
    if w > 1400 and x.shape[0] > 1:
        h = x.shape[0] // 2
        return (_intensity_windowed_int8_impl(fast, x[:h], t0r, t0i,
                                              weights[:h])
                + _intensity_windowed_int8_impl(fast, x[h:], t0r, t0i,
                                                weights[h:]))
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)
    # The fused row kernel holds all three (3, 1, w, w) int8 X-limb blocks
    # double-buffered in VMEM: past w ~ 800 that overflows the ~16 MB scoped
    # budget, so larger windows use the f32 XLA row transform instead. The
    # column kernel streams (tile, w) blocks and just needs smaller tiles
    # (tile_m is pinned at 128: the (3, B, tile_m) scale blocks require a
    # last dim divisible by 128).
    tile_n = 128 if w > 768 else 256
    if n % 128 == 0 and w <= 768:
        ylr, yli, yls, ysc = row_transform_int8(
            x, t_limbs, t_scales, interpret=interpret, fast=fast)
        return column_intensity_int8(
            (ylr, yli, yls), ysc, t_limbs, t_scales, weights,
            tile_n=tile_n, interpret=interpret, fast=fast)
    if n % 128 == 0 and w % 8 == 0 and w <= 1400:
        # Mid-size windows (the 2048^2 case is w=1032): the square-block row
        # kernel overflows VMEM, but the split-K variant blocks the
        # contraction dim and keeps the whole transform on int8 dots —
        # without it this range pays the 6-pass f32 row transform.
        from .kernels.intensity_int8 import row_transform_int8_splitk

        ylr, yli, yls, ysc = row_transform_int8_splitk(
            x, t_limbs, t_scales, tile_k=256, interpret=interpret,
            fast=fast)
        return column_intensity_int8(
            (ylr, yli, yls), ysc, t_limbs, t_scales, weights,
            tile_n=tile_n, interpret=interpret, fast=fast)
    # Small or very large grids: f32 row transform (XLA), fused int8 column
    # kernel (the row kernel's scale blocks also need n % 128 == 0).
    prec = _PRECISIONS["highest"]
    xr = jnp.real(x)
    xi = jnp.imag(x)
    yr, yi = _cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", prec)
    return fused_window_intensity_int8(
        yr, yi, t_limbs, t_scales, weights, tile_n=tile_n,
        interpret=interpret, fast=fast)


def _intensity_windowed_int8_fwd(fast, x, t0r, t0i, weights):
    return (_intensity_windowed_int8_impl(fast, x, t0r, t0i, weights),
            (x, t0r, t0i, weights))


def _intensity_windowed_int8_bwd(fast, res, g):
    x, t0r, t0i, weights = res
    t0 = t0r + 1j * t0i

    def f32_path(x_, w_):
        return _intensity_windowed_3m(x_, t0, w_)

    _, vjp = jax.vjp(f32_path, x, weights)
    gx, gw = vjp(g)
    return gx, jnp.zeros_like(t0r), jnp.zeros_like(t0i), gw


_intensity_windowed_int8_impl.defvjp(_intensity_windowed_int8_fwd,
                                     _intensity_windowed_int8_bwd)


def _intensity_windowed_int8(x, t0r, t0i, weights, fast: bool = False):
    return _intensity_windowed_int8_impl(fast, x, t0r, t0i, weights)


def _fields_gau23(pupil_tiled, spectrum, shifts, fft_size, engine="fft",
                  matmul_precision="highest"):
    """(B, n, n) coherent image fields for one chunk, Gau'23 solver
    (reference ``calculateFFTAerial``, ``imageformation.py:32-45``).

    ``engine='fft'``: batched padded iFFT (XLA).
    ``engine='matmul'``: the algebraically identical zoom-DFT as two complex
    matmuls — measured faster on TPU, where XLA's large c64 FFT runs far
    below HBM bandwidth while the MXU does 2n^3 complex MACs in stride.
    """
    n = spectrum.shape[-1]
    prods = _rolled_products(pupil_tiled, spectrum, shifts)
    if engine == "matmul":
        t = jnp.asarray(_zoom_dft_kernel(n, fft_size), spectrum.dtype)
        prec = _PRECISIONS[matmul_precision]
        out = jnp.einsum("ij,...jk->...ik", t, prods, precision=prec)
        return jnp.einsum("...ik,lk->...il", out, t, precision=prec)
    padded = pad_center(prods, fft_size)
    fields = centered_ifft2(padded)         # batched iFFT
    return crop_center(fields, n)


def _fields_direct(pupil_tiled, spectrum, shifts, config):
    """(B, n, n) coherent fields via the separable direct transform
    (reference ``calculateAerial``, ``imageformation.py:3-30``; constant
    -2i*pi/lambda at ``imageformation.py:52``)."""
    prods = _rolled_products(pupil_tiled, spectrum, shifts)
    return separable_dft(prods, config, sign=-1, dtype=spectrum.dtype)


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------

def accumulate_intensity(
    pupil: jnp.ndarray,
    spectrum: jnp.ndarray,
    shifts: jnp.ndarray,
    weights: jnp.ndarray,
    config: OpticsConfig,
    *,
    solver: Solver = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    matmul_precision: str = "highest",
    max_abs_shift: int | None = None,
) -> jnp.ndarray:
    """Scan source-point chunks, accumulating ``sum_s w_s |E_s|^2`` on chip.

    ``shifts`` (p, 2) int32 and ``weights`` (p,) must have p divisible by
    ``chunk``. Returns the raw (n, n) float32 intensity (pre-postprocessing).
    """
    n = config.n
    p = shifts.shape[0]
    if p == 0:
        # all-dark source: zero image (seeded from the replicated inputs so
        # vma still matches under shard_map)
        seed = (jnp.real(pupil[0, 0]) + jnp.real(spectrum[0, 0])) * 0
        return jnp.zeros((n, n), jnp.real(spectrum).dtype) + seed
    if p % chunk:
        raise ValueError(f"point count {p} not divisible by chunk {chunk}")
    engine = resolve_engine(engine)
    fft_size = config.wavelength_scaling().fft_size
    # Windowed contraction is exact only when every rolled pupil stays
    # interior (no wraparound): requires a static bound on |shift|. The
    # phase-free shared-T0 form additionally needs the unmasked chirp
    # (fft_size >= n).
    windowed = (engine in ("matmul", "int8", "int8_fast")
                and max_abs_shift is not None
                and max_abs_shift <= n // 4 - 2 and _window_size(n) < n
                and fft_size >= n)
    if engine in ("int8", "int8_fast") and (not windowed or solver != "gau23"):
        engine = "matmul"  # int8 kernels exist for the windowed path only
    real_dtype = jnp.real(spectrum).dtype

    shifts = shifts.reshape(p // chunk, chunk, 2)
    weights = weights.reshape(p // chunk, chunk).astype(real_dtype)
    pupil_tiled = _tiled(pupil)

    if windowed and solver == "gau23":
        w_win = _window_size(n)
        lo = n // 4 - 1
        t0 = _zoom_dft_window(n, fft_size)
        t0_c = jnp.asarray(t0, spectrum.dtype)
        t0r = jnp.asarray(t0.real, jnp.float32)
        t0i = jnp.asarray(t0.imag, jnp.float32)

    def body(acc, sw):
        s, w = sw
        if solver == "gau23" and windowed:
            x = _windowed_products(pupil_tiled, spectrum, s, w_win, lo)
            if engine in ("int8", "int8_fast"):
                part = _intensity_windowed_int8(x, t0r, t0i, w,
                                                fast=engine == "int8_fast")
            else:
                part = _intensity_windowed_3m(x, t0_c, w, matmul_precision)
            return acc + part, None
        if solver == "gau23":
            fields = _fields_gau23(pupil_tiled, spectrum, s, fft_size, engine,
                                   matmul_precision)
        else:
            fields = _fields_direct(pupil_tiled, spectrum, s, config)
        intensity = w[:, None, None] * jnp.abs(fields) ** 2
        return acc + jnp.sum(intensity, axis=0), None

    # Derive the zero init from the inputs so it inherits their varying
    # manual axes when running inside shard_map (scan requires carry-in and
    # carry-out to agree on vma; a plain zeros() would be unvarying).
    vma_seed = (weights[0, 0] + jnp.real(pupil[0, 0]) + jnp.real(spectrum[0, 0])) * 0
    init = jnp.zeros((n, n), dtype=real_dtype) + vma_seed.astype(real_dtype)
    acc, _ = jax.lax.scan(body, init, (shifts, weights))
    return acc


def _postprocess_gau23(image: jnp.ndarray, config: OpticsConfig) -> jnp.ndarray:
    """Gau'23-path post-processing (``imageformation.py:69-75``): bilinear
    downscale by 1/epsilon, then zero-pad back to n x n.

    Deliberate divergence: the reference pads with
    ``pW = (n - round(n/eps)) // 2`` which *under*-pads whenever
    ``round(n/eps)`` exceeds ``floor(n/eps)`` by enough (e.g. n=32,
    eps≈1.0363 returns a 30x30 image). We center-pad to exactly n x n with
    ``pad_center`` — identical to the reference wherever the reference's own
    arithmetic is self-consistent (it is for the 64^2 demo config)."""
    eps = config.wavelength_scaling().epsilon
    down = bilinear_resize(image, 1.0 / eps, dtype=image.dtype)
    return pad_center(down, config.n)


def abbe_image_points(
    spectrum: jnp.ndarray,
    pupil: jnp.ndarray,
    shifts: jnp.ndarray,
    weights: jnp.ndarray,
    config: OpticsConfig,
    *,
    solver: Solver = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    total_weight=None,
    engine: str = "auto",
    matmul_precision: str = "highest",
    max_abs_shift: int | None = None,
) -> jnp.ndarray:
    """Aerial image from an explicit (possibly traced) padded point list.

    ``shifts`` (p, 2) int32 and ``weights`` (p,) with p divisible by
    ``chunk``; zero-weight entries act as padding.
    """
    if max_abs_shift is None and not isinstance(shifts, jax.core.Tracer):
        host_shifts = np.asarray(shifts)
        if host_shifts.size:
            max_abs_shift = int(np.abs(host_shifts).max())
    image = accumulate_intensity(
        pupil, spectrum, jnp.asarray(shifts), jnp.asarray(weights), config,
        solver=solver, chunk=chunk, engine=engine,
        matmul_precision=matmul_precision, max_abs_shift=max_abs_shift,
    )
    if solver == "gau23":
        image = _postprocess_gau23(image, config)
    if normalize:
        if total_weight is None:
            total_weight = jnp.sum(weights)
        # Guard the all-dark-source case (0/0 -> NaN): a zero-weight source
        # produces a zero image, normalized or not.
        image = jnp.where(total_weight > 0, image / jnp.maximum(total_weight, 1e-30), 0.0)
    return image


def abbe_image(
    spectrum: jnp.ndarray,
    pupil: jnp.ndarray,
    source,
    config: OpticsConfig,
    *,
    solver: Solver = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    engine: str = "auto",
) -> jnp.ndarray:
    """Aerial image from a mask spectrum, pupil function, and source.

    ``source`` may be a :class:`SourcePoints` (static list — preferred, dead
    points never computed), a concrete (n, n) array (converted on the host),
    or a traced (n, n) weight map (dense differentiable path over all grid
    points).

    Returns the (n, n) float32 aerial image with the reference's scaling; set
    ``normalize=True`` to divide by the total source weight.
    """
    if solver not in ("gau23", "direct"):
        raise ValueError(f"unknown abbe solver {solver!r}")
    n = config.n

    if isinstance(source, SourcePoints):
        shifts_np, weights_np = _pad_points(source.shifts, source.weights, chunk)
        shifts = jnp.asarray(shifts_np)
        weights = jnp.asarray(weights_np)
        total = jnp.asarray(source.total_weight, jnp.float32)
    elif not isinstance(source, jax.core.Tracer):
        return abbe_image(
            spectrum, pupil, source_points(np.asarray(source)), config,
            solver=solver, chunk=chunk, normalize=normalize, engine=engine,
        )
    else:
        # Traced source map: dense weighted reduction over the whole grid.
        shifts_np = dense_source_points(n)
        shifts_np, _ = _pad_points(shifts_np, np.zeros(len(shifts_np), np.float32), chunk)
        shifts = jnp.asarray(shifts_np)
        flat = jnp.ravel(source)
        weights = jnp.pad(flat, (0, shifts.shape[0] - flat.shape[0]))
        total = jnp.sum(flat)

    return abbe_image_points(
        spectrum, pupil, shifts, weights, config,
        solver=solver, chunk=chunk, normalize=normalize, total_weight=total,
        engine=engine,
    )
