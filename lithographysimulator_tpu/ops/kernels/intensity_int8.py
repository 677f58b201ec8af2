"""Pallas TPU kernel: int8 limb-emulated fp32 column transform + intensity.

The exact-Abbe hot loop spends its FLOPs on the windowed zoom-DFT
``E_b = T0 @ X_b @ T0^T`` (phase-free derivation in
``ops/abbe.py:_intensity_windowed_3m``; reference per-point transform at
``imageformation.py:32-45``).
At fp32-equivalent ('highest') precision the MXU runs f32 contractions as
6 bfloat16 passes. This kernel reaches the same ~2^-24 accuracy with
**6 int8 passes** instead — and the v5e MXU runs int8 at ~1.7x the bf16
rate (measured 256 vs 152 TOP/s through this tunnel):

* Each f32 operand row is split into 3 signed radix-256 limbs with a
  per-row scale: ``a ~ s * (l0*2^16 + l1*2^8 + l2)``, ``|l_k| <= 127``.
* int8 x int8 -> int32 dots are EXACT (max |sum| = w*127^2 ~ 8.4e6 << 2^31),
  so the product needs only the 6 limb pairs with weight >= 2^-16:
  ``S0 = l0*m0``, ``S1 = l0*m1 + l1*m0``, ``S2 = l0*m2 + l1*m1 + l2*m0``.
* Dequantize per (TM, TN) tile in VMEM: ``m = sA sB (S0 + S1/256 + S2/2^16)``
  — the int32 partials never reach HBM (this is what sank the pure-XLA
  variant of the same math).
* Complex products use the 3M (Karatsuba) trick: m1 = yr.tr, m2 = yi.ti,
  m3 = (yr+yi).(tr+ti) — 18 int8 passes per source point instead of the
  24 bf16 passes XLA's complex 'highest' einsum costs.
* The weighted intensity ``acc += w_b (er^2 + ei^2)`` accumulates in VMEM;
  only the (n, n) float32 image is written.

Accuracy: limb error is ~2^-24 relative to each row's max |value| (fixed
point within a row, floating across rows); measured end-to-end vs the f32
'highest' engine: ~2.5e-7 normalized RMS on the 1024^2 benchmark image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _out_vma(*arrays) -> frozenset:
    """Union of the operands' varying-manual-axes: inside ``shard_map``
    (rank-sharded SOCS imaging, sharded exact Abbe) ``pallas_call`` output
    avals must declare how they vary over the mesh; outside it this is the
    empty set, which ``ShapeDtypeStruct`` accepts unchanged."""
    vma: frozenset = frozenset()
    for a in arrays:
        vma |= frozenset(getattr(jax.typeof(a), "vma", ()) or ())
    return vma


def quantize_rows(a: jnp.ndarray):
    """Split f32 (..., w) into limbs (..., 3, w) int8 + per-row scale (...,).

    ``a ~ scale * (l0*2^16 + l1*2^8 + l2) * 65536``-folded: the returned
    scale includes the 2^16 factor so dequantization is
    ``sA * sB * (S0 + S1/256 + S2/65536)``.
    """
    amax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / (127.0 * 65536.0), 1.0)
    q = a / scale
    l0 = jnp.round(q * (1.0 / 65536.0))          # |l0| <= 127 by scale choice
    r = q - l0 * 65536.0                          # |r| <= 2^15
    l1 = jnp.round(r * (1.0 / 256.0))             # in [-128, 128]
    carry = (l1 > 127.0).astype(q.dtype)          # +128 only; -128 fits int8
    l0 = l0 + carry                               # safe: l0 < 127 when carry
    l1 = l1 - 256.0 * carry
    r = q - l0 * 65536.0 - l1 * 256.0             # |r| <= 128
    l2 = jnp.clip(jnp.round(r), -128, 127)        # clip loses <= 1 ulp (2^-23)
    limbs = jnp.stack([l0, l1, l2], axis=0).astype(jnp.int8)
    return limbs, (scale * 65536.0)[..., 0]


def _kernel(fast, w_ref, ylr, yli, yls, ysc, tlr, tli, tls, tsc, out_ref):
    batch = ylr.shape[1]  # static chunk size: unrolled in Python

    def idot(a, c):
        return jax.lax.dot_general(
            a, c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    def group(yl, b, tl):
        s0 = idot(yl[0, b], tl[0])
        s1 = idot(yl[0, b], tl[1]) + idot(yl[1, b], tl[0])
        out = (s0.astype(jnp.float32)
               + s1.astype(jnp.float32) * (1.0 / 256.0))
        if fast:  # 2-limb mode: drop the 2^-16-weight pair group (3 dots)
            return out
        s2 = (idot(yl[0, b], tl[2]) + idot(yl[1, b], tl[1])
              + idot(yl[2, b], tl[0]))
        return out + s2.astype(jnp.float32) * (1.0 / 65536.0)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for b in range(batch):
        m1 = group(ylr, b, tlr) * (ysc[0, b][:, None] * tsc[0][None, :])
        m2 = group(yli, b, tli) * (ysc[1, b][:, None] * tsc[1][None, :])
        m3 = group(yls, b, tls) * (ysc[2, b][:, None] * tsc[2][None, :])
        er = m1 - m2
        ei = m3 - m1 - m2
        acc = acc + w_ref[b, 0] * (er * er + ei * ei)
    out_ref[...] = acc


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "tile_n", "interpret", "fast"))
def fused_window_intensity_int8(
    yr: jnp.ndarray,       # (B, n, w) float32: real(T0 @ X_b)
    yi: jnp.ndarray,       # (B, n, w) float32: imag(T0 @ X_b)
    t_limbs,               # (tlr, tli, tls): each (3, n, w) int8
    t_scales: jnp.ndarray,  # (3, n) float32 for (r, i, r+i)
    weights: jnp.ndarray,  # (B,) float32
    *,
    tile_m: int = 128,
    tile_n: int = 256,
    interpret: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """sum_b w_b |Y_b @ T0^T|^2 via int8 limb dots, field stack in VMEM."""
    ylr, syr = quantize_rows(yr)
    yli, syi = quantize_rows(yi)
    yls, sys_ = quantize_rows(yr + yi)
    ysc = jnp.stack([syr, syi, sys_])  # (3, B, n)
    return column_intensity_int8(
        (ylr, yli, yls), ysc, t_limbs, t_scales, weights,
        tile_m=tile_m, tile_n=tile_n, interpret=interpret, fast=fast)


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "tile_n", "interpret", "fast"))
def column_intensity_int8(
    y_limbs,               # (ylr, yli, yls): each (3, B, n, w) int8
    ysc: jnp.ndarray,      # (3, B, n) float32
    t_limbs,               # (tlr, tli, tls): each (3, n, w) int8
    t_scales: jnp.ndarray,  # (3, n) float32 for (r, i, r+i)
    weights: jnp.ndarray,  # (B,) float32
    *,
    tile_m: int = 128,
    tile_n: int = 256,
    interpret: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """``fast=True`` runs the 2-limb mode: the 2^-16-weight limb-pair group
    is dropped in every dot (9 int8 passes per point instead of 18),
    trading exactness (2e-7 RMS) for ~1.5e-5 RMS — still ~100x below the
    reference's fp16-grid floor. Pair with the fast row transform."""
    ylr, yli, yls = y_limbs
    _, b, n, w = ylr.shape
    tlr, tli, tls = t_limbs
    assert tlr.shape == (3, n, w)

    tile_m = min(tile_m, n)
    tile_n = min(tile_n, n)
    if n % tile_m or n % tile_n:
        raise ValueError(f"n={n} must divide tile sizes ({tile_m}, {tile_n})")

    grid = (n // tile_m, n // tile_n)
    y_spec = pl.BlockSpec((3, b, tile_m, w), lambda i, j: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((3, tile_n, w), lambda i, j: (0, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, fast),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            y_spec, y_spec, y_spec,
            pl.BlockSpec((3, b, tile_m), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            t_spec, t_spec, t_spec,
            pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n, n), jnp.float32,
            vma=_out_vma(ylr, yli, yls, ysc, tlr, tli, tls, t_scales,
                         weights)),
    )(weights.astype(jnp.float32).reshape(b, 1),
      ylr, yli, yls, ysc, tlr, tli, tls, t_scales)


def quantize_cols(a: jnp.ndarray):
    """Per-COLUMN limb split of f32 (..., u, v): limbs (3, ..., u, v) int8 +
    scale (..., v) — for operands contracted over their leading matrix dim."""
    amax = jnp.max(jnp.abs(a), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / (127.0 * 65536.0), 1.0)
    q = a / scale
    l0 = jnp.round(q * (1.0 / 65536.0))          # |l0| <= 127 by scale choice
    r = q - l0 * 65536.0                          # |r| <= 2^15
    l1 = jnp.round(r * (1.0 / 256.0))             # in [-128, 128]
    carry = (l1 > 127.0).astype(q.dtype)          # +128 only; -128 fits int8
    l0 = l0 + carry                               # safe: l0 < 127 when carry
    l1 = l1 - 256.0 * carry
    r = q - l0 * 65536.0 - l1 * 256.0             # |r| <= 128
    l2 = jnp.clip(jnp.round(r), -128, 127)        # clip loses <= 1 ulp (2^-23)
    limbs = jnp.stack([l0, l1, l2], axis=0).astype(jnp.int8)
    return limbs, (scale * 65536.0)[..., 0, :]


def _quant_rows_in_kernel(y):
    """In-kernel per-row limb split of a (TM, w) f32 tile."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / (127.0 * 65536.0), 1.0)
    q = y / scale
    l0 = jnp.round(q * (1.0 / 65536.0))          # |l0| <= 127 by scale choice
    r = q - l0 * 65536.0                          # |r| <= 2^15
    l1 = jnp.round(r * (1.0 / 256.0))             # in [-128, 128]
    carry = (l1 > 127.0).astype(q.dtype)          # +128 only; -128 fits int8
    l0 = l0 + carry                               # safe: l0 < 127 when carry
    l1 = l1 - 256.0 * carry
    r = q - l0 * 65536.0 - l1 * 256.0             # |r| <= 128
    l2 = jnp.clip(jnp.round(r), -128, 127)        # clip loses <= 1 ulp (2^-23)
    return (l0.astype(jnp.int8), l1.astype(jnp.int8), l2.astype(jnp.int8),
            (scale * 65536.0)[:, 0])


def _row_kernel(fast, xlr, xli, xls, xsc, tlr, tli, tls, tsc,
                ylr, yli, yls, ysc):
    """Per (b, i): Y_b[i-tile] = T0[i-tile] @ X_b via int8 limbs, then
    re-quantize Y rows in VMEM for the column kernel."""
    kb = pl.program_id(0)

    def idot(a, c):
        return jax.lax.dot_general(
            a, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def group(tl, xl, ts, xs):
        s0 = idot(tl[0], xl[0, 0])
        s1 = idot(tl[0], xl[1, 0]) + idot(tl[1], xl[0, 0])
        m = (s0.astype(jnp.float32)
             + s1.astype(jnp.float32) * (1.0 / 256.0))
        if not fast:
            s2 = (idot(tl[0], xl[2, 0]) + idot(tl[1], xl[1, 0])
                  + idot(tl[2], xl[0, 0]))
            m = m + s2.astype(jnp.float32) * (1.0 / 65536.0)
        return m * (ts[:, None] * xs[None, :])

    m1 = group(tlr[...], xlr[...], tsc[0], xsc[0, kb])
    m2 = group(tli[...], xli[...], tsc[1], xsc[1, kb])
    m3 = group(tls[...], xls[...], tsc[2], xsc[2, kb])
    yr = m1 - m2
    yi = m3 - m1 - m2

    for plane, out_l, out_s in ((yr, ylr, 0), (yi, yli, 1),
                                (yr + yi, yls, 2)):
        l0, l1, l2, s = _quant_rows_in_kernel(plane)
        out_l[0, 0] = l0
        out_l[1, 0] = l1
        out_l[2, 0] = l2
        ysc[out_s] = s


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "fast"))
def row_transform_int8(
    x: jnp.ndarray,        # (B, w, w) complex64 windowed rolled products
    t_limbs,               # (tlr, tli, tls): each (3, n, w) int8 (row-quant)
    t_scales: jnp.ndarray,  # (3, n) float32
    *,
    tile_m: int = 128,
    interpret: bool = False,
    fast: bool = False,
):
    """Y_b = T0 @ X_b as int8 limb dots; returns Y already row-quantized
    ((ylr, yli, yls) each (3, B, n, w) int8, plus (3, B, n) scales)."""
    b, w, _ = x.shape
    tlr, tli, tls = t_limbs
    n = tlr.shape[1]

    xr = jnp.real(x)
    xi = jnp.imag(x)
    xlr, sxr = quantize_cols(xr)
    xli, sxi = quantize_cols(xi)
    xls, sxs = quantize_cols(xr + xi)
    xsc = jnp.stack([sxr, sxi, sxs])  # (3, B, w)

    grid = (b, n // tile_m)
    x_spec = pl.BlockSpec((3, 1, w, w), lambda k, i: (0, k, 0, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((3, tile_m, w), lambda k, i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    yl_spec = pl.BlockSpec((3, 1, tile_m, w), lambda k, i: (0, k, i, 0),
                           memory_space=pltpu.VMEM)
    vma = _out_vma(xlr, xli, xls, xsc, tlr, tli, tls, t_scales)
    out_shapes = (
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        # scales flattened to (3, b*n): a (3, 1, tile_m) block would violate
        # the (8, 128)-divisibility rule on its last two dims
        jax.ShapeDtypeStruct((3, b * n), jnp.float32, vma=vma),
    )
    blocks_per_b = n // tile_m
    ylr, yli, yls, ysc = pl.pallas_call(
        functools.partial(_row_kernel, fast),
        grid=grid,
        interpret=interpret,
        in_specs=[
            x_spec, x_spec, x_spec,
            pl.BlockSpec((3, b, w), lambda k, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            t_spec, t_spec, t_spec,
            pl.BlockSpec((3, tile_m), lambda k, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(yl_spec, yl_spec, yl_spec,
                   pl.BlockSpec((3, tile_m),
                                lambda k, i, _nb=blocks_per_b: (0, k * _nb + i),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
    )(xlr, xli, xls, xsc, tlr, tli, tls, t_scales)
    return ylr, yli, yls, ysc.reshape(3, b, n)


def _row_kernel_splitk(fast, xlr, xli, xls, xsc, tlr, tli, tls, tsc,
                       ylr, yli, yls, ysc, m1_acc, m2_acc, m3_acc):
    """Split-K variant of :func:`_row_kernel`: the contraction dim (X rows /
    T0 columns) is blocked over the innermost grid axis with f32 VMEM
    accumulators, so the X block shrinks from (w, w) to (tile_k, w) and the
    kernel fits the ~16 MB scoped-VMEM budget for w up to ~1400 (the 2048^2
    windowed case is w=1032 — square X blocks overflow past w ~ 800).
    Limb scales are k-independent (T is quantized per full row, X per full
    column), so they apply once at the final step, together with the
    in-kernel row requantization for the column kernel."""
    kb = pl.program_id(0)
    kk = pl.program_id(2)
    last = pl.num_programs(2) - 1

    def idot(a, c):
        return jax.lax.dot_general(
            a, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def group(tl, xl):
        s0 = idot(tl[0], xl[0, 0])
        s1 = idot(tl[0], xl[1, 0]) + idot(tl[1], xl[0, 0])
        out = (s0.astype(jnp.float32)
               + s1.astype(jnp.float32) * (1.0 / 256.0))
        if fast:  # 2-limb mode (see column_intensity_int8)
            return out
        s2 = (idot(tl[0], xl[2, 0]) + idot(tl[1], xl[1, 0])
              + idot(tl[2], xl[0, 0]))
        return out + s2.astype(jnp.float32) * (1.0 / 65536.0)

    @pl.when(kk == 0)
    def _():
        m1_acc[...] = jnp.zeros_like(m1_acc)
        m2_acc[...] = jnp.zeros_like(m2_acc)
        m3_acc[...] = jnp.zeros_like(m3_acc)

    m1_acc[...] += group(tlr[...], xlr[...])
    m2_acc[...] += group(tli[...], xli[...])
    m3_acc[...] += group(tls[...], xls[...])

    @pl.when(kk == last)
    def _():
        # xsc arrives whole ((3, B, w): a (3, 1, w) block would break the
        # last-two-dims tiling rule); index the batch row here.
        m1 = m1_acc[...] * (tsc[0][:, None] * xsc[0, kb][None, :])
        m2 = m2_acc[...] * (tsc[1][:, None] * xsc[1, kb][None, :])
        m3 = m3_acc[...] * (tsc[2][:, None] * xsc[2, kb][None, :])
        yr = m1 - m2
        yi = m3 - m1 - m2
        for plane, out_l, out_s in ((yr, ylr, 0), (yi, yli, 1),
                                    (yr + yi, yls, 2)):
            l0, l1, l2, s = _quant_rows_in_kernel(plane)
            out_l[0, 0] = l0
            out_l[1, 0] = l1
            out_l[2, 0] = l2
            ysc[out_s] = s


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "tile_k", "interpret", "fast"))
def row_transform_int8_splitk(
    x: jnp.ndarray,        # (B, w, w) complex64 windowed rolled products
    t_limbs,               # (tlr, tli, tls): each (3, n, w) int8 (row-quant)
    t_scales: jnp.ndarray,  # (3, n) float32
    *,
    tile_m: int = 128,
    tile_k: int = 256,
    interpret: bool = False,
    fast: bool = False,
):
    """Y_b = T0 @ X_b with the contraction split over k-blocks (see
    :func:`_row_kernel_splitk`); same outputs as :func:`row_transform_int8`.

    ``tile_k`` must be a multiple of 128 (it lands as the LAST dim of the T
    block, where Mosaic requires 128-divisibility). The contraction dim is
    zero-padded up to a tile_k multiple — exact, since zero limb rows/cols
    contribute nothing to the int8 dots and the per-row/column scales are
    untouched."""
    b, w, _ = x.shape
    tlr, tli, tls = t_limbs
    n = tlr.shape[1]
    if tile_k % 128 and not interpret:
        raise ValueError(f"tile_k={tile_k} must be a multiple of 128")

    xr = jnp.real(x)
    xi = jnp.imag(x)
    xlr, sxr = quantize_cols(xr)
    xli, sxi = quantize_cols(xi)
    xls, sxs = quantize_cols(xr + xi)
    xsc = jnp.stack([sxr, sxi, sxs])  # (3, B, w)

    w_k = -(-w // tile_k) * tile_k
    if w_k != w:
        pad_x = ((0, 0), (0, 0), (0, w_k - w), (0, 0))
        xlr, xli, xls = (jnp.pad(a, pad_x) for a in (xlr, xli, xls))
        pad_t = ((0, 0), (0, 0), (0, w_k - w))
        tlr, tli, tls = (jnp.pad(a, pad_t) for a in (tlr, tli, tls))

    grid = (b, n // tile_m, w_k // tile_k)
    x_spec = pl.BlockSpec((3, 1, tile_k, w), lambda k, i, kk: (0, k, kk, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((3, tile_m, tile_k), lambda k, i, kk: (0, i, kk),
                          memory_space=pltpu.VMEM)
    yl_spec = pl.BlockSpec((3, 1, tile_m, w), lambda k, i, kk: (0, k, i, 0),
                           memory_space=pltpu.VMEM)
    vma = _out_vma(xlr, xli, xls, xsc, tlr, tli, tls, t_scales)
    out_shapes = (
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        jax.ShapeDtypeStruct((3, b, n, w), jnp.int8, vma=vma),
        jax.ShapeDtypeStruct((3, b * n), jnp.float32, vma=vma),
    )
    blocks_per_b = n // tile_m
    ylr, yli, yls, ysc = pl.pallas_call(
        functools.partial(_row_kernel_splitk, fast),
        grid=grid,
        interpret=interpret,
        in_specs=[
            x_spec, x_spec, x_spec,
            pl.BlockSpec((3, b, w), lambda k, i, kk: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            t_spec, t_spec, t_spec,
            pl.BlockSpec((3, tile_m), lambda k, i, kk: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(yl_spec, yl_spec, yl_spec,
                   pl.BlockSpec((3, tile_m),
                                lambda k, i, kk, _nb=blocks_per_b: (0, k * _nb + i),
                                memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((tile_m, w), jnp.float32),
            pltpu.VMEM((tile_m, w), jnp.float32),
            pltpu.VMEM((tile_m, w), jnp.float32),
        ],
    )(xlr, xli, xls, xsc, tlr, tli, tls, t_scales)
    return ylr, yli, yls, ysc.reshape(3, b, n)


def prepare_t0_limbs(t0r, t0i):
    """Quantize the static T0 planes once per configuration."""
    tlr, str_ = quantize_rows(t0r)
    tli, sti = quantize_rows(t0i)
    tls, sts = quantize_rows(t0r + t0i)
    return (tlr, tli, tls), jnp.stack([str_, sti, sts])


def reference_window_intensity_int8(yr, yi, t_limbs, t_scales, weights):
    """XLA reference of the same limb math (tests / CPU path)."""
    ylr, syr = quantize_rows(yr)
    yli, syi = quantize_rows(yi)
    yls, sys_ = quantize_rows(yr + yi)
    tlr, tli, tls = t_limbs

    def group(yl, sy, tl, st):
        def idot(a, c):
            return jax.lax.dot_general(
                a.astype(jnp.int32), c.astype(jnp.int32),
                (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        # yl (3, B, n, w) -> per-limb (B, n, w)
        s0 = idot(yl[0], tl[0])
        s1 = idot(yl[0], tl[1]) + idot(yl[1], tl[0])
        s2 = (idot(yl[0], tl[2]) + idot(yl[1], tl[1])
              + idot(yl[2], tl[0]))
        m = (s0.astype(jnp.float32) + s1.astype(jnp.float32) * (1.0 / 256.0)
             + s2.astype(jnp.float32) * (1.0 / 65536.0))
        return m * sy[..., None] * st[None, None, :]

    m1 = group(ylr, syr, tlr, t_scales[0])
    m2 = group(yli, syi, tli, t_scales[1])
    m3 = group(yls, sys_, tls, t_scales[2])
    er = m1 - m2
    ei = m3 - m1 - m2
    return jnp.sum(weights[:, None, None] * (er * er + ei * ei), axis=0)
