"""Round-2 kernel experiments: phase-free shared-T0 windowed transform, 3M
(Karatsuba) complex matmuls, and the fused Pallas column+intensity kernel.

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_kernel_r2.py A B C

Math: in the windowed zoom-DFT, T[i, r0+j] = T[i, lo+j] * exp(2i pi (i-n/2)(r0-lo)/N),
so E_b = diag(phaseR_b) (T0 X_b T0^T) diag(phaseC_b) and |E_b| = |T0 X_b T0^T|:
the per-point T slices collapse to one shared static T0 once only intensity is
accumulated.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import lithographysimulator_tpu as lt
from lithographysimulator_tpu.models.pupil import pupil_function
from lithographysimulator_tpu.ops.abbe import (
    _PRECISIONS, _tiled, _window_size, _zoom_dft_kernel, accumulate_intensity)
from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
from lithographysimulator_tpu.parallel import padded_source_arrays

import os
N = int(os.environ.get("EXP_N", 1024))
CHUNK = int(os.environ.get("EXP_CHUNK", 4))
HIGHEST = jax.lax.Precision.HIGHEST


def phase_free_windows(pupil_tiled, spectrum, shifts, w, lo):
    """(B, w, w) windowed rolled products, fused roll+window slices."""
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


def cmatmul_3m(ar, ai, br, bi, contract, precision):
    """Complex matmul via 3 real einsums (Karatsuba)."""
    m1 = jnp.einsum(contract, ar, br, precision=precision)
    m2 = jnp.einsum(contract, ai, bi, precision=precision)
    m3 = jnp.einsum(contract, ar + ai, br + bi, precision=precision)
    return m1 - m2, m3 - m1 - m2


def intensity_B_4m(pupil_tiled, spectrum, shifts, weights, fft_size):
    """Phase-free shared-T0, complex einsums (XLA decides passes)."""
    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = jnp.asarray(_zoom_dft_kernel(n, fft_size)[:, lo:lo + w], spectrum.dtype)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    y = jnp.einsum("iw,bwv->biv", t0, x, precision=HIGHEST)
    e = jnp.einsum("biv,jv->bij", y, t0, precision=HIGHEST)
    return jnp.sum(weights[:, None, None] * jnp.abs(e) ** 2, axis=0)


def intensity_C_3m(pupil_tiled, spectrum, shifts, weights, fft_size):
    """Phase-free shared-T0 + 3M complex matmuls on real f32 planes."""
    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", HIGHEST)
    er, ei = cmatmul_3m(yr, yi, t0r, t0i, "biv,jv->bij", HIGHEST)
    return jnp.sum(weights[:, None, None] * (er * er + ei * ei), axis=0)


def intensity_D_pallas(pupil_tiled, spectrum, shifts, weights, fft_size,
                       tile_m=None, tile_n=None):
    import os
    tile_m = tile_m or int(os.environ.get("TM", 128))
    tile_n = tile_n or int(os.environ.get("TN", 256))
    """Phase-free + 3M row transform (XLA) + fused Pallas column+|.|^2."""
    from lithographysimulator_tpu.ops.kernels.intensity_v2 import (
        fused_window_intensity)

    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", HIGHEST)
    return fused_window_intensity(yr, yi, t0r, t0i, weights,
                                  tile_m=tile_m, tile_n=tile_n)


def run_variant(name, fn, spectrum_f, pupil, geometry, aberr, shifts, weights,
                fft_size, points):
    pupil_tiled_fn = jax.jit(lambda p: _tiled(p))

    @jax.jit
    def seg(geom, a, sh, wt):
        spec = mask_spectrum(geom, CFG, solver="gau23")
        pt = _tiled(pupil_function(a, CFG))
        sh = sh.reshape(-1, CHUNK, 2)
        wt = wt.reshape(-1, CHUNK)

        def body(acc, sw):
            s, w_ = sw
            return acc + fn(pt, spec, s, w_, fft_size), None

        init = jnp.zeros((N, N), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (sh, wt))
        return acc

    args = (geometry, aberr, shifts, weights)
    out = jax.block_until_ready(seg(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(seg(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f} s segment, {dt / points * 1e6:.1f} us/pt,"
          f" peak {float(jnp.max(out)):.6e}")
    return np.asarray(out), dt


CFG = lt.OpticsConfig(pixel_number=N)


def main(variants):
    mask = lt.lines_and_spaces(CFG, line_width_px=N // 16, pitch_px=N // 8)
    src = np.asarray(
        lt.LightSource(CFG, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8))
    shifts, weights, _ = padded_source_arrays(src, CHUNK * 8)
    seg_len = shifts.shape[0] // 8
    shifts, weights = shifts[:seg_len], weights[:seg_len]
    points = int(np.sum(np.asarray(weights) > 0))
    aberr = jnp.zeros(1, jnp.float32)
    fft_size = CFG.wavelength_scaling().fft_size
    max_shift = int(np.abs(np.asarray(shifts)).max())
    print(f"n={N} chunk={CHUNK} segment={seg_len} pts ({points} live),"
          f" w={_window_size(N)}, max|s|={max_shift}, fft_size={fft_size}")

    results = {}

    if "A" in variants:
        @jax.jit
        def baseline(geom, a, sh, wt):
            return accumulate_intensity(
                pupil_function(a, CFG), mask_spectrum(geom, CFG), sh, wt, CFG,
                chunk=CHUNK, max_abs_shift=max_shift)

        args = (mask.geometry, aberr, shifts, weights)
        jax.block_until_ready(baseline(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(baseline(*args))
        dt = time.perf_counter() - t0
        print(f"A (current windowed HIGHEST): {dt:.3f} s, {dt/points*1e6:.1f} us/pt,"
              f" peak {float(jnp.max(out)):.6e}")
        results["A"] = np.asarray(out)

    for key, fn in (("B", intensity_B_4m), ("C", intensity_C_3m),
                    ("D", intensity_D_pallas), ("G", intensity_G_int8),
                    ("F", intensity_F_int8_pallas),
                    ("H", intensity_H_int8_full)):
        if key in variants:
            out, _ = run_variant(key, fn, None, None, mask.geometry, aberr,
                                 shifts, weights, fft_size, points)
            results[key] = out

    if "I" in variants:
        results["I8"] = run_engine("engine=int8", "int8", mask, aberr,
                                   shifts, weights, points, max_shift)
        results["MM"] = run_engine("engine=matmul", "matmul", mask, aberr,
                                   shifts, weights, points, max_shift)

    if "A" in results:
        ref = results["A"]
        scale = np.abs(ref).max()
        for key, img in results.items():
            if key == "A":
                continue
            rms = np.sqrt(np.mean((img.astype(np.float64) - ref.astype(np.float64)) ** 2)) / scale
            print(f"{key} vs A: normalized RMS {rms:.3e}")




# --- int8 limb emulation (variant G) ---------------------------------------

def quant_limbs(a, axis=-1):
    """Split f32 rows into 3 signed radix-256 int8 limbs + per-row scale:
    a ~ scale * (l0*2^16 + l1*2^8 + l2) with |l_k| <= 127."""
    amax = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / (127.0 * 65536.0), 1.0)
    q = a / scale
    l0 = jnp.round(q * (1.0 / 65536.0))
    r = q - l0 * 65536.0
    l1 = jnp.clip(jnp.round(r * (1.0 / 256.0)), -127, 127)
    r = r - l1 * 256.0
    l2 = jnp.clip(jnp.round(r), -127, 127)
    limbs = jnp.stack([l0, l1, l2]).astype(jnp.int8)
    # scale folded with 2^16 so dequant is scaleA*scaleB*(S0 + S1/256 + S2/65536)
    return limbs, (scale * 65536.0)[..., 0] if axis == -1 else scale


def limb_matmul(la, sa, lb, sb, contract):
    """f32-accurate matmul from int8 limb dots: 6 int8 passes."""
    def idot(x, y):
        return jax.lax.dot_general(
            x, y, contract, preferred_element_type=jnp.int32)
    s0 = idot(la[0], lb[0])
    s1 = idot(la[0], lb[1]) + idot(la[1], lb[0])
    s2 = idot(la[0], lb[2]) + idot(la[1], lb[1]) + idot(la[2], lb[0])
    return (s0.astype(jnp.float32) + s1.astype(jnp.float32) * (1.0 / 256.0)
            + s2.astype(jnp.float32) * (1.0 / 65536.0))


def intensity_G_int8(pupil_tiled, spectrum, shifts, weights, fft_size):
    """Row transform f32 3M HIGHEST; column transform via int8 limbs."""
    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", HIGHEST)

    # quantize (per output row): y rows are y[b, i, :]; t rows t0[j, :]
    lyr, syr = quant_limbs(yr)
    lyi, syi = quant_limbs(yi)
    lys, sys_ = quant_limbs(yr + yi)
    ltr, str_ = quant_limbs(t0r)
    lti, sti = quant_limbs(t0i)
    lts, sts = quant_limbs(t0r + t0i)

    def cm(ly, sy, lt, st):
        # ly (3, B, n, w), lt (3, n, w): einsum per limb pair
        def idot(a, c):
            return jax.lax.dot_general(
                a, c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        B = ly.shape[1]
        lyf = ly.reshape(3, B * n, w)
        s0 = idot(lyf[0], lt[0])
        s1 = idot(lyf[0], lt[1]) + idot(lyf[1], lt[0])
        s2 = idot(lyf[0], lt[2]) + idot(lyf[1], lt[1]) + idot(lyf[2], lt[0])
        m = (s0.astype(jnp.float32) + s1.astype(jnp.float32) * (1.0 / 256.0)
             + s2.astype(jnp.float32) * (1.0 / 65536.0))
        m = m.reshape(B, n, n)
        return m * sy[..., None] * st[None, None, :]

    m1 = cm(lyr, syr, ltr, str_)
    m2 = cm(lyi, syi, lti, sti)
    m3 = cm(lys, sys_, lts, sts)
    er = m1 - m2
    ei = m3 - m1 - m2
    return jnp.sum(weights[:, None, None] * (er * er + ei * ei), axis=0)



def intensity_F_int8_pallas(pupil_tiled, spectrum, shifts, weights, fft_size):
    """Row f32 3M HIGHEST (XLA) + fused Pallas int8-limb column+intensity."""
    from lithographysimulator_tpu.ops.kernels.intensity_int8 import (
        fused_window_intensity_int8, prepare_t0_limbs)

    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = cmatmul_3m(t0r, t0i, xr, xi, "iw,bwv->biv", HIGHEST)
    return fused_window_intensity_int8(yr, yi, t_limbs, t_scales, weights)



def intensity_H_int8_full(pupil_tiled, spectrum, shifts, weights, fft_size):
    """Both transforms in fused int8 Pallas kernels (row + column)."""
    from lithographysimulator_tpu.ops.kernels.intensity_int8 import (
        column_intensity_int8, prepare_t0_limbs, row_transform_int8)

    n = spectrum.shape[-1]
    w = _window_size(n)
    lo = n // 4 - 1
    t0 = _zoom_dft_kernel(n, fft_size)[:, lo:lo + w]
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)
    x = phase_free_windows(pupil_tiled, spectrum, shifts, w, lo)
    ylr, yli, yls, ysc = row_transform_int8(x, t_limbs, t_scales)
    return column_intensity_int8((ylr, yli, yls), ysc, t_limbs, t_scales,
                                 weights)



def run_engine(name, engine, mask, aberr, shifts, weights, points, max_shift):
    @jax.jit
    def seg(geom, a, sh, wt):
        return accumulate_intensity(
            pupil_function(a, CFG), mask_spectrum(geom, CFG), sh, wt, CFG,
            chunk=CHUNK, engine=engine, max_abs_shift=max_shift)
    args = (mask.geometry, aberr, shifts, weights)
    out = jax.block_until_ready(seg(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(seg(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f} s, {dt/points*1e6:.1f} us/pt, peak {float(jnp.max(out)):.6e}")
    return np.asarray(out)

if __name__ == "__main__":
    main(sys.argv[1:] or ["A", "B", "C"])
