"""Round-3 kernel experiments: 2048^2 exact-Abbe int8 variant sweep.

Measures the fused per-chunk int8 pipeline (split-K row transform + column
intensity kernel) at 2048^2 under different tile shapes, looking for
headroom over the round-2 configuration (tile_k=256 -> 24% contraction
padding; column tile_n=128). Timings are end-to-end with host readback
(tunnel microbenchmarks are unreliable), sequential dispatches kept under
the ~30 s tunnel limit.

Run on the TPU:
    cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site \
        nohup python /root/repo/tools/exp_kernel_r3.py > exp_r3.log 2>&1 &
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 2048
CHUNK = 4
REPS = 96  # chunks per timed dispatch loop (REPS * CHUNK points)


def main():
    from lithographysimulator_tpu import (LightSource, OpticsConfig,
                                          lines_and_spaces, pupil_function,
                                          spectrum_fft)
    from lithographysimulator_tpu.ops.abbe import (
        _tiled, _window_size, _windowed_products, _zoom_dft_window)
    from lithographysimulator_tpu.ops.kernels.intensity_int8 import (
        column_intensity_int8, prepare_t0_limbs, row_transform_int8_splitk)

    cfg = OpticsConfig(pixel_number=N)
    fft_size = cfg.wavelength_scaling().fft_size
    w = _window_size(N)
    print(f"n={N} w={w} fft_size={fft_size}", flush=True)

    mask = lines_and_spaces(cfg, line_width_px=N // 16, pitch_px=N // 8)

    # everything eager-complex or eager-big must go through jit on the
    # tunnel (CLAUDE.md); readback of eager products dies UNIMPLEMENTED
    @jax.jit
    def setup(geom, aberr):
        return (spectrum_fft(geom, cfg), pupil_function(aberr, cfg),
                LightSource(cfg, sigma_in=0.4, sigma_out=0.8)
                .quasar(4, -np.pi / 8))

    spec, pup, src_dev = jax.block_until_ready(
        setup(mask.geometry, jnp.zeros(1, jnp.float32)))
    src = np.asarray(src_dev)

    t0 = _zoom_dft_window(N, fft_size)
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)

    # one real chunk of windowed rolled products
    from lithographysimulator_tpu.ops.abbe import source_points
    pts = source_points(src)
    shifts = jnp.asarray(pts.shifts[:CHUNK])
    lo = N // 4 - 1

    @jax.jit
    def make_x(spec_, pup_):
        return _windowed_products(_tiled(pup_), spec_, shifts, w, lo)

    x = jax.block_until_ready(make_x(spec, pup))
    weights = jnp.asarray(pts.weights[:CHUNK])

    def variant_fn(tile_m_row, tile_k, tile_m_col, tile_n):
        t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)

        @jax.jit
        def seg(x_, wts):
            def body(acc, wscale):
                ylr, yli, yls, ysc = row_transform_int8_splitk(
                    x_, t_limbs, t_scales, tile_m=tile_m_row, tile_k=tile_k)
                part = column_intensity_int8(
                    (ylr, yli, yls), ysc, t_limbs, t_scales, wts * wscale,
                    tile_m=tile_m_col, tile_n=tile_n)
                return acc + part, None
            acc0 = jnp.zeros((N, N), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0,
                                  jnp.arange(1.0, REPS + 1.0, dtype=jnp.float32))
            return acc

        return seg

    results = {}
    variants = [
        ("r2-base tk256 tn128", 128, 256, 128, 128),
        ("row tm256 tk128", 256, 128, 128, 128),
        ("tk128 tn128", 128, 128, 128, 128),
    ]
    ref_img = None
    for name, tmr, tk, tmc, tn in variants:
        try:
            fn = variant_fn(tmr, tk, tmc, tn)
            t0c = time.time()
            img = jax.block_until_ready(fn(x, weights))  # compile
            compile_s = time.time() - t0c
            t0t = time.time()
            img = jax.block_until_ready(fn(x, weights))
            dt = time.time() - t0t
            pts_per_s = REPS * CHUNK / dt
            if ref_img is None:
                ref_img = np.asarray(img)
                dev = 0.0
            else:
                a = np.asarray(img)
                dev = float(np.abs(a - ref_img).max() / ref_img.max())
            results[name] = (dt, pts_per_s, dev)
            print(f"{name:22s} {dt:7.3f}s  {pts_per_s:8.1f} pts/s  "
                  f"dev={dev:.2e}  (compile {compile_s:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:22s} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:3000]}", flush=True)
    print("EXP_R3_DONE", flush=True)


if __name__ == "__main__":
    main()
