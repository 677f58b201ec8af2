"""Round-3 lean-SOCS-build experiments: chunk sizes at rank 256 / 2048^2.

The lean in-place build costs ~2x the standard build because its fori_loops
serialize tiny (8-row) chunks; larger chunks amortize the loop while their
temporaries stay far below the probe block's own footprint. Times the build
fused with one consuming image (a bare multi-GB kernel-set return would add
a full output allocation — CLAUDE.md).

Run on the TPU:
    cd /tmp && PYTHONPATH=/root/repo:/root/.axon_site \
        nohup python /root/repo/tools/exp_lean_r3.py > exp_lean.log 2>&1 &
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 2048
RANK = 256
OVERSAMPLE = 16
POWER_ITERS = 1  # bench's socs_cold setting


def main():
    from lithographysimulator_tpu import (LightSource, OpticsConfig,
                                          lines_and_spaces, pupil_function,
                                          spectrum_fft)
    from lithographysimulator_tpu.ops.hopkins import (_randomized_socs_lean,
                                                      socs_image)

    cfg = OpticsConfig(pixel_number=N)
    mask = lines_and_spaces(cfg, line_width_px=N // 16, pitch_px=N // 8)

    @jax.jit
    def setup(geom, aberr):
        return (spectrum_fft(geom, cfg), pupil_function(aberr, cfg),
                LightSource(cfg, sigma_in=0.4, sigma_out=0.8)
                .quasar(4, -np.pi / 8))

    spec, pup, src = jax.block_until_ready(
        setup(mask.geometry, jnp.zeros(1, jnp.float32)))
    print("setup done", flush=True)

    def variant(row_chunk, img_row_chunk):
        @jax.jit
        def build_and_image(p_, s_, spec_):
            socs = _randomized_socs_lean(
                p_, s_, cfg, rank=RANK, oversample=OVERSAMPLE,
                power_iters=POWER_ITERS, seed=0, compensated=True,
                row_chunk=row_chunk, img_row_chunk=img_row_chunk)
            return socs_image(spec_, socs, cfg, chunk=4)

        return build_and_image

    ref = None
    for rc, irc in [(8, 8), (32, 128), (32, 256), (8, 8)]:
        name = f"rc={rc:3d} irc={irc:3d}"
        try:
            fn = variant(rc, irc)
            t0 = time.time()
            np.asarray(fn(pup, src, spec))  # compile + run + readback
            compile_s = time.time() - t0
            t0 = time.time()
            a = np.asarray(fn(pup, src, spec))  # timed WITH host readback
            dt = time.time() - t0
            if ref is None:
                ref = a
                dev = 0.0
            else:
                dev = float(np.abs(a - ref).max() / ref.max())
            print(f"{name}  {dt:7.2f}s  dev={dev:.2e} "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}  FAILED: {type(exc).__name__}: {str(exc)[:400]}",
                  flush=True)
    print("EXP_LEAN_DONE", flush=True)


if __name__ == "__main__":
    main()
