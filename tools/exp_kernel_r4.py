"""Round-4 experiment: 2048^2 windowed-int8 kernel knob sweep on real TPU.

Results (/tmp/tune2048.log): baseline chunk4 tn128 tk256 = 973.6 pts/s;
tn256 / tk512 / tn256+tk512 / chunk8 ALL fail remote compile (scoped-VMEM
overflow at w=1032); chunk2 = 963.7 pts/s (throughput-neutral -> the
kernel is compute-bound). With the 18-pass int8 roofline at 1010 pts/s
(padded) the engine runs at ~96% of speed-of-light; see ROADMAP.md item 2.
"""
"""Measure 2048^2 windowed-int8 exact-Abbe variants on the real TPU."""
import time, sys
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lithographysimulator_tpu import OpticsConfig, LightSource, demo_bars
from lithographysimulator_tpu.models.pupil import pupil_function
from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
from lithographysimulator_tpu.ops import abbe as A
from lithographysimulator_tpu.ops.kernels import intensity_int8 as K
from lithographysimulator_tpu.parallel import padded_source_arrays

cfg = OpticsConfig(pixel_number=2048)
mask = demo_bars(cfg)
src = np.asarray(LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi/8))
aber = jnp.asarray([0,0,0.01,0,100,0.01,0,0.01,0.01,0.01], jnp.float32)

def seg_args(chunk, segs=64):
    shifts, weights, _ = padded_source_arrays(src, chunk * segs)
    seg = shifts.shape[0] // segs
    seg -= seg % chunk
    ms = int(np.abs(np.asarray(shifts)).max())
    return shifts[:seg], weights[:seg], ms, seg

def bench_engine(label, chunk, tile_n, tile_k, fast=False, reps=2):
    shifts, weights, ms, seg = seg_args(chunk)
    n = cfg.n
    fft_size = cfg.wavelength_scaling().fft_size
    w_win = A._window_size(n); lo = n//4 - 1
    t0 = A._zoom_dft_window(n, fft_size)
    t0r = jnp.asarray(t0.real, jnp.float32); t0i = jnp.asarray(t0.imag, jnp.float32)

    @jax.jit
    def run(geom, a, sh, wts):
        pupil = pupil_function(a, cfg)
        spec = mask_spectrum(geom, cfg)
        pt = A._tiled(pupil)
        sh2 = sh.reshape(-1, chunk, 2); w2 = wts.reshape(-1, chunk)
        t_limbs, t_scales = K.prepare_t0_limbs(t0r, t0i)
        def body(acc, sw):
            s, wt = sw
            x = A._windowed_products(pt, spec, s, w_win, lo)
            ylr, yli, yls, ysc = K.row_transform_int8_splitk(
                x, t_limbs, t_scales, tile_k=tile_k, fast=fast)
            part = K.column_intensity_int8(
                (ylr, yli, yls), ysc, t_limbs, t_scales, wt.astype(jnp.float32),
                tile_n=tile_n, fast=fast)
            return acc + part, None
        init = jnp.zeros((n, n), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (sh2, w2))
        return acc
    args = (mask.geometry, aber, shifts, weights)
    try:
        out = jax.block_until_ready(run(*args))  # compile
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        out = jax.block_until_ready(run(*args))
        dt = time.perf_counter() - t
        best = min(best, dt)
    print(f"{label}: {seg/best:.1f} pts/s ({best*1000:.0f} ms / {seg} pts) peak={float(out.max()):.3e}", flush=True)
    return seg/best

print(jax.devices(), flush=True)
# baseline: current production choices
bench_engine("baseline chunk4 tn128 tk256", 4, 128, 256)
bench_engine("tn256", 4, 256, 256)
bench_engine("tk512", 4, 128, 512)
bench_engine("tn256+tk512", 4, 256, 512)
bench_engine("chunk8 tn128", 8, 128, 256)
bench_engine("chunk2 tn128", 2, 128, 256)
