"""Round-4 experiment wave 2: tile_m=256 variants (ALL VMEM-infeasible).

Results (/tmp/tune2048b.log): col_tm256, row_tm256, both_tm256, col_tm512,
row_tm256+tk128 all fail remote compile with scoped-VMEM overflow at
w=1032. Closes the tile-shape search; see ROADMAP.md item 2.
"""
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

def bench(label, chunk, row_tm, col_tm, tile_n, tile_k, reps=2):
    shifts, weights, _ = padded_source_arrays(src, chunk * 64)
    seg = shifts.shape[0] // 64; seg -= seg % chunk
    shifts, weights = shifts[:seg], weights[:seg]
    n = cfg.n; fft_size = cfg.wavelength_scaling().fft_size
    w_win = A._window_size(n); lo = n//4 - 1
    t0 = A._zoom_dft_window(n, fft_size)
    t0r = jnp.asarray(t0.real, jnp.float32); t0i = jnp.asarray(t0.imag, jnp.float32)

    @jax.jit
    def run(geom, a, sh, wts):
        pupil = pupil_function(a, cfg); spec = mask_spectrum(geom, cfg)
        pt = A._tiled(pupil)
        sh2 = sh.reshape(-1, chunk, 2); w2 = wts.reshape(-1, chunk)
        t_limbs, t_scales = K.prepare_t0_limbs(t0r, t0i)
        def body(acc, sw):
            s, wt = sw
            x = A._windowed_products(pt, spec, s, w_win, lo)
            ylr, yli, yls, ysc = K.row_transform_int8_splitk(
                x, t_limbs, t_scales, tile_m=row_tm, tile_k=tile_k)
            part = K.column_intensity_int8(
                (ylr, yli, yls), ysc, t_limbs, t_scales, wt.astype(jnp.float32),
                tile_m=col_tm, tile_n=tile_n)
            return acc + part, None
        acc, _ = jax.lax.scan(body, jnp.zeros((n, n), jnp.float32), (sh2, w2))
        return acc
    args = (mask.geometry, aber, shifts, weights)
    try:
        out = jax.block_until_ready(run(*args))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter(); out = jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t)
    print(f"{label}: {seg/best:.1f} pts/s ({best*1000:.0f} ms / {seg} pts) peak={float(out.max()):.3e}", flush=True)

print(jax.devices(), flush=True)
bench("col_tm256", 4, 128, 256, 128, 256)
bench("row_tm256", 4, 256, 128, 128, 256)
bench("both_tm256", 4, 256, 256, 128, 256)
bench("col_tm512", 4, 128, 512, 128, 256)
bench("row_tm256 tk128", 4, 256, 128, 128, 128)
