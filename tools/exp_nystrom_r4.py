"""Round-4 experiment: cut the randomized SOCS build's matvec count.

The flagship cold build (1024^2 rank 256, power_iters=1, Rayleigh-Ritz)
runs THREE block matvecs through the Gram operator (G omega -> orth ->
G q1 -> orth -> q, plus G q for the RR projection), each 2 x 272 c64
FFTs — the build is FFT-bound. bench.py's p1-vs-p2 study showed the
randomized-truncation floor dominates the image error (RMS 7.50e-5 vs
7.43e-5), so cheaper subspace iterations may be free. Candidates, all at
rank 256 / oversample 16:

* p1-RR (production default): 3 matvecs.
* p0-RR: 2 matvecs, weaker basis (G omega), RR error linear in residual.
* p1-Nystrom: 2 matvecs (basis orth(G omega), one further Y = G B, PSD
  Nystrom core G ~ Y_nu S_nu^-1 Y_nu^H) — error ~quadratic in the basis
  residual. CPU study at 32^2 (tools + tests/test_hopkins.py): Nystrom
  p=1 beats RR p=1 by ~20x in image nRMS at one fewer matvec.

Accuracy metric: normalized image RMS vs the exact int8 Abbe image on the
bench mask/source. Timings: warm wall-clock with host readback (2 reps,
min). Also times the 2048^2 rank-128 build (bench's socs_cold_2048 body).

Results (2026-08-19, TPU v5 lite, warm wall-clock with readback; image
nRMS vs the exact int8 Abbe image, float64 metric):

* 1024^2 rank 256: p1-RR 1.286 s / 7.50e-5; p0-RR 0.936 s / 8.44e-5;
  p1-Nystrom 1.146 s / 7.08e-5; p2-Nystrom 1.497 s / 7.00e-5 (= floor).
* 2048^2 rank 128 build+image: p1-RR 3.052 s; p1-Nystrom 2.710 s.

p1-Nystrom is ~11% faster than p1-RR at BOTH scales and MORE accurate
(7.08e-5, essentially the 7.00e-5 randomized-truncation floor) — it ships
as the bench cold-build method. p0-RR is faster still but measurably off
the floor (8.44e-5), rejected.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import lithographysimulator_tpu as lt
    from lithographysimulator_tpu.models.pupil import pupil_function
    from lithographysimulator_tpu.ops.abbe import abbe_image_points
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
    from lithographysimulator_tpu.ops import hopkins as H
    from lithographysimulator_tpu.parallel import padded_source_arrays

    N, RANK, OS, CHUNK = 1024, 256, 16, 4
    cfg = lt.OpticsConfig(pixel_number=N)
    mask = lt.lines_and_spaces(cfg, line_width_px=N // 16, pitch_px=N // 8)
    src = np.asarray(
        lt.LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 4 / 2))
    aberr = jnp.zeros(1, jnp.float32)
    src_dev = jnp.asarray(src)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # --- reference: exact int8 Abbe image (segmented dispatches) ---------
    shifts, weights, _ = padded_source_arrays(src, CHUNK * 8)
    seg = shifts.shape[0] // 8
    ms = int(np.abs(np.asarray(shifts)).max())

    @jax.jit
    def abbe_seg(geom, a, sh, w):
        # abbe_image_points, NOT raw accumulate_intensity: socs_image
        # applies the Gau'23 resize postprocess, so the reference must too.
        return abbe_image_points(
            mask_spectrum(geom, cfg), pupil_function(a, cfg), sh, w, cfg,
            chunk=CHUNK, engine="int8", max_abs_shift=ms)

    log("building exact Abbe reference")
    ref = sum(abbe_seg(mask.geometry, aberr,
                       shifts[k * seg:(k + 1) * seg],
                       weights[k * seg:(k + 1) * seg]) for k in range(8))
    ref = np.asarray(jax.block_until_ready(ref)).astype(np.float64)
    scale = np.abs(ref).max()  # image values are ~1e17: f32 sums overflow

    spec = jax.jit(lambda g: mask_spectrum(g, cfg))(mask.geometry)

    def rms_of(socs):
        img = jax.jit(lambda s, k: H.socs_image(s, k, cfg, chunk=CHUNK))(
            spec, socs)
        img = np.asarray(jax.block_until_ready(img)).astype(np.float64)
        return float(np.sqrt(np.mean((img - ref) ** 2)) / scale)

    # --- candidates at 1024^2 rank 256 ------------------------------------
    for p, method in ((1, "rr"), (0, "rr"), (1, "nystrom"), (2, "nystrom")):
        @jax.jit
        def build(a, s_map, _p=p, _m=method):
            return H.randomized_socs(pupil_function(a, cfg), s_map, cfg,
                                     rank=RANK, oversample=OS, power_iters=_p,
                                     lean=False, method=_m)

        socs = jax.block_until_ready(build(aberr, src_dev))  # compile
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            socs = jax.block_until_ready(build(aberr, src_dev))
            times.append(time.perf_counter() - t0)
        log(f"p{p}-{method}: build {min(times):.4f} s, "
            f"image nRMS {rms_of(socs):.3e}")
        del socs

    # --- 2048^2 rank 128 (bench socs_cold_2048 body) ----------------------
    n2 = 2048
    cfg2 = lt.OpticsConfig(pixel_number=n2)
    mask2 = lt.lines_and_spaces(cfg2, line_width_px=n2 // 16, pitch_px=n2 // 8)
    src2 = np.asarray(
        lt.LightSource(cfg2, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8))
    src2_dev = jnp.asarray(src2)

    for method in ("rr", "nystrom"):
        @jax.jit
        def cold2048(g, a, s_map, _m=method):
            k = H.randomized_socs(pupil_function(a, cfg2), s_map, cfg2,
                                  rank=128, power_iters=1, lean=False,
                                  method=_m)
            return H.socs_image(mask_spectrum(g, cfg2), k, cfg2, chunk=2)

        img = jax.block_until_ready(cold2048(mask2.geometry, aberr, src2_dev))
        t0 = time.perf_counter()
        img = jax.block_until_ready(cold2048(mask2.geometry, aberr, src2_dev))
        dt = time.perf_counter() - t0
        log(f"2048^2 rank128 p1-{method}: build+image {dt:.4f} s")
        del img


if __name__ == "__main__":
    main()
