"""Benchmark: 1024^2 (and 2048^2) quadrupole aerial image on one TPU chip.

Workload (BASELINE.md tracked metric): 1024^2 line/space mask, 25 nm pixels,
lambda=193 nm, NA=0.7, quadrupole source sigma 0.4/0.8 (~49.4k source
points), aberration-free pupil.

Timed pipelines:

* **SOCS** (Hopkins TCC eigenkernels, ops/hopkins.py): build rank-256
  kernels once, then image = 256 weighted coherent systems. The headline
  value is the full cold image: spectrum + kernel build + image.
* **Abbe exact** (per-source-point engine, the reference's own algorithm,
  reference imageformation.py:47-77): the int8 limb-emulated Pallas engine
  (ops/kernels/intensity_int8.py). MEASURED end-to-end over all 8 segments
  (the axon tunnel faults on single dispatches over ~30 s, so the scan is
  dispatched in 8 pieces and the wall-clock includes every piece
  back-to-back — no extrapolation).
* **Abbe f32** ('matmul' engine, fp32-highest contractions): measured over
  all 8 segments like int8; the accuracy-over-speed configuration.
* **2048^2 oracle check**: the int8 engine imaged against the independent
  complex128 NumPy oracle (tests/numpy_oracle.py) on a sparse 8-point
  source — reports the absolute nRMS the production split-K branch
  achieves on hardware.

Baseline: the reference's loop is linear in source points;
tools/bench_reference.py measured its per-point CPU cost at this grid size
and extrapolated 11765 s for the full 1024^2 run
(tools/reference_baseline.json). vs_baseline = reference_s / ours_s.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def _progress(msg: str) -> None:
    """Stage marker on stderr (stdout stays one JSON line): long tunnel
    compiles are otherwise indistinguishable from a hang."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

REFERENCE_BASELINE_S = 11764.6   # tools/reference_baseline.json @1024^2
REFERENCE_2048_S = 163591.3      # tools/reference_baseline.json @2048^2
N = 1024
RANK = 256
# 2048^2 uses rank 128 (~9.7 GB standard-build peak, ~5.3 s cold). Rank 256
# fits HBM via the lean in-place build (ops/hopkins.py lean=...) but costs
# 14 s cold; 128 captures the energy this benchmark needs, so speed wins.
RANK_2048 = 128
CHUNK = 4
SEGMENTS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the tunnel's compile helper can take
    # minutes per program; cache hits make repeat benchmark runs fast.
    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import lithographysimulator_tpu as lt
    from lithographysimulator_tpu.models.pupil import pupil_function
    from lithographysimulator_tpu.ops.abbe import accumulate_intensity
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
    from lithographysimulator_tpu.ops.hopkins import randomized_socs, socs_image
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg = lt.OpticsConfig(pixel_number=N)
    mask = lt.lines_and_spaces(cfg, line_width_px=N // 16, pitch_px=N // 8)
    src = np.asarray(
        lt.LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8))
    points = int(src.sum())
    src_dev = jnp.asarray(src)

    # Anti-memoization nonces: re-dispatching a compiled program with
    # IDENTICAL argument bytes through the tunnel can return a memoized
    # result in ~0 s WITHOUT executing (CLAUDE.md; the round-5 run-1
    # capture measured a 0.0 s chromatic cold build this way). Every
    # warmed-then-timed dispatch therefore gets a unique tiny piston
    # coefficient (OSA j=0): a global pupil phase — intensity-invariant
    # physics, distinct input bytes, so the timed call must execute.
    _nonce_k = [0]

    def ab_nonce(length: int = 1):
        _nonce_k[0] += 1
        v = np.zeros(length, np.float32)
        v[0] = np.float32(1e-9 * ((time.time_ns() % 997_001) + _nonce_k[0]))
        return jnp.asarray(v)

    aberrations = ab_nonce()

    # --- SOCS pipeline --------------------------------------------------
    # power_iters=1 + method='nystrom' (round 4, tools/exp_nystrom_r4.py):
    # the fixed-rank PSD Nystrom core needs one FEWER block matvec than
    # Rayleigh-Ritz at matched power_iters and its error contracts
    # ~quadratically in the basis residual — measured 1.146 s vs 1.286 s
    # AND closer to the randomized-truncation floor (image nRMS 7.08e-5 vs
    # 7.50e-5; the p=2 floor is 7.00e-5) at 1024^2 rank 256.
    @jax.jit
    def socs_build(a, s_map):
        return randomized_socs(pupil_function(a, cfg), s_map, cfg,
                               rank=RANK, power_iters=1, method="nystrom")

    @jax.jit
    def socs_apply(geom, socs):
        return socs_image(mask_spectrum(geom, cfg), socs, cfg, chunk=CHUNK)

    _progress("compiling 1024^2 SOCS build")
    socs = jax.block_until_ready(socs_build(ab_nonce(), src_dev))   # compile
    _progress("compiling 1024^2 SOCS apply")
    jax.block_until_ready(socs_apply(mask.geometry, socs))          # compile

    t0 = time.perf_counter()
    socs = jax.block_until_ready(socs_build(aberrations, src_dev))
    t_build = time.perf_counter() - t0
    # a piston nonce cancels inside the TCC, so the warm/timed kernel sets
    # can round to identical bytes — nonce the apply's geometry scale too
    # (1e-7 relative, cancels in every normalized consumer)
    geom_t = mask.geometry * jnp.float32(1.0 + 1e-7)
    t0 = time.perf_counter()
    image = jax.block_until_ready(socs_apply(geom_t, socs))
    t_apply = time.perf_counter() - t0
    total = t_build + t_apply

    # Accuracy class of the headline (VERDICT r4 item 4): the rigorous
    # dropped-tail bound on nRMS vs exact Abbe, via the library's refined
    # formula (completeness sup + exact tail mean — the raw dropped-trace
    # sup is vacuous at this scale: 285 in the round-5 run-1 capture).
    # All complex math stays in-jit; eager complex dies on the tunnel.
    _progress("computing SOCS truncation bound")
    from lithographysimulator_tpu.ops.hopkins import socs_image_nrms_bound

    pupil_dev = jax.jit(lambda a: pupil_function(a, cfg))(aberrations)
    spec_dev = jax.jit(lambda g: mask_spectrum(g, cfg))(geom_t)
    r0 = float(np.asarray(jax.jit(
        lambda p: jnp.sum(jnp.abs(p) ** 2))(pupil_dev)))
    trace = float(src.sum()) * r0
    socs_nrms_bound = socs_image_nrms_bound(
        socs, spec_dev, image, trace=trace, pupil=pupil_dev,
        source_map=src_dev)
    # 2.1 GB kernel set, never used again: the 2048^2 Nystrom cold build
    # below peaks ~3 probe blocks (~13.9 GB) and needs the HBM back
    # (holding this OOMed the r4 bench; CLAUDE.md buffer-discipline rule).
    del socs

    # --- Abbe exact: MEASURED over all 8 segments -----------------------
    shifts, weights, _ = padded_source_arrays(src, CHUNK * SEGMENTS)
    seg = shifts.shape[0] // SEGMENTS
    max_shift = int(np.abs(np.asarray(shifts)).max())

    def make_seg(engine):
        @jax.jit
        def abbe_seg(geom, a, sh, w):
            return accumulate_intensity(
                pupil_function(a, cfg), mask_spectrum(geom, cfg), sh, w, cfg,
                chunk=CHUNK, engine=engine, max_abs_shift=max_shift)
        return abbe_seg

    abbe_int8 = make_seg("int8")
    seg_args = [(mask.geometry, aberrations,
                 shifts[k * seg:(k + 1) * seg], weights[k * seg:(k + 1) * seg])
                for k in range(SEGMENTS)]
    _progress("compiling 1024^2 int8 Abbe segment")
    jax.block_until_ready(abbe_int8(                # compile (one shape);
        mask.geometry, ab_nonce(),                  # nonce: the timed loop
        seg_args[0][2], seg_args[0][3]))            # re-runs these args
    _progress("measuring 1024^2 int8 Abbe (8 segments)")
    t0 = time.perf_counter()
    partials = [abbe_int8(*a) for a in seg_args]
    abbe_image_full = jax.block_until_ready(sum(partials))
    abbe_measured = time.perf_counter() - t0

    # Measured spot-check of the truncation bound: the SOCS headline image
    # vs this exact int8 image (postprocessed onto the same Gau'23 output
    # grid). Certifies socs_nrms_bound >= measured on hardware every run.
    from lithographysimulator_tpu.ops.abbe import _postprocess_gau23

    exact_1024 = np.asarray(jax.block_until_ready(
        jax.jit(lambda im: _postprocess_gau23(im, cfg))(abbe_image_full)))
    socs_vs_exact_nrms = float(
        np.sqrt(np.mean((np.asarray(image) - exact_1024) ** 2))
        / max(np.abs(exact_1024).max(), 1e-30))
    del exact_1024

    # --- Abbe f32 'matmul' engine: MEASURED over all 8 segments ----------
    # (accuracy-over-speed configuration; measured end-to-end like int8,
    # not extrapolated from one segment — VERDICT r3 item 7)
    abbe_f32 = make_seg("matmul")
    _progress("compiling 1024^2 f32 Abbe segment")
    jax.block_until_ready(abbe_f32(mask.geometry, ab_nonce(),
                                   seg_args[0][2], seg_args[0][3]))
    _progress("measuring 1024^2 f32 Abbe (8 segments)")
    t0 = time.perf_counter()
    partials_f32 = [abbe_f32(*a) for a in seg_args]
    jax.block_until_ready(sum(partials_f32))
    abbe_f32_measured = time.perf_counter() - t0
    del partials_f32

    # --- 2048^2: SOCS cold + exact-Abbe segment throughput --------------
    n2 = 2048
    cfg2 = lt.OpticsConfig(pixel_number=n2)
    mask2 = lt.lines_and_spaces(cfg2, line_width_px=n2 // 16, pitch_px=n2 // 8)
    src2 = np.asarray(
        lt.LightSource(cfg2, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8))
    points2 = int(src2.sum())

    @jax.jit
    def socs_cold_2048(geom, a, s_map):
        # method='nystrom': 2.710 s vs 3.052 s RR (tools/exp_nystrom_r4.py)
        k = randomized_socs(pupil_function(a, cfg2), s_map, cfg2,
                            rank=RANK_2048, power_iters=1, method="nystrom")
        return socs_image(mask_spectrum(geom, cfg2), k, cfg2, chunk=CHUNK)

    args2 = (mask2.geometry, aberrations, jnp.asarray(src2))
    _progress("compiling 2048^2 SOCS cold pipeline")
    jax.block_until_ready(socs_cold_2048(mask2.geometry, ab_nonce(),
                                         args2[2]))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(socs_cold_2048(*args2))
    t_socs_2048 = time.perf_counter() - t0

    # exact-Abbe per-point throughput at 2048^2 (one 1/64 segment: the full
    # ~198k-point run would take minutes of tunnel time; throughput is flat
    # in segment count at fixed shapes)
    segs2 = 64
    shifts2, weights2, _ = padded_source_arrays(src2, CHUNK * segs2)
    seg2 = shifts2.shape[0] // segs2
    max_shift2 = int(np.abs(np.asarray(shifts2)).max())

    @jax.jit
    def abbe_seg_2048(geom, a, sh, w):
        return accumulate_intensity(
            pupil_function(a, cfg2), mask_spectrum(geom, cfg2), sh, w, cfg2,
            chunk=CHUNK, engine="int8", max_abs_shift=max_shift2)

    a2 = (mask2.geometry, aberrations, shifts2[:seg2], weights2[:seg2])
    _progress("compiling 2048^2 int8 Abbe segment")
    jax.block_until_ready(abbe_seg_2048(mask2.geometry, ab_nonce(),
                                        a2[2], a2[3]))
    t0 = time.perf_counter()
    jax.block_until_ready(abbe_seg_2048(*a2))
    t_seg_2048 = time.perf_counter() - t0
    abbe_2048_pts_per_s = seg2 / t_seg_2048

    # --- 2048^2 absolute accuracy: int8 engine vs complex128 oracle ------
    # (VERDICT r3 item 2: certify the split-K branch the TPU actually runs
    # at 2048^2 against the independent float64 NumPy oracle, on-device.)
    # A sparse 8-point source keeps the host oracle cost at 8 big-N FFTs
    # while the framework executes exactly its production kernels (the
    # window size w=1032 is set by the grid, not the source).
    from tests import numpy_oracle as oracle

    from lithographysimulator_tpu.ops.abbe import abbe_image_points

    src_sparse = np.zeros((n2, n2), np.float32)
    bnd = n2 // 4 - 2
    for dy, dx in [(0, 0), (bnd, 0), (0, -bnd), (-(bnd // 2), bnd // 2),
                   (bnd // 3, bnd // 3), (-bnd, -(bnd // 4)), (7, -29),
                   (-53, 11)]:
        src_sparse[n2 // 2 + dy, n2 // 2 + dx] = 1.0
    shifts_s, weights_s, _ = padded_source_arrays(src_sparse, CHUNK)
    max_shift_s = int(np.abs(np.asarray(shifts_s)).max())

    @jax.jit
    def abbe_sparse_2048(geom, a, sh, w):
        # abbe_image_points (not raw accumulate_intensity): the oracle's
        # image includes the Gau'23 resize postprocess.
        return abbe_image_points(
            mask_spectrum(geom, cfg2), pupil_function(a, cfg2), sh, w, cfg2,
            chunk=CHUNK, engine="int8", max_abs_shift=max_shift_s)

    _progress("2048^2 int8 vs float64 oracle (8 sparse points)")
    ours_sparse = np.asarray(jax.block_until_ready(abbe_sparse_2048(
        mask2.geometry, aberrations, shifts_s, weights_s)))
    _progress("running complex128 host oracle (8 points at 2048^2)")
    ref_sparse = oracle.abbe64(
        np.asarray(mask2.geometry), src_sparse, np.zeros(1, np.float32),
        pixel_size=cfg2.pixel_size, wavelength=cfg2.wavelength, na=cfg2.na)
    abbe_2048_oracle_nrms = float(
        np.sqrt(np.mean((ours_sparse - ref_sparse) ** 2))
        / max(np.abs(ref_sparse).max(), 1e-30))
    del ours_sparse, ref_sparse

    # round 3: opt-in 2-limb fast mode (half the int8 dots, ~1.2e-5 RMS vs
    # the f32 engine — its own accuracy class, never auto-selected)
    @jax.jit
    def abbe_seg_2048_fast(geom, a, sh, w):
        return accumulate_intensity(
            pupil_function(a, cfg2), mask_spectrum(geom, cfg2), sh, w, cfg2,
            chunk=CHUNK, engine="int8_fast", max_abs_shift=max_shift2)

    _progress("compiling 2048^2 int8_fast Abbe segment")
    jax.block_until_ready(abbe_seg_2048_fast(mask2.geometry, ab_nonce(),
                                             a2[2], a2[3]))
    t0 = time.perf_counter()
    jax.block_until_ready(abbe_seg_2048_fast(*a2))
    abbe_2048_fast_pts_per_s = seg2 / (time.perf_counter() - t0)

    # --- round 3: warm-started rebuild (adjacent defocus, 1024^2) -------
    # The FEM money path: plane k+1's build restarts from plane k's Ritz
    # basis at power_iters=0. Timed vs the cold build above (t_build).
    from lithographysimulator_tpu.ops.focus import focus_stack_aberrations

    @jax.jit
    def socs_build_basis(a, s_map):
        socs_, basis_ = randomized_socs(
            pupil_function(a, cfg), s_map, cfg, rank=RANK, power_iters=1,
            lean=False, return_basis=True)
        return socs_.eigenvalues, basis_

    @jax.jit
    def socs_build_warm(a, s_map, basis_):
        return randomized_socs(
            pupil_function(a, cfg), s_map, cfg, rank=RANK, power_iters=0,
            lean=False, init_basis=basis_).eigenvalues

    ab_planes = jnp.asarray(np.asarray(focus_stack_aberrations(
        np.zeros(5, np.float32), np.array([0.0, 40.0, 80.0], np.float32))))
    # unique piston per plane per run (anti-memoization, see ab_nonce)
    ab_planes = ab_planes.at[:, 0].set(
        jnp.asarray([float(ab_nonce()[0]) for _ in range(3)], jnp.float32))
    _progress("compiling warm-start builds")
    _, basis = socs_build_basis(ab_planes[0], src_dev)
    jax.block_until_ready(basis)
    jax.block_until_ready(socs_build_warm(ab_planes[1], src_dev, basis))
    t0 = time.perf_counter()
    jax.block_until_ready(socs_build_warm(ab_planes[2], src_dev, basis))
    t_build_warm = time.perf_counter() - t0
    del basis  # 2.3 GB — the lean 2048^2 section below needs the HBM

    # --- round 3: polarized (vector) SOCS cold, 1024^2 ------------------
    # Full Jones-pupil physics in one kernel set (no reference analog at
    # all); build + image fused, unpolarized (6 component pupils), with the
    # production path's principal-channel compression (6 -> 5 here: one
    # exactly redundant channel, found by the channel Gram).
    from lithographysimulator_tpu.ops.hopkins import randomized_socs_vector
    from lithographysimulator_tpu.simulate import _channel_rotation_cached

    rot_v = _channel_rotation_cached(cfg, "unpolarized", True, None)
    vchan = None if rot_v is None else int(rot_v.shape[2])

    @jax.jit
    def vector_socs_cold(geom, a, s_map, rot):
        k = randomized_socs_vector(
            pupil_function(a, cfg), s_map, cfg, rank=RANK,
            polarization="unpolarized", power_iters=1, channel_rotation=rot)
        return socs_image(mask_spectrum(geom, cfg), k, cfg, chunk=CHUNK)

    _progress("compiling 1024^2 polarized SOCS cold")
    argsv = (mask.geometry, ab_planes[0], src_dev)
    argsv_warm = (mask.geometry, ab_planes[0].at[0].set(float(ab_nonce()[0])),
                  src_dev)
    jax.block_until_ready(vector_socs_cold(*argsv_warm, rot_v))
    t0 = time.perf_counter()
    jax.block_until_ready(vector_socs_cold(*argsv, rot_v))
    t_vector_cold = time.perf_counter() - t0

    # --- round 3: chromatic (finite-bandwidth) SOCS cold, 1024^2 --------
    # One polychromatic kernel set: 0.3 pm E95 ArF spectrum, 5 quadrature
    # samples, principal-channel-compressed to 2 effective component pupils
    # (1e-6 trace tolerance; 2.06x over the uncompressed build, 2.5e-7
    # nRMS) in the summed-TCC build (no reference analog; the reference is
    # monochromatic).
    from lithographysimulator_tpu.config import LaserSpectrum
    from lithographysimulator_tpu.ops.hopkins import randomized_socs_chromatic

    spec_laser = LaserSpectrum(bandwidth_pm=0.3, samples=5)
    rot_c = _channel_rotation_cached(cfg, None, True, spec_laser)
    cchan = None if rot_c is None else int(rot_c.shape[2])

    @jax.jit
    def chromatic_socs_cold(geom, a, s_map, rot):
        k = randomized_socs_chromatic(
            a, s_map, cfg, spectrum=spec_laser, rank=RANK, power_iters=1,
            channel_rotation=rot)
        return socs_image(mask_spectrum(geom, cfg), k, cfg, chunk=CHUNK)

    _progress("compiling 1024^2 chromatic SOCS cold")
    jax.block_until_ready(chromatic_socs_cold(*argsv_warm, rot_c))
    t0 = time.perf_counter()
    jax.block_until_ready(chromatic_socs_cold(*argsv, rot_c))
    t_chromatic_cold = time.perf_counter() - t0

    # --- round 3: stochastic resist trials, 1024^2 ----------------------
    # 16 Poisson photon/acid counting trials (sample + saturate + FFT blur
    # + threshold) on the SOCS aerial image — the Monte-Carlo ensemble
    # throughput that LER/defect statistics are built from.
    from lithographysimulator_tpu.models.stochastic import (
        StochasticResist, exposure_trials)

    from lithographysimulator_tpu.models.stochastic import exposure_summary

    sto_model = StochasticResist(dose_photons_per_nm2=20.0, diffusion_nm=8.0,
                                 threshold=0.3, pag_per_nm2=5.0)
    _progress("compiling 1024^2 stochastic trials")
    sto_image = image / jnp.max(image)

    from lithographysimulator_tpu.models.stochastic import _compiled_trials

    # Per-trial mean probe: block_until_ready does NOT reliably synchronize
    # through the tunnel (r5 run 1 clocked 0.4 ms for 16 trials at 1024^2),
    # so the timed region must include a host readback that DEPENDS on the
    # trials — 16 floats, negligible transfer.
    @jax.jit
    def sto_probe(im, keys):
        run = _compiled_trials(sto_model, cfg, True, 8)
        return jnp.mean(run(im, keys), axis=(1, 2))

    def sto_keys(s):
        return jax.random.split(jax.random.PRNGKey(s), 16)

    np.asarray(sto_probe(sto_image, sto_keys(0)))  # compile
    # Median of 3 timed repetitions (VERDICT r4 item 7: single samples of
    # this stage swung 1.8x between same-code captures — the dispatch is
    # ~100 ms, so one tunnel hiccup dominates a single sample). Seeds
    # differ per rep: identical args can return memoized without executing.
    sto_times = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        np.asarray(sto_probe(sto_image, sto_keys(s)))
        sto_times.append(time.perf_counter() - t0)
    sto_trials_per_s = 16 / float(np.median(sto_times))

    # the production ensemble path: transfer-lean device summary (sampled
    # cut lines + run counts + band) INCLUDING host readback of all three.
    # The device-only number above is dispatch-bound; this one is the
    # honest end-to-end rate (tunnel transfer dominates: ~40 MB of summary
    # at ~35 MB/s).
    _progress("compiling 1024^2 stochastic summary")
    jax.block_until_ready(exposure_summary(sto_image, cfg, sto_model,
                                           trials=16, seed=0, trial_chunk=8,
                                           row_step=2))
    # Median of 3 (same rationale as above; the ~40 MB summary readback
    # rides the tunnel, whose transfer rate is the volatile term).
    sto_sum_times = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        rows_b, runs_b, band_b = exposure_summary(
            sto_image, cfg, sto_model, trials=16, seed=s, trial_chunk=8,
            row_step=2)
        np.asarray(rows_b); np.asarray(runs_b); np.asarray(band_b)
        sto_sum_times.append(time.perf_counter() - t0)
    sto_summary_trials_per_s = 16 / float(np.median(sto_sum_times))

    # --- round 3: lean single-block-peak build, 2048^2 rank 256 ---------
    # The memory-constrained config (standard build would OOM HBM); round-3
    # chunk re-tune cut it ~14 s -> ~6 s (row_chunk 32 / img_row_chunk 128).
    # Free every multi-GB buffer the earlier sections still reference: the
    # lean build's ~13 GB peak plus a held 2 GB kernel set exhausts HBM.
    image_peak = float(np.asarray(image).max())
    abbe_image_peak = float(np.asarray(abbe_image_full).max())
    del image, abbe_image_full

    @jax.jit
    def socs_lean_2048(geom, a, s_map):
        k = randomized_socs(pupil_function(a, cfg2), s_map, cfg2,
                            rank=256, power_iters=1, lean=True)
        return socs_image(mask_spectrum(geom, cfg2), k, cfg2, chunk=CHUNK)

    _progress("compiling 2048^2 lean rank-256 build")
    jax.block_until_ready(socs_lean_2048(mask2.geometry, ab_nonce(),
                                         args2[2]))
    t0 = time.perf_counter()
    jax.block_until_ready(socs_lean_2048(*args2))
    t_lean_2048 = time.perf_counter() - t0

    result = {
        "metric": f"1024^2 quadrupole aerial image wall-clock ({points} src pts, SOCS rank {RANK})",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_BASELINE_S / total, 1),
        "socs_build_s": round(t_build, 4),
        "socs_image_s": round(t_apply, 4),
        "socs_image_nrms_bound": round(socs_nrms_bound, 9),
        "socs_1024_vs_exact_nrms": round(socs_vs_exact_nrms, 9),
        "socs_image_amortized_vs_baseline": round(REFERENCE_BASELINE_S / t_apply, 1),
        "abbe_exact_s": round(abbe_measured, 2),
        "abbe_exact_measured": True,
        "abbe_vs_baseline": round(REFERENCE_BASELINE_S / abbe_measured, 1),
        "abbe_points_per_s": round(points / abbe_measured, 1),
        "abbe_engine": "int8",
        "abbe_f32_s": round(abbe_f32_measured, 2),
        "abbe_f32_measured": True,
        "abbe_f32_vs_baseline": round(REFERENCE_BASELINE_S / abbe_f32_measured, 1),
        "socs_build_warm_s": round(t_build_warm, 4),
        "socs_warm_speedup": round(t_build / max(t_build_warm, 1e-9), 2),
        "vector_socs_cold_s": round(t_vector_cold, 3),
        "vector_socs_channels": vchan,
        "chromatic_socs_cold_s": round(t_chromatic_cold, 3),
        "chromatic_socs_channels": cchan,
        "stochastic_device_trials_per_s": round(sto_trials_per_s, 1),
        "stochastic_device_samples_s": [round(t, 4) for t in sto_times],
        "stochastic_e2e_trials_per_s": round(sto_summary_trials_per_s, 1),
        "stochastic_e2e_samples_s": [round(t, 4) for t in sto_sum_times],
        "socs_cold_2048_s": round(t_socs_2048, 3),
        "socs_cold_2048_vs_baseline": round(REFERENCE_2048_S / t_socs_2048, 1),
        "socs_lean_2048_rank256_s": round(t_lean_2048, 3),
        "abbe_2048_oracle_nrms": round(abbe_2048_oracle_nrms, 9),
        "abbe_2048_points_per_s": round(abbe_2048_pts_per_s, 1),
        "abbe_2048_fast_points_per_s": round(abbe_2048_fast_pts_per_s, 1),
        "abbe_2048_est_s": round(points2 / abbe_2048_pts_per_s, 1),
        "abbe_2048_vs_baseline": round(
            REFERENCE_2048_S / (points2 / abbe_2048_pts_per_s), 1),
        "device": str(jax.devices()[0]),
        "image_peak": image_peak,
        "abbe_image_peak": abbe_image_peak,
    }
    print(json.dumps(result))


def main_with_retries(attempts: int = 3, cooldown_s: float = 150.0) -> None:
    """The serving tunnel occasionally faults (UNAVAILABLE) on long runs and
    needs minutes to recover; retry the whole benchmark a few times."""
    for attempt in range(attempts):
        try:
            main()
            return
        except Exception as exc:  # noqa: BLE001 - last resort reporting
            if attempt == attempts - 1:
                print(json.dumps({
                    "metric": "1024^2 quadrupole aerial image wall-clock",
                    "value": None, "unit": "s", "vs_baseline": None,
                    "error": f"{type(exc).__name__}: {exc}"[:300],
                }))
                raise
            time.sleep(cooldown_s)


if __name__ == "__main__":
    main_with_retries()
