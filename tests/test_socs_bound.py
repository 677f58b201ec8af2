"""Error-budgeted SOCS rank: the rigorous dropped-tail image-error bound.

`socs_image_nrms_bound` maps the dropped eigenvalue tail of a SOCS
truncation to a guaranteed ceiling on nRMS(I_socs, I_exact) =
RMS(I_exact - I_socs) / max(I_exact) — the bench/test accuracy metric —
without running the exact Abbe solver (VERDICT r4 item 4). These tests
verify the bound DOMINATES the measured error across the demo configs
(reference demo: /root/reference/imageformation.py:99-122), for the dense
exact decomposition (where the bound is a theorem), the randomized build,
the vector build, and the tolerance-driven auto-rank paths.
"""

import numpy as np
import pytest

import lithographysimulator_tpu as lt
from lithographysimulator_tpu.ops.hopkins import (
    auto_rank_socs,
    randomized_socs,
    socs_image,
    socs_image_nrms_bound,
    tcc_eigensystem,
    tcc_total_trace,
)


def nrms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / max(np.abs(b).max(), 1e-30))


def _demo(aberrated=True):
    cfg = lt.OpticsConfig(pixel_number=64)
    mask = lt.demo_bars(cfg)
    src = np.asarray(
        lt.LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8))
    ab = (np.asarray([0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01],
                     np.float32) if aberrated
          else np.zeros(1, np.float32))
    return cfg, mask, src, ab


def _exact_image(cfg, mask, src, ab):
    res = lt.simulate(mask, src, ab, solver="gau23")
    return np.asarray(res.image)


def test_bound_dominates_exact_decomposition():
    """With exact eigenkernels the bound is a theorem: check it at several
    truncation ranks, and that it shrinks monotonically with rank."""
    cfg, mask, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    spectrum = lt.mask_spectrum(mask.geometry, cfg)
    exact = _exact_image(cfg, mask, src, ab)
    trace = tcc_total_trace(pupil, src)

    prev_bound = np.inf
    for rank in (4, 8, 16, 32):
        socs = tcc_eigensystem(pupil, src, cfg, rank=rank)
        img = socs_image(spectrum, socs, cfg)
        bound = socs_image_nrms_bound(socs, spectrum, img, trace=trace)
        measured = nrms(img, exact)
        assert bound >= measured, (rank, bound, measured)
        assert bound <= prev_bound + 1e-12
        prev_bound = bound


def test_bound_dominates_randomized_build():
    cfg, mask, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    spectrum = lt.mask_spectrum(mask.geometry, cfg)
    exact = _exact_image(cfg, mask, src, ab)

    for rank in (8, 16, 32):
        socs = randomized_socs(pupil, src, cfg, rank=rank)
        img = socs_image(spectrum, socs, cfg)
        bound = socs_image_nrms_bound(socs, spectrum, img,
                                      pupil=pupil, source_map=src)
        measured = nrms(img, exact)
        assert bound >= measured, (rank, bound, measured)


def test_bound_dominates_annular_unaberrated():
    cfg = lt.OpticsConfig(pixel_number=64)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_in=0.3, sigma_out=0.7).annular())
    ab = np.zeros(1, np.float32)
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    spectrum = lt.mask_spectrum(mask.geometry, cfg)
    exact = _exact_image(cfg, mask, src, ab)
    socs = randomized_socs(pupil, src, cfg, rank=16)
    img = socs_image(spectrum, socs, cfg)
    bound = socs_image_nrms_bound(socs, spectrum, img,
                                  pupil=pupil, source_map=src)
    assert bound >= nrms(img, exact)


def test_tcc_diag_convolution_alignment():
    """The refined bound's exact tail mean rides on the TCC diagonal
    diag(k) = sum_s w_s |P(k-s)|^2 computed as ONE circular convolution;
    on an even grid the ifftshift alignment is a classic off-by-one trap,
    so pin it against the brute-force rolled-pupil sum at the engine's
    shift convention, weighted by a non-uniform |M|^2 (a plain sum check
    is alignment-blind)."""
    import jax.numpy as jnp

    from lithographysimulator_tpu.ops.hopkins import _tcc_diag_weighted_m2
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg, _, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    p2 = np.abs(np.asarray(pupil)) ** 2
    shifts, weights, _ = padded_source_arrays(src, 1)
    diag_bf = np.zeros_like(p2)
    for (dy, dx), w in zip(np.asarray(shifts), np.asarray(weights)):
        if w:
            diag_bf += w * np.roll(np.roll(p2, int(dy), 0), int(dx), 1)
    rng = np.random.default_rng(0)
    m = (rng.standard_normal(p2.shape) + 1j * rng.standard_normal(p2.shape))
    expect = float((np.abs(m) ** 2 * diag_bf).sum())
    got = float(_tcc_diag_weighted_m2(
        pupil, jnp.asarray(src, jnp.float32),
        jnp.asarray(m.astype(np.complex64))))
    assert got == pytest.approx(expect, rel=1e-4)


def test_tolerance_selects_rank():
    """randomized_socs(rank='auto', tolerance=...) returns the smallest
    doubling-step rank whose bound meets the budget."""
    cfg, mask, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    spectrum = lt.mask_spectrum(mask.geometry, cfg)

    tol = 1e-2
    socs = randomized_socs(pupil, src, cfg, rank="auto", tolerance=tol,
                           spectrum=spectrum)
    img = socs_image(spectrum, socs, cfg)
    bound = socs_image_nrms_bound(socs, spectrum, img,
                                  pupil=pupil, source_map=src)
    assert bound <= tol
    # loose tolerance picks a small rank; a 100x tighter budget needs more
    tight = auto_rank_socs(pupil, src, cfg, tolerance=tol * 1e-2,
                           spectrum=spectrum)
    assert tight.rank >= socs.rank
    exact = _exact_image(cfg, mask, src, ab)
    assert nrms(img, exact) <= bound


def test_auto_rank_rejects_tolerance_without_spectrum():
    cfg, _, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)
    with pytest.raises(ValueError, match="spectrum"):
        auto_rank_socs(pupil, src, cfg, tolerance=1e-3)


def test_simulate_reports_bound_auto_path():
    cfg, mask, src, ab = _demo()
    res = lt.simulate(mask, src, ab, solver="socs")
    bound = res.report["socs_image_nrms_bound"]
    assert bound > 0
    exact = _exact_image(cfg, mask, src, ab)
    assert nrms(np.asarray(res.image), exact) <= bound


def test_simulate_reports_bound_pinned_rank_path():
    cfg, mask, src, ab = _demo()
    res = lt.simulate(mask, src, ab, solver="socs", socs_rank=24)
    assert res.report["socs_rank"] == 24
    bound = res.report["socs_image_nrms_bound"]
    assert "socs_energy_captured" in res.report
    exact = _exact_image(cfg, mask, src, ab)
    assert nrms(np.asarray(res.image), exact) <= bound


def test_simulate_honors_tolerance():
    cfg, mask, src, ab = _demo()
    tol = 5e-3
    res = lt.simulate(mask, src, ab, solver="socs", socs_tolerance=tol)
    assert res.report["socs_tolerance"] == tol
    assert res.report["socs_image_nrms_bound"] <= tol
    exact = _exact_image(cfg, mask, src, ab)
    assert (nrms(np.asarray(res.image), exact)
            <= res.report["socs_image_nrms_bound"])


def test_simulate_tolerance_requires_auto_rank():
    cfg, mask, src, ab = _demo()
    with pytest.raises(ValueError, match="socs_rank='auto'"):
        lt.simulate(mask, src, ab, solver="socs", socs_rank=16,
                    socs_tolerance=1e-3)
    with pytest.raises(ValueError, match="solver='socs'"):
        lt.simulate(mask, src, ab, solver="gau23", socs_tolerance=1e-3)


def test_simulate_reports_bound_vector_path():
    cfg, mask, src, ab = _demo(aberrated=False)
    res = lt.simulate(mask, src, ab, solver="socs",
                      polarization="unpolarized")
    bound = res.report["socs_image_nrms_bound"]
    exact = np.asarray(lt.simulate(mask, src, ab, solver="gau23",
                                   polarization="unpolarized").image)
    assert nrms(np.asarray(res.image), exact) <= bound


def test_randomized_socs_auto_rejects_traced_inputs():
    import jax

    cfg, _, src, ab = _demo()
    import lithographysimulator_tpu.models.pupil as mp

    pupil = mp.pupil_function(ab, cfg)

    @jax.jit
    def build(p):
        return randomized_socs(p, src, cfg, rank="auto")

    with pytest.raises(ValueError, match="under jit"):
        build(pupil)


def test_normalized_bound_matches_unnormalized():
    """nRMS is scale-invariant: the reported bound must agree whether or
    not the image was normalized by the source weight sum."""
    cfg, mask, src, ab = _demo()
    a = lt.simulate(mask, src, ab, solver="socs", socs_rank=24)
    b = lt.simulate(mask, src, ab, solver="socs", socs_rank=24,
                    normalize=True)
    ra = a.report["socs_image_nrms_bound"]
    rb = b.report["socs_image_nrms_bound"]
    assert ra == pytest.approx(rb, rel=1e-4)
