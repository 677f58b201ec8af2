"""Stochastic resist: counting statistics, LER scaling, defect rates.

No reference counterpart (resist is the reference's unchecked roadmap item,
README.md:19, and it has no stochastic modeling); oracles are the model's
own deterministic limits and the 1/sqrt(dose) scaling law of photon-noise
LER.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lithographysimulator_tpu import OpticsConfig, lines_and_spaces
from lithographysimulator_tpu.models.resist import ResistModel
from lithographysimulator_tpu.models.stochastic import (
    StochasticResist,
    exposure_trials,
    stochastic_ensemble,
)

CFG = OpticsConfig(pixel_number=128, pixel_size=5.0)


def _aerial():
    """Synthetic smooth aerial image with vertical line features: binary
    lines low-passed to finite contrast (stochastic tests need realistic
    image slopes, not a hard mask)."""
    geom = np.abs(np.asarray(
        lines_and_spaces(CFG, line_width_px=16, pitch_px=32).geometry,
        np.float32))
    soft = ResistModel(diffusion_nm=30.0).blur(jnp.asarray(geom), CFG)
    return np.asarray(soft / jnp.max(soft))


IMG = _aerial()


def test_deterministic_limit_matches_resist_model():
    model = StochasticResist(diffusion_nm=8.0, threshold=0.4)
    det = np.asarray(model.deterministic_contour(jnp.asarray(IMG), CFG))
    ref = np.asarray(ResistModel(threshold=0.4, diffusion_nm=8.0)
                     .develop_binary(jnp.asarray(IMG), CFG))
    np.testing.assert_array_equal(det, ref)


def test_high_dose_converges_to_deterministic():
    model = StochasticResist(dose_photons_per_nm2=2e4, diffusion_nm=8.0,
                             threshold=0.4, noise="gaussian")
    trials = np.asarray(exposure_trials(IMG, CFG, model, trials=4, seed=1))
    det = np.asarray(model.deterministic_contour(jnp.asarray(IMG), CFG))
    assert np.mean(np.abs(trials - det[None])) < 0.01


@pytest.mark.slow
def test_ler_scales_down_with_dose():
    lo = stochastic_ensemble(
        IMG, CFG, StochasticResist(dose_photons_per_nm2=5.0,
                                   diffusion_nm=8.0, threshold=0.4),
        trials=24, seed=2)
    hi = stochastic_ensemble(
        IMG, CFG, StochasticResist(dose_photons_per_nm2=80.0,
                                   diffusion_nm=8.0, threshold=0.4),
        trials=24, seed=2)
    assert lo["ler_nm"] > 0 and hi["ler_nm"] > 0
    # 16x the dose: ideal photon-limited LER drops 4x; demand >1.5x with
    # Monte-Carlo slack
    assert lo["ler_nm"] > 1.5 * hi["ler_nm"]
    assert lo["lwr_nm"] > hi["lwr_nm"]


def test_poisson_and_gaussian_agree_at_high_dose():
    kw = dict(dose_photons_per_nm2=100.0, diffusion_nm=8.0, threshold=0.4)
    p = stochastic_ensemble(IMG, CFG, StochasticResist(noise="poisson", **kw),
                            trials=16, seed=3)
    g = stochastic_ensemble(IMG, CFG, StochasticResist(noise="gaussian", **kw),
                            trials=16, seed=3)
    assert abs(p["ler_nm"] - g["ler_nm"]) < 0.5 * max(p["ler_nm"], g["ler_nm"])


@pytest.mark.slow
def test_defect_rates_appear_at_starved_dose():
    starved = stochastic_ensemble(
        IMG, CFG, StochasticResist(dose_photons_per_nm2=0.8,
                                   diffusion_nm=5.0, threshold=0.4),
        trials=16, seed=4)
    rich = stochastic_ensemble(
        IMG, CFG, StochasticResist(dose_photons_per_nm2=500.0,
                                   diffusion_nm=5.0, threshold=0.4),
        trials=16, seed=4)
    assert starved["break_rate"] + starved["bridge_rate"] > 0.01
    assert rich["break_rate"] + rich["bridge_rate"] < 1e-3


@pytest.mark.slow
def test_print_probability_band():
    out = stochastic_ensemble(
        IMG, CFG, StochasticResist(dose_photons_per_nm2=5.0,
                                   diffusion_nm=5.0, threshold=0.4),
        trials=16, seed=5)
    p = out["print_probability"]
    assert p.shape == IMG.shape
    assert p.min() >= 0.0 and p.max() <= 1.0
    # the band is soft exactly at feature edges: some pixels are uncertain
    assert ((p > 0.05) & (p < 0.95)).sum() > 0
    assert out["trials"] == 16
    assert out["mean_cd_nm"] > 0 and out["deterministic_cd_nm"] > 0


def test_seed_reproducibility():
    model = StochasticResist(dose_photons_per_nm2=10.0, diffusion_nm=5.0,
                             threshold=0.4)
    a = np.asarray(exposure_trials(IMG, CFG, model, trials=4, seed=7))
    b = np.asarray(exposure_trials(IMG, CFG, model, trials=4, seed=7))
    c = np.asarray(exposure_trials(IMG, CFG, model, trials=4, seed=8))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    # trials are independent draws, not copies
    assert (a[0] != a[1]).any()


def test_pag_depletion_saturates():
    """With PAG depletion the deprotection ceiling flattens: starved-PAG
    contours lose less to bright-region noise than the linear model at the
    same dose (the saturated field clips high-count excursions)."""
    base = dict(dose_photons_per_nm2=20.0, diffusion_nm=5.0, threshold=0.4)
    lin = StochasticResist(**base)
    sat = StochasticResist(pag_per_nm2=5.0, **base)
    a = np.asarray(exposure_trials(IMG, CFG, lin, trials=8, seed=9))
    b = np.asarray(exposure_trials(IMG, CFG, sat, trials=8, seed=9))
    assert a.shape == b.shape
    assert not np.array_equal(a, b)


def test_validation():
    with pytest.raises(ValueError):
        StochasticResist(dose_photons_per_nm2=0.0)
    with pytest.raises(ValueError):
        StochasticResist(quantum_efficiency=0.0)
    with pytest.raises(ValueError):
        StochasticResist(noise="bernoulli")


def test_streamed_chunks_match_single_pass(monkeypatch):
    """Forcing multi-chunk streaming (tiny host budget) keeps the ensemble
    statistics equivalent to the single-pass run (independent chunk seeds:
    same distribution, metrics within Monte-Carlo noise)."""
    import lithographysimulator_tpu.models.stochastic as sto

    model = StochasticResist(dose_photons_per_nm2=5.0, diffusion_nm=8.0,
                             threshold=0.4)
    single = stochastic_ensemble(IMG, CFG, model, trials=24, seed=11)
    monkeypatch.setattr(sto, "_HOST_FIELD_BYTES", IMG.nbytes * 4)
    streamed = stochastic_ensemble(IMG, CFG, model, trials=24, seed=11)
    assert streamed["trials"] == 24
    assert streamed["print_probability"].shape == IMG.shape
    assert streamed["ler_nm"] == pytest.approx(single["ler_nm"], rel=0.4)
    assert streamed["mean_cd_nm"] == pytest.approx(single["mean_cd_nm"],
                                                   rel=0.05)
    assert abs(streamed["break_rate"] - single["break_rate"]) < 0.2


@pytest.mark.slow
def test_exposure_summary_contract():
    """The device summary matches what full fields would give: sampled
    continuous rows, per-cut run counts, and the contour sum."""
    from lithographysimulator_tpu.models.stochastic import exposure_summary

    model = StochasticResist(dose_photons_per_nm2=5.0, diffusion_nm=8.0,
                             threshold=0.4)
    rows, runs, band = exposure_summary(IMG, CFG, model, trials=6, seed=3,
                                        trial_chunk=3, row_step=4)
    fields = np.asarray(exposure_trials(IMG, CFG, model, trials=6, seed=3,
                                        binary=False, trial_chunk=3))
    np.testing.assert_allclose(np.asarray(rows), fields[:, ::4, :],
                               atol=1e-6)
    contours = fields > model.threshold
    np.testing.assert_allclose(np.asarray(band), contours.sum(axis=0),
                               atol=1e-6)
    pad = np.pad(contours, ((0, 0), (0, 0), (1, 1))).astype(np.int8)
    ref_runs = (np.diff(pad, axis=2) == 1).sum(axis=2)
    np.testing.assert_array_equal(np.asarray(runs), ref_runs)
