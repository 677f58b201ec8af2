"""LER power-spectral-density analysis: averaged edge PSD + Palasantzas fit.

No reference counterpart (the reference has no resist at all — its
README.md:19 roadmap); oracles are synthetic edge ensembles generated
directly from the Palasantzas model PSD(f) = P0 / (1 + (2 pi f xi)^2)^(a+1/2)
and Parseval consistency between the PSD integral and the trace variance.
"""

import math

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig, lines_and_spaces
from lithographysimulator_tpu.models.resist import ResistModel
from lithographysimulator_tpu.models.stochastic import (
    StochasticResist,
    acf_correlation_length,
    edge_psd,
    fit_psd_model,
    stochastic_ensemble,
    stochastic_psd,
)

CFG = OpticsConfig(pixel_number=128, pixel_size=5.0)


def _palasantzas(f, p0, xi, alpha):
    return p0 / (1.0 + (2.0 * np.pi * f * xi) ** 2) ** (alpha + 0.5)


def _synth_traces(rng, n_traces, n_rows, spacing, p0, xi, alpha):
    """Zero-mean traces whose one-sided discrete PSD equals the model
    exactly (deterministic spectral amplitudes, random phases)."""
    f = np.fft.rfftfreq(n_rows, d=spacing)
    target = _palasantzas(f, p0, xi, alpha)
    amp = np.sqrt(target * n_rows / (2.0 * spacing))
    traces = []
    for _ in range(n_traces):
        phase = rng.uniform(0.0, 2.0 * np.pi, f.size)
        spec = amp * np.exp(1j * phase)
        spec[0] = 0.0
        if n_rows % 2 == 0:
            # Nyquist coefficient must be real; the one-sided estimate does
            # not double it, so |X| = sqrt(PSD N / d) hits the target
            spec[-1] = rng.choice([-1.0, 1.0]) * math.sqrt(
                target[-1] * n_rows / spacing)
        traces.append(np.fft.irfft(spec, n=n_rows))
    return traces, f, target


def _field_from_edges(rise_px, fall_px, n_cols, threshold=0.5):
    """(R, n_cols) continuous field whose feature_table subpixel crossings
    land exactly at the given per-row rise/fall positions (inverse of the
    linear-interpolation rule in models/resist.py feature_table)."""
    n_rows = len(rise_px)
    arr = np.zeros((n_rows, n_cols), np.float64)
    for i in range(n_rows):
        r, fp = float(rise_px[i]), float(fall_px[i])
        s = int(np.floor(r)) + 1       # first above-threshold pixel
        e = int(np.floor(fp)) + 1      # one past the last
        arr[i, s:e] = 1.0
        fr = np.clip(r - (s - 1), 1e-3, 1.0 - 1e-3)
        arr[i, s - 1] = (threshold - fr) / (1.0 - fr)
        ff = np.clip(fp - (e - 1), 1e-3, 1.0 - 1e-3)
        arr[i, e] = 1.0 - (1.0 - threshold) / ff
    return arr


def test_fit_recovers_exact_model():
    f = np.fft.rfftfreq(512, d=2.0)[1:257]
    p0, xi, alpha = 40.0, 18.0, 0.7
    fit = fit_psd_model(f, _palasantzas(f, p0, xi, alpha))
    assert fit["corr_length_nm"] == pytest.approx(xi, rel=0.15)
    assert fit["alpha"] == pytest.approx(alpha, abs=0.08)
    assert fit["psd0_nm3"] == pytest.approx(p0, rel=0.2)
    assert fit["fit_rms_log"] < 0.05
    # closed-form model sigma matches the numerical integral of the model
    num = math.sqrt(np.trapezoid(
        _palasantzas(np.linspace(1e-6, 5.0, 400000), p0, xi, alpha),
        dx=5.0 / 400000))
    assert fit["model_sigma_nm"] == pytest.approx(num, rel=0.1)


def test_edge_psd_recovers_synthetic_roughness():
    rng = np.random.default_rng(7)
    n_rows, spacing = 256, CFG.pixel_size
    p0, xi, alpha = 2.0, 30.0, 0.8  # nm^3, nm, -
    # two edges per field (rise+fall), 12 trials -> 24 traces averaged
    traces, f, target = _synth_traces(rng, 24, n_rows, spacing, p0, xi, alpha)
    fields = []
    for k in range(0, len(traces), 2):
        rise = 20.5 + traces[k] / spacing        # px deviations
        fall = 44.5 + traces[k + 1] / spacing
        fields.append(_field_from_edges(rise, fall, 64))
    out = edge_psd(np.stack(fields), CFG, fit=True)
    assert out["n_edges"] == 24
    # Parseval: sigma from the PSD integral matches the generated traces
    expected_var = np.mean([np.var(t) for t in traces])
    assert out["sigma_nm"] == pytest.approx(math.sqrt(expected_var), rel=0.1)
    # model parameters recovered from the field-level measurement
    assert out["corr_length_nm"] == pytest.approx(xi, rel=0.35)
    assert out["alpha"] == pytest.approx(alpha, abs=0.25)
    # model-free ACF length agrees with xi up to the O(1) model factor
    assert 0.2 * xi < out["acf_corr_length_nm"] < 3.0 * xi
    # spectrum itself tracks the target over the resolved band
    band = (f[1:n_rows // 2 + 1] * xi < 3.0) & (f[1:n_rows // 2 + 1] > 0)
    ratio = out["psd_nm3"][band] / target[1:n_rows // 2 + 1][band]
    assert np.median(ratio) == pytest.approx(1.0, abs=0.35)


def test_edge_psd_skips_incomplete_features():
    # feature missing on one cut line -> no complete trace -> NaN sigma
    field = _field_from_edges(np.full(64, 20.5), np.full(64, 44.5), 64)
    field[13] = 0.0
    out = edge_psd(field[None], CFG, fit=False)
    assert out["n_edges"] == 0
    assert math.isnan(out["sigma_nm"])


def _aerial():
    geom = np.abs(np.asarray(
        lines_and_spaces(CFG, line_width_px=16, pitch_px=32).geometry,
        np.float32))
    import jax.numpy as jnp
    soft = ResistModel(diffusion_nm=30.0).blur(jnp.asarray(geom), CFG)
    return np.asarray(soft / np.max(np.asarray(soft)))


def test_stochastic_psd_consistent_with_ensemble():
    img = _aerial()
    model = StochasticResist(dose_photons_per_nm2=10.0, diffusion_nm=8.0,
                             threshold=0.4)
    psd = stochastic_psd(img, CFG, model, trials=16, seed=3)
    ens = stochastic_ensemble(img, CFG, model, trials=16, seed=3)
    assert psd["n_edges"] > 0
    assert np.all(psd["psd_nm3"] >= 0)
    # both are 3-sigma edge roughness of the same process (mean-of-sigmas
    # vs rms-of-sigmas differ slightly; Monte-Carlo slack on top)
    assert psd["ler_3s_nm"] == pytest.approx(ens["ler_nm"], rel=0.5)
    # acid diffusion (8 nm) sets the correlation-length scale; the
    # diffusion-smoothed spectrum is Gaussian-like, so the model-free ACF
    # length is the meaningful number (the Palasantzas power-law fit
    # compensates the steep rolloff with a large alpha — reported, not
    # asserted)
    assert 3.0 < psd["acf_corr_length_nm"] < 60.0
    # spectrum decays: energy concentrated at low frequency
    assert psd["psd_nm3"][:5].mean() > 10.0 * psd["psd_nm3"][-20:].mean()
    # dose up -> roughness down, spectrum drops across the band
    hi = stochastic_psd(img, CFG,
                        StochasticResist(dose_photons_per_nm2=160.0,
                                         diffusion_nm=8.0, threshold=0.4),
                        trials=16, seed=3)
    assert hi["sigma_nm"] < psd["sigma_nm"]


def test_ensemble_inline_psd_matches_dedicated():
    """stochastic_ensemble(psd=True) accumulates the PSD from the same
    streamed trial rows (one pass, ADVICE r3) and matches the dedicated
    stochastic_psd at equal row_step/seed exactly (same trials, same
    accumulation)."""
    img = _aerial()
    model = StochasticResist(dose_photons_per_nm2=10.0, diffusion_nm=8.0,
                             threshold=0.4)
    ens = stochastic_ensemble(img, CFG, model, trials=8, seed=5, psd=True)
    spec = ens["psd"]
    dedicated = stochastic_psd(img, CFG, model, trials=8, seed=5,
                               row_step=max(1, img.shape[0] // 512))
    assert spec["n_edges"] == dedicated["n_edges"] > 0
    np.testing.assert_allclose(spec["psd_nm3"], dedicated["psd_nm3"],
                               rtol=1e-12)
    assert spec["ler_3s_nm"] == pytest.approx(dedicated["ler_3s_nm"])


def test_stochastic_psd_narrow_band_returns_nan():
    """A print band under 8 cut lines returns the n_edges=0 NaN result
    instead of edge_psd raising mid-run (ADVICE r3)."""
    img = np.zeros((32, 32), np.float32)
    img[14:17, 4:28] = 1.0  # 3-row feature: band < 8 cut lines
    model = StochasticResist(dose_photons_per_nm2=20.0, threshold=0.4)
    out = stochastic_psd(img, CFG, model, trials=4, seed=0)
    assert out["n_edges"] == 0
    assert np.isnan(out["sigma_nm"]) and np.isnan(out["corr_length_nm"])
    ens = stochastic_ensemble(img, CFG, model, trials=4, seed=0, psd=True)
    assert ens["psd"]["n_edges"] == 0
    assert np.isnan(ens["psd"]["corr_length_nm"])


def test_fit_psd_degenerate_returns_nan():
    """A near-zero-noise spectrum (< 4 positive samples) yields NaN fit
    parameters from the PSD pipeline instead of a ValueError (ADVICE r3)."""
    from lithographysimulator_tpu.models.stochastic import _fit_or_nan

    out = _fit_or_nan(np.array([0.01, 0.02, 0.03]), np.zeros(3))
    assert np.isnan(out["corr_length_nm"]) and np.isnan(out["alpha"])
    # edge_psd end-to-end: perfectly straight edges -> all-zero PSD
    field = np.zeros((1, 32, 32), np.float32)
    field[:, :, 10:20] = 1.0
    res = edge_psd(field, CFG, fit=True, threshold=0.5)
    assert res["n_edges"] > 0
    assert np.isnan(res["corr_length_nm"]) or res["psd_nm3"].sum() > 0
