"""Process-variability (PV) bands: outer/inner printed contours and
per-edge band widths across the focus x dose process corners.

The standard OPC sign-off artifact — no reference counterpart. Oracles are
set-algebra invariants (inner subset of every profile subset of outer; band
= outer minus inner), monotonicity of the band under a wider process
window, and hand-built alignment cases for
:func:`~lithographysimulator_tpu.aligned_edge_positions`.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    ResistModel,
    aligned_edge_positions,
    feature_table,
)
from lithographysimulator_tpu.metrology import tiled_fem

CFG = OpticsConfig(pixel_number=48)  # 25 nm px
BIG_N = 96


def _lines(n=BIG_N, w=4, pitch=12):
    m = np.zeros((n, n), np.float32)
    for x in range(8, n - 8, pitch):
        m[8:-8, x:x + w] = 1.0
    return m


def _run_fem(defocus, doses):
    src = np.asarray(LightSource(CFG, sigma_out=0.5).classical())
    return tiled_fem(
        _lines(), CFG, src, defocus_nm=defocus, doses=doses,
        resist=ResistModel(threshold=0.4), rank=16, halo=8,
        pv_bands=True)


@pytest.fixture(scope="module")
def fem_result():
    return _run_fem([-80.0, 0.0, 80.0], [0.9, 1.0, 1.1])


def test_pv_band_set_algebra(fem_result):
    pv = fem_result["pv"]
    outer = pv["outer"].astype(bool)
    inner = pv["inner"].astype(bool)
    band = pv["band"].astype(bool)
    # inner subset of outer; band is exactly the disagreement region
    assert not (inner & ~outer).any()
    np.testing.assert_array_equal(band, outer & ~inner)
    assert pv["band_area_frac"] == pytest.approx(band.mean())
    assert 0.0 < pv["band_area_frac"] < 0.5
    assert pv["conditions"] == 9
    # the nominal print lies between the rails: re-develop the nominal cell
    # and check containment (nominal CD is inside the per-cell range)
    cds = np.asarray(fem_result["cd_nm"])
    assert cds.min() > 0  # every corner printed something
    # open (unprinted-in-some-corner) edges are confined to line-end
    # corner rounding: a small fraction of the measured edge population
    total = pv["edges_measured"] + pv["edges_open"]
    assert pv["edges_open"] < 0.1 * total


def test_pv_edge_band_stats(fem_result):
    pv = fem_result["pv"]
    assert pv["edges_measured"] > 0
    assert pv["edge_band_mean_nm"] > 0.0
    assert pv["edge_band_max_nm"] >= pv["edge_band_mean_nm"]
    # edge motion across a +-80 nm focus / +-10% dose window on 100 nm
    # lines is nanometers, not wild: bounded by a pixel-scale sanity cap
    assert pv["edge_band_max_nm"] < 4 * CFG.pixel_size
    # per-edge band relates to the CD swing: the dose axis alone moves each
    # edge ~half the CD change, so mean edge band >= half the CD range seen
    # on the dose axis at mid focus (both measured on the same cut lines)
    cds = np.asarray(fem_result["cd_nm"])
    dose_swing = cds[1].max() - cds[1].min()
    assert pv["edge_band_mean_nm"] >= 0.4 * dose_swing / 2


def test_pv_band_grows_with_wider_window(fem_result):
    wide = _run_fem([-150.0, 0.0, 150.0], [0.8, 1.0, 1.2])
    assert (wide["pv"]["band_area_frac"]
            >= fem_result["pv"]["band_area_frac"])
    assert (wide["pv"]["edge_band_mean_nm"]
            > fem_result["pv"]["edge_band_mean_nm"])


def test_aligned_edge_positions_nan_for_missing():
    """A target feature absent from the profile yields NaN in ITS slots;
    printed features report their own subpixel edges."""
    target = np.zeros((32, 32), np.float32)
    target[4:28, 6:10] = 1.0
    target[4:28, 20:24] = 1.0
    profile = target.copy()
    profile[:, 20:24] = 0.0  # second bar fails to print
    cfg = OpticsConfig(pixel_number=32)
    ttab = feature_table(target, cfg, axis=1)
    rise, fall = aligned_edge_positions(profile, ttab, cfg, axis=1)
    assert rise.shape == ttab["row"].shape
    printed = ttab["center_nm"] < 15 * cfg.pixel_size
    assert np.isnan(rise[~printed]).all() and np.isnan(fall[~printed]).all()
    ptab = feature_table(profile, cfg, axis=1)
    np.testing.assert_allclose(rise[printed], ptab["rise_px"] * cfg.pixel_size)
    np.testing.assert_allclose(fall[printed], ptab["fall_px"] * cfg.pixel_size)


def test_aligned_edge_positions_shifted_edges():
    """A uniformly biased print reports edges shifted by exactly the bias."""
    cfg = OpticsConfig(pixel_number=32)
    target = np.zeros((32, 32), np.float32)
    target[4:28, 10:16] = 1.0
    biased = np.zeros_like(target)
    biased[4:28, 9:17] = 1.0  # one pixel wider each side
    ttab = feature_table(target, cfg, axis=1)
    rise, fall = aligned_edge_positions(biased, ttab, cfg, axis=1)
    t_rise = ttab["rise_px"] * cfg.pixel_size
    t_fall = ttab["fall_px"] * cfg.pixel_size
    np.testing.assert_allclose(rise, t_rise - cfg.pixel_size)
    np.testing.assert_allclose(fall, t_fall + cfg.pixel_size)
