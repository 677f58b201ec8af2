"""Full-chip CD metrology: multi-feature extraction with subpixel edges,
CD-uniformity statistics/maps, per-edge placement errors, and the upgraded
tiled_fem reporting (round-3 metrology layer; the reference has none —
its README.md:18 'validate the model' roadmap item implies exactly this).
"""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    OpticsConfig,
    cd_uniformity,
    edge_placement_errors,
    feature_table,
)

CFG = OpticsConfig(pixel_number=64, pixel_size=25.0)


def _bars(n=64, width=6, pitch=16, phase=4):
    g = np.zeros((n, n), np.float32)
    for x in range(phase, n - width, pitch):
        g[:, x:x + width] = 1.0
    return g


def test_feature_table_binary_bars():
    g = _bars()
    t = feature_table(g, CFG)
    n_bars = len(range(4, 64 - 6, 16))
    assert len(t["width_nm"]) == 64 * n_bars  # every row sees every bar
    # binary edges land halfway between the last dark and first bright pixel
    np.testing.assert_allclose(t["width_nm"], 6 * 25.0, atol=1e-9)
    # centers are where the bars are
    centers = np.unique(np.round(t["center_nm"], 6))
    assert len(centers) == n_bars


def test_feature_table_subpixel_edges():
    """A continuous (non-binary) profile yields subpixel CDs that move
    smoothly with threshold — no whole-pixel quantization."""
    n = 64
    x = np.arange(n)
    profile = np.tile(np.exp(-((x - 32.0) / 6.0) ** 2), (n, 1))
    cds = [feature_table(profile, CFG, threshold=t)["width_nm"].mean()
           for t in (0.4, 0.5, 0.6)]
    assert cds[0] > cds[1] > cds[2]  # monotone in threshold
    # Gaussian: width(thr) = 2*6*sqrt(ln(1/thr)) px
    for thr, cd in zip((0.4, 0.5, 0.6), cds):
        expect = 2 * 6.0 * np.sqrt(np.log(1 / thr)) * 25.0
        assert abs(cd - expect) < 0.05 * expect


def test_feature_table_axes_and_row_step():
    g = _bars().T  # horizontal bars: features along axis 0
    t0 = feature_table(g, CFG, axis=0)
    np.testing.assert_allclose(t0["width_nm"], 6 * 25.0, atol=1e-9)
    t_sub = feature_table(g, CFG, axis=0, row_step=8)
    assert len(t_sub["width_nm"]) == len(t0["width_nm"]) // 8


def test_feature_table_edge_touching_runs():
    g = np.zeros((8, 8), np.float32)
    g[:, :3] = 1.0   # run touching the left boundary
    g[:, 6:] = 1.0   # run touching the right boundary
    t = feature_table(g, CFG)
    assert len(t["width_nm"]) == 16
    # boundary-touching edges extrapolate half a pixel outside
    np.testing.assert_allclose(np.sort(np.unique(np.round(t["width_nm"], 6))),
                               [2 * 25.0, 3 * 25.0])


def test_cd_uniformity_stats_and_map():
    g = _bars(64, width=6)
    g[40:, 4:10] = 0.0
    g[40:, 4:9] = 1.0  # bottom-left bar narrower by 1 px
    out = cd_uniformity(g, CFG, row_step=1, map_blocks=4, min_width_nm=1.0)
    assert out["count"] > 0
    assert out["sigma_cd_nm"] > 0  # mixed widths
    assert out["range_cd_nm"] == pytest.approx(25.0)
    cd_map = out["cd_map_nm"]
    assert cd_map.shape == (4, 4)
    # the narrowed region's block mean is below the top blocks'
    assert np.nanmean(cd_map[3]) < np.nanmean(cd_map[0])
    assert out["cdu_3sigma_nm"] == pytest.approx(3 * out["sigma_cd_nm"])


def test_uniform_chip_has_zero_cdu():
    out = cd_uniformity(_bars(), CFG, row_step=1)
    assert out["sigma_cd_nm"] == pytest.approx(0.0, abs=1e-9)
    assert out["range_cd_nm"] == pytest.approx(0.0, abs=1e-9)


def test_edge_placement_errors_uniform_bias():
    target = _bars(64, width=6)
    printed = _bars(64, width=8, phase=3)  # both edges biased out by 1 px
    out = edge_placement_errors(printed, target, CFG)
    assert out["missing"] == 0
    np.testing.assert_allclose(out["epe_rise_nm"], -25.0, atol=1e-9)
    np.testing.assert_allclose(out["epe_fall_nm"], 25.0, atol=1e-9)
    assert out["mean_abs_epe_nm"] == pytest.approx(25.0)
    assert out["max_abs_epe_nm"] == pytest.approx(25.0)


def test_edge_placement_errors_missing_feature():
    target = _bars(64, width=6)
    printed = target.copy()
    printed[:, 4:10] = 0.0  # first bar fails to print everywhere
    out = edge_placement_errors(printed, target, CFG)
    assert out["missing"] == 64  # one feature missing per row
    assert out["mean_abs_epe_nm"] == pytest.approx(0.0, abs=1e-9)


def test_edge_placement_errors_empty_printed():
    target = _bars(16, width=4)
    out = edge_placement_errors(np.zeros((16, 16), np.float32), target,
                                OpticsConfig(pixel_number=16))
    assert out["matched"] == 0
    assert out["missing"] > 0


def test_tiled_fem_reports_cdu_and_epe():
    """The upgraded tiled_fem: full-chip CD statistics per cell, CDU + EPE
    at the nominal condition."""
    from lithographysimulator_tpu.metrology import tiled_fem
    from lithographysimulator_tpu.models.resist import ResistModel
    from lithographysimulator_tpu.models.source import LightSource

    tile_cfg = OpticsConfig(pixel_number=64)
    big = _bars(128, width=8, pitch=32)
    src = np.asarray(LightSource(tile_cfg, sigma_out=0.6).classical())
    result = tiled_fem(
        big, tile_cfg, src, defocus_nm=[-60.0, 0.0, 60.0],
        doses=[0.9, 1.0, 1.1], resist=ResistModel(threshold=0.3),
        rank=32, halo=16, cd_row_step=4)
    assert result["cd_nm"].shape == (3, 3)
    assert result["cdu"] is not None
    assert result["cdu"]["count"] > 0
    assert result["cdu"]["cd_map_nm"].shape == (16, 16)
    assert result["epe"] is not None
    assert result["epe"]["matched"] > 0
    assert np.isfinite(result["epe"]["mean_abs_epe_nm"])
    # legacy single-row path still available
    legacy = tiled_fem(
        big, tile_cfg, src, defocus_nm=[0.0], doses=[1.0],
        resist=ResistModel(threshold=0.3), rank=32, halo=16, row=64)
    assert legacy["cd_nm"].shape == (1, 1)


# ---------------------------------------------------------------------------
# NILS (normalized image log-slope)
# ---------------------------------------------------------------------------


def test_nils_analytic_sinusoid():
    """Sinusoidal aerial image: ILS and CD at a threshold crossing have
    closed forms — the numeric table must match to a few percent."""
    from lithographysimulator_tpu.models.resist import nils_table

    cfg = OpticsConfig(pixel_number=256, pixel_size=2.0)
    p_nm = 128.0
    x = (np.arange(256) - 128) * cfg.pixel_size
    img = np.tile(0.5 * (1 + np.cos(2 * np.pi * x / p_nm)), (256, 1))
    t = 0.3
    out = nils_table(img, cfg, threshold=t, normalize=False, row_step=16)
    ils_ref = (np.pi / p_nm) * np.sqrt(1 - (2 * t - 1) ** 2) / t
    cd_ref = (p_nm / np.pi) * np.arccos(2 * t - 1)
    nils_ref = cd_ref * ils_ref
    assert out["count"] > 0
    assert abs(out["mean_ils_per_nm"] - ils_ref) / ils_ref < 0.05
    assert abs(out["mean_nils"] - nils_ref) / nils_ref < 0.05
    # axis=0 on the transposed image sees the same edges
    out_t = nils_table(img.T, cfg, threshold=t, normalize=False, axis=0,
                       row_step=16)
    np.testing.assert_allclose(out_t["mean_nils"], out["mean_nils"],
                               rtol=1e-6)


def test_nils_tracks_contrast():
    """Lower-contrast fringes at the same pitch have lower NILS (the whole
    point of the metric: dose sensitivity at the edge)."""
    from lithographysimulator_tpu.models.resist import nils_table

    cfg = OpticsConfig(pixel_number=256, pixel_size=2.0)
    x = (np.arange(256) - 128) * cfg.pixel_size
    carrier = np.cos(2 * np.pi * x / 128.0)
    sharp = np.tile(0.5 * (1 + carrier), (256, 1))
    soft = np.tile(0.5 + 0.25 * carrier, (256, 1))
    t = 0.45
    n_sharp = nils_table(sharp, cfg, threshold=t, normalize=False,
                         row_step=16)["mean_nils"]
    n_soft = nils_table(soft, cfg, threshold=t, normalize=False,
                        row_step=16)["mean_nils"]
    assert n_sharp > 1.4 * n_soft


def test_nils_empty_image():
    from lithographysimulator_tpu.models.resist import nils_table

    cfg = OpticsConfig(pixel_number=64)
    out = nils_table(np.zeros((64, 64)), cfg, threshold=0.3)
    assert out["count"] == 0 and out["mean_nils"] == 0.0


def test_hotspots_find_the_weak_feature():
    """One low-contrast feature among strong ones: the hotspot detector
    ranks its edges weakest and localizes them."""
    from lithographysimulator_tpu.models.resist import hotspots

    cfg = OpticsConfig(pixel_number=128, pixel_size=4.0)
    x = (np.arange(128) - 64) * cfg.pixel_size
    strong = 0.5 * (1 + np.cos(2 * np.pi * x / 128.0))
    img = np.tile(strong, (128, 1))
    # weak stripe: rows 40..60 get a flattened (low-slope) version
    img[40:60] = 0.45 + 0.25 * np.cos(2 * np.pi * x / 128.0)[None, :]
    out = hotspots(img, cfg, threshold=0.4, nils_limit=3.0, row_step=4)
    assert out["count"] > 0
    assert 0 < out["fraction_below"] < 1.0
    ys = out["locations"][:, 0]
    assert ((ys >= 40 * 4.0) & (ys <= 60 * 4.0)).all()
    # weakest-first ordering
    nils_col = out["locations"][:, 2]
    assert (np.diff(nils_col) >= -1e-9).all()
    assert (nils_col < 3.0).all()


def test_hotspots_clean_image_empty():
    from lithographysimulator_tpu.models.resist import hotspots

    cfg = OpticsConfig(pixel_number=64, pixel_size=4.0)
    x = (np.arange(64) - 32) * cfg.pixel_size
    img = np.tile(0.5 * (1 + np.cos(2 * np.pi * x / 64.0)), (64, 1))
    out = hotspots(img, cfg, threshold=0.4, nils_limit=0.5)
    assert out["count"] == 0 or out["fraction_below"] < 0.05
    out_none = hotspots(np.zeros((64, 64)), cfg)
    assert out_none["count"] == 0 and out_none["locations"].shape == (0, 3)
