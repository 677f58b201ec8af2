"""Double patterning (LELE): decomposition correctness and the physics
payoff — a pitch the single exposure cannot resolve prints after
decomposition.

No reference counterpart (the reference is single-mask); oracles are graph
properties of hand-built layouts and the framework's own imaging.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig
from lithographysimulator_tpu.models.multipatterning import (
    decompose_lele,
    lele_print,
)
from lithographysimulator_tpu.models.resist import ResistModel, feature_table

CFG = OpticsConfig(pixel_number=64)  # 25 nm px, NA 0.7, 193 nm


def _dense_lines(n=64, w=3, pitch=6):
    m = np.zeros((n, n), np.float32)
    for x in range(4, n - 4, pitch):
        m[8:-8, x:x + w] = 1.0
    return m


def test_decompose_alternates_dense_lines():
    m = _dense_lines()  # 150 nm pitch, 75 nm gaps
    parts = decompose_lele(m, CFG, min_pitch_nm=200.0)
    assert parts["violations"] == 0
    assert parts["features"] == len(range(4, 60, 6))
    # every feature landed on exactly one mask, union is the layout
    np.testing.assert_array_equal(
        np.maximum(parts["mask_a"], parts["mask_b"]) > 0.5, m > 0.5)
    assert not ((parts["mask_a"] > 0.5) & (parts["mask_b"] > 0.5)).any()
    # adjacent lines alternate: each mask is half the features
    na = len([c for c in parts["colors"].values() if c == 0])
    nb = parts["features"] - na
    assert abs(na - nb) <= 1
    # and each mask's internal pitch is relaxed to >= min_pitch
    for key in ("mask_a", "mask_b"):
        cols = np.nonzero(parts[key][32] > 0.5)[0]
        gaps = np.diff(cols)
        big = gaps[gaps > 3]  # between features
        assert (big * CFG.pixel_size >= 200.0).all()


def test_isolated_features_single_mask():
    m = np.zeros((64, 64), np.float32)
    m[10:20, 10:20] = 1.0
    m[40:50, 40:50] = 1.0  # far apart: no conflict
    parts = decompose_lele(m, CFG, min_pitch_nm=100.0)
    assert parts["conflict_edges"] == 0
    assert parts["violations"] == 0
    # both on color 0 (BFS starts each isolated node at 0)
    assert not parts["mask_b"].any()


def test_odd_cycle_reports_violation():
    # three mutually-near squares (triangle conflict graph) cannot 2-color
    m = np.zeros((64, 64), np.float32)
    m[20:26, 20:26] = 1.0
    m[20:26, 30:36] = 1.0
    m[30:36, 25:31] = 1.0
    parts = decompose_lele(m, CFG, min_pitch_nm=200.0)
    assert parts["features"] == 3
    assert parts["conflict_edges"] == 3
    assert parts["violations"] >= 1


def test_lele_resolves_what_single_exposure_cannot():
    """150 nm-pitch dense lines at NA 0.7 / 193 nm / sigma 0.3: the single
    exposure prints a near-uniform blur (wrong feature count); each LELE
    mask sees 300 nm pitch and resolves, and the union restores the dense
    pattern."""
    m = _dense_lines()
    src = np.asarray(LightSource(CFG, sigma_out=0.3).classical())
    out = lele_print(m, CFG, src, min_pitch_nm=200.0,
                     resist=ResistModel(threshold=0.45), rank=48, halo=16)
    assert out["violations"] == 0
    target_feats = feature_table(m, CFG, axis=1)["row"].size
    lele_feats = feature_table(out["profile"], CFG, axis=1)["row"].size
    single_feats = feature_table(out["profile_single"], CFG,
                                 axis=1)["row"].size
    # union print recovers ~the target feature count; the single exposure
    # collapses the dense grating (features merge or vanish)
    assert lele_feats > 0.8 * target_feats
    assert single_feats < 0.5 * target_feats


def test_progress_callback():
    m = _dense_lines()
    src = np.asarray(LightSource(CFG, sigma_out=0.3).classical())
    seen = []
    lele_print(m, CFG, src, min_pitch_nm=200.0, rank=32, halo=16,
               progress_cb=seen.append)
    assert seen and max(seen) <= 1.0 + 1e-9


def test_cli_lele_writes_gds(tmp_path, capsys):
    """lele --gds round-trips: the two decomposition layers rasterize back
    to the original layout."""
    from lithographysimulator_tpu.cli import main
    from lithographysimulator_tpu.io.contours import rasterize_loops
    from lithographysimulator_tpu.io.gdsii import read_gds

    gds = tmp_path / "lele.gds"
    rc = main(["lele", "--pixel-number", "64", "--mask", "lines",
               "--source", "classical", "--sigma-out", "0.3",
               "--min-pitch", "200", "--rank", "24", "--halo", "16",
               "--gds", str(gds)])
    assert rc == 0
    lib = read_gds(gds)
    polys = lib.flatten("LELE")
    layers = {p.layer for p in polys}
    assert layers == {1, 2}
    import json

    report = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert report["violations"] == 0
    cfg_px = 25.0
    union = np.zeros((64, 64), bool)
    for layer in (1, 2):
        loops = [p.xy_nm for p in polys if p.layer == layer]
        union |= rasterize_loops(loops, pixel_size=cfg_px, n=64) > 0.5
    from lithographysimulator_tpu import OpticsConfig, lines_and_spaces

    target = np.abs(np.asarray(lines_and_spaces(
        OpticsConfig(pixel_number=64), line_width_px=4,
        pitch_px=8).geometry)) > 0.5
    np.testing.assert_array_equal(union, target)
