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
    conflict_pairs,
    decompose_lele,
    decompose_multipatterning,
    lele_print,
    multipatterning_print,
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


def _brute_force_pairs(labels, k):
    """O(pixels^2) Chebyshev pair oracle for small layouts."""
    count = labels.max()
    coords = {lab: np.argwhere(labels == lab) for lab in range(1, count + 1)}
    pairs = set()
    for a in range(1, count + 1):
        for b in range(a + 1, count + 1):
            da = np.abs(coords[a][:, None, :] - coords[b][None, :, :])
            if da.max(axis=-1).min() <= k:
                pairs.add((a, b))
    return pairs


@pytest.mark.parametrize("seed,k", [(0, 1), (1, 2), (2, 3), (3, 5)])
def test_conflict_pairs_matches_brute_force(seed, k):
    """The vectorized boundary offset scan is EXACT: same pair set as the
    all-pairs Chebyshev distance oracle on random blob layouts."""
    from lithographysimulator_tpu.models.mrc import label_components

    rng = np.random.default_rng(seed)
    m = np.zeros((48, 48), np.int8)
    for _ in range(14):
        y, x = rng.integers(2, 42, 2)
        h, w = rng.integers(2, 6, 2)
        m[y:y + h, x:x + w] = 1
    labels, count = label_components(m)
    got = {tuple(p) for p in conflict_pairs(labels, k)}
    assert got == _brute_force_pairs(labels, k)


def test_triple_patterning_colors_odd_cycle():
    """The triangle layout that LELE cannot 2-color decomposes cleanly into
    three masks, each internally conflict-free."""
    m = np.zeros((64, 64), np.float32)
    m[20:26, 20:26] = 1.0
    m[20:26, 30:36] = 1.0
    m[30:36, 25:31] = 1.0
    two = decompose_multipatterning(m, CFG, min_pitch_nm=200.0, masks=2)
    three = decompose_multipatterning(m, CFG, min_pitch_nm=200.0, masks=3)
    assert two["violations"] >= 1
    assert three["violations"] == 0
    assert three["conflict_edges"] == 3
    # exactly one feature per mask; union restores the layout
    union = np.zeros_like(m)
    for sub in three["masks"]:
        assert 0 < sub.sum() < m.sum()
        union = np.maximum(union, sub)
    np.testing.assert_array_equal(union > 0.5, m > 0.5)


def test_triple_patterning_dense_lines_relaxes_pitch():
    """Dense lines at pitch p split over 3 masks see >= 3p same-mask pitch;
    every same-mask gap clears a min_pitch 2-coloring cannot satisfy."""
    m = _dense_lines()  # 150 nm pitch
    parts = decompose_multipatterning(m, CFG, min_pitch_nm=300.0, masks=3)
    assert parts["violations"] == 0
    for sub in parts["masks"]:
        cols = np.nonzero(sub[32] > 0.5)[0]
        gaps = np.diff(cols)
        big = gaps[gaps > 3]
        assert (big * CFG.pixel_size >= 300.0).all()
    # 2 masks cannot satisfy 300 nm at 150 nm pitch (needs every 2nd line
    # on the same mask -> 300 nm pitch but the conflict radius is 12 px
    # while same-mask neighbors sit at 12-3=9 px edge-to-edge)
    two = decompose_multipatterning(m, CFG, min_pitch_nm=300.0, masks=2)
    assert two["violations"] >= 1


def test_multipatterning_print_union():
    m = _dense_lines()
    src = np.asarray(LightSource(CFG, sigma_out=0.3).classical())
    out = multipatterning_print(m, CFG, src, min_pitch_nm=200.0, masks=3,
                                rank=32, halo=16)
    assert out["violations"] == 0
    assert len(out["profiles"]) == 3
    np.testing.assert_array_equal(
        out["profile"],
        np.maximum(np.maximum(out["profiles"][0], out["profiles"][1]),
                   out["profiles"][2]))


def test_subpixel_shift_exact_on_bandlimited_field():
    from lithographysimulator_tpu.models.multipatterning import (
        subpixel_shift,
    )

    n, px = 64, 25.0
    x = np.arange(n)
    # band-limited field: low-frequency sinusoid grid
    f = (np.sin(2 * np.pi * 3 * x / n)[:, None]
         * np.cos(2 * np.pi * 2 * x / n)[None, :])
    shifted = subpixel_shift(f, 0.0, 0.4 * px, px)
    expect = (np.sin(2 * np.pi * 3 * x / n)[:, None]
              * np.cos(2 * np.pi * 2 * (x - 0.4) / n)[None, :])
    np.testing.assert_allclose(shifted, expect, atol=1e-6)
    np.testing.assert_allclose(subpixel_shift(f, 0.0, 0.0, px), f)


def test_overlay_moves_only_the_shifted_masks_features():
    """10 nm x-overlay on mask B displaces B's printed edges by ~10 nm
    while mask A's stay put — the overlay-induced CDU mechanism."""
    from lithographysimulator_tpu.models.resist import (
        aligned_edge_positions,
        feature_table,
    )

    m = _dense_lines()
    src = np.asarray(LightSource(CFG, sigma_out=0.3).classical())
    kw = dict(min_pitch_nm=200.0, resist=ResistModel(threshold=0.45),
              rank=48, halo=16)
    base = lele_print(m, CFG, src, **kw)
    skew = lele_print(m, CFG, src, overlay_nm=[(0.0, 0.0), (0.0, 10.0)],
                      **kw)
    for key, expect_shift in (("profile_a", 0.0), ("profile_b", 10.0)):
        ttab = feature_table(base[key], CFG, axis=1, row_step=4)
        rise0, fall0 = aligned_edge_positions(base[key], ttab, CFG,
                                              axis=1, row_step=4)
        rise1, fall1 = aligned_edge_positions(skew[key], ttab, CFG,
                                              axis=1, row_step=4)
        moved = np.nanmean(np.concatenate([rise1 - rise0, fall1 - fall0]))
        assert moved == pytest.approx(expect_shift, abs=1.5), key
    # union print still has the full feature count, but gaps are skewed
    assert skew["violations"] == 0
