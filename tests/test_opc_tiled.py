"""Full-chip tile-streamed OPC: the corrected mask must print closer to the
target layout than the uncorrected design does."""

import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig
from lithographysimulator_tpu.metrology import tiled_focus_images
from lithographysimulator_tpu.models.resist import ResistModel, pattern_fidelity
from lithographysimulator_tpu.optimize import opc_correct_tiled

TILE_CFG = OpticsConfig(pixel_number=64)
BIG_N = 128


@pytest.fixture(scope="module")
def layout():
    """Corner-heavy layout (isolated rectangles) — the kind OPC helps."""
    t = np.zeros((BIG_N, BIG_N), np.float32)
    for y in range(16, BIG_N - 16, 40):
        for x in range(16, BIG_N - 16, 40):
            t[y:y + 12, x:x + 20] = 1.0
    return t


@pytest.fixture(scope="module")
def source():
    return np.asarray(LightSource(TILE_CFG, sigma_out=0.6).annular())


def _print_fidelity(mask_big, layout, source, resist):
    img = tiled_focus_images(mask_big, TILE_CFG, source, [0.0],
                             rank=64, halo=16)[0]
    profile = (img / img.max()) > resist.threshold
    return pattern_fidelity(profile.astype(np.float32), layout, TILE_CFG)


@pytest.mark.slow
def test_opc_correct_tiled_improves_print(layout, source):
    resist = ResistModel(threshold=0.3, steepness=30.0)
    before = _print_fidelity(layout, layout, source, resist)
    corrected = opc_correct_tiled(
        layout, TILE_CFG, source, resist=resist,
        halo=16, steps=30, rank=48, learning_rate=0.2)
    assert corrected.shape == (BIG_N, BIG_N)
    assert corrected.min() >= 0.0 and corrected.max() <= 1.0
    after = _print_fidelity(corrected, layout, source, resist)
    assert after["iou"] > before["iou"]
    assert after["xor_area_nm2"] < before["xor_area_nm2"]


@pytest.mark.slow
def test_opc_correct_tiled_second_sweep_consistent(layout, source):
    """A second Gauss-Seidel sweep keeps improving (or at least never
    degrades) the printed fidelity."""
    resist = ResistModel(threshold=0.3, steepness=30.0)
    one = opc_correct_tiled(layout, TILE_CFG, source, resist=resist,
                            halo=16, steps=15, rank=48)
    two = opc_correct_tiled(layout, TILE_CFG, source, resist=resist,
                            halo=16, steps=15, rank=48, sweeps=2)
    f1 = _print_fidelity(one, layout, source, resist)
    f2 = _print_fidelity(two, layout, source, resist)
    assert f2["iou"] >= f1["iou"] - 0.01


def test_opc_output_mrc_check_and_repair(layout, source):
    """MRC on an OPC output: the checker runs on the corrected mask, and a
    repair pass makes it rule-clean without destroying print fidelity."""
    from lithographysimulator_tpu.models.mrc import (MaskRules, mrc_check,
                                                     mrc_clean)

    resist = ResistModel(threshold=0.3, steepness=30.0)
    corrected = opc_correct_tiled(layout, TILE_CFG, source, resist=resist,
                                  halo=16, steps=12, rank=48,
                                  learning_rate=0.2)
    rules = MaskRules(min_width_nm=3 * TILE_CFG.pixel_size,
                      min_space_nm=2 * TILE_CFG.pixel_size,
                      min_area_nm2=8 * TILE_CFG.pixel_size ** 2)
    check = mrc_check(corrected, TILE_CFG, rules)
    assert check["component_count"] >= 9  # the rectangles survived OPC
    repaired = mrc_clean(corrected, TILE_CFG, rules)
    assert mrc_check(repaired, TILE_CFG, rules)["clean"]
    # repair must not collapse the print: fidelity stays close to the
    # corrected mask's
    resist_fid = _print_fidelity(repaired, layout, source, resist)
    assert resist_fid["iou"] > 0.5


def test_cli_opc_mrc_report(capsys):
    import json

    from lithographysimulator_tpu.cli import main

    rc = main([
        "opc", "--pixel-number", "64", "--big-n", "128", "--mask", "contacts",
        "--source", "annular", "--sigma-in", "0.3", "--sigma-out", "0.6",
        "--steps", "6", "--rank", "32", "--halo", "16",
        "--mrc-min-width", "50", "--mrc-min-area", "5000", "--mrc-repair",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "mrc" in payload
    mrc = payload["mrc"]
    assert "width_violation_px" in mrc and "clean" in mrc
    if not mrc["clean"]:
        assert payload["mrc_after_repair"]["clean"] in (True, False)


def test_orc_deck_signs_off_corrected_mask(layout, source):
    """The one-call ORC deck: an OPC-corrected mask passes (all features
    matched, EPE within spec, MRC clean), and the deck flags a broken mask
    (missing feature)."""
    from lithographysimulator_tpu.metrology import orc_check
    from lithographysimulator_tpu.models.mrc import MaskRules

    resist = ResistModel(threshold=0.3, steepness=30.0)
    corrected = opc_correct_tiled(layout, TILE_CFG, source, resist=resist,
                                  halo=16, steps=12, rank=48,
                                  learning_rate=0.2)
    rules = MaskRules(min_width_nm=2 * TILE_CFG.pixel_size,
                      min_area_nm2=6 * TILE_CFG.pixel_size ** 2)
    from lithographysimulator_tpu.models.mrc import mrc_clean

    corrected = mrc_clean(corrected, TILE_CFG, rules)
    deck = orc_check(corrected, layout, TILE_CFG, source, resist=resist,
                     rank=48, halo=16, mrc_rules=rules, epe_spec_nm=90.0)
    assert deck["pass_"], deck
    assert deck["fidelity"]["iou"] > 0.5
    assert deck["epe"]["missing"] == 0 and deck["epe"]["spurious"] == 0
    assert deck["nils"]["count"] > 0
    assert len(deck["hotspots"]["locations"]) <= 20

    broken = corrected.copy()
    broken[16:28, 16:36] = 0.0  # delete a feature
    deck2 = orc_check(broken, layout, TILE_CFG, source, resist=resist,
                      rank=48, halo=16, epe_spec_nm=90.0)
    assert not deck2["pass_"]
    assert deck2["epe"]["missing"] > 0


def test_orc_deck_process_corners(layout, source):
    """ORC with process_corners: a mask that prints at nominal must ALSO
    survive the focus/dose corners. A generous band spec signs off; a
    tight one fails the same deck; PV stats land in the report."""
    from lithographysimulator_tpu.metrology import orc_check

    resist = ResistModel(threshold=0.3, steepness=30.0)
    corners = {"defocus_nm": [-80.0, 0.0, 80.0], "doses": [0.9, 1.0, 1.1],
               "max_open_edges": 4}
    deck = orc_check(layout, layout, TILE_CFG, source, resist=resist,
                     rank=48, halo=16, epe_spec_nm=90.0,
                     process_corners=corners)
    assert "pv" in deck and "process_window" in deck
    assert deck["pv"]["edge_band_mean_nm"] > 0
    assert deck["process_window"]["depth_of_focus_nm"] >= 0
    tight = dict(corners, max_edge_band_nm=deck["pv"]["edge_band_max_nm"]
                 * 0.5, max_open_edges=0)
    deck2 = orc_check(layout, layout, TILE_CFG, source, resist=resist,
                      rank=48, halo=16, epe_spec_nm=90.0,
                      process_corners=tight)
    assert not deck2["pass_"]
