"""Mask rule checks: width/space/area violations, labeling, repair.

No reference counterpart (the reference has no OPC or mask verification);
oracles are hand-constructed geometry with known violations.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig
from lithographysimulator_tpu.models.mrc import (
    MaskRules,
    label_components,
    mrc_check,
    mrc_clean,
)

CFG = OpticsConfig(pixel_number=64, pixel_size=10.0)  # 10 nm pixels


def _mask(w_line=6, gap=6):
    m = np.zeros((64, 64), np.float32)
    m[:, 8:8 + w_line] = 1.0
    m[:, 8 + w_line + gap:8 + 2 * w_line + gap] = 1.0
    return m


def test_clean_mask_passes():
    rules = MaskRules(min_width_nm=40.0, min_space_nm=40.0,
                      min_area_nm2=500.0)
    out = mrc_check(_mask(), CFG, rules)
    assert out["clean"]
    assert out["width_violation_px"] == 0
    assert out["space_violation_px"] == 0
    assert out["area_violation_components"] == 0
    assert out["component_count"] == 2


def test_narrow_line_flags_width():
    m = _mask()
    m[:, 40:42] = 1.0  # 20 nm sliver < 40 nm rule
    out = mrc_check(m, CFG, MaskRules(min_width_nm=40.0))
    assert not out["clean"]
    assert out["width_violation_px"] >= 64 * 2
    # the violation map marks the sliver, not the legal lines
    assert out["width_violations"][:, 40:42].all()
    assert not out["width_violations"][:, 8:14].any()


def test_narrow_gap_flags_space():
    out_ok = mrc_check(_mask(gap=6), CFG, MaskRules(min_space_nm=40.0))
    assert out_ok["clean"]
    out = mrc_check(_mask(gap=2), CFG, MaskRules(min_space_nm=40.0))
    assert not out["clean"]
    assert out["space_violation_px"] > 0


def test_small_island_flags_area():
    m = _mask()
    m[30:32, 50:52] = 1.0  # 2x2 px = 400 nm^2
    out = mrc_check(m, CFG, MaskRules(min_area_nm2=1000.0))
    assert out["area_violation_components"] == 1
    assert out["area_violations"][30:32, 50:52].all()
    assert out["component_count"] == 3


def test_label_components_shapes():
    m = np.zeros((16, 16))
    m[2:5, 2:5] = 1
    m[10:12, 10:14] = 1
    m[0, 15] = 1
    labels, count = label_components(m)
    assert count == 3
    assert labels.max() == 3 and (labels[m == 0] == 0).all()
    # U-shape merges into ONE component (union-find across rows)
    u = np.zeros((16, 16))
    u[4:12, 2:4] = 1
    u[4:12, 8:10] = 1
    u[10:12, 2:10] = 1
    _, count_u = label_components(u)
    assert count_u == 1


def test_mrc_clean_repairs():
    m = _mask()
    m[:, 40:42] = 1.0          # width violation
    m[30:32, 50:52] = 1.0      # area violation
    rules = MaskRules(min_width_nm=40.0, min_space_nm=40.0,
                      min_area_nm2=1000.0)
    repaired = mrc_clean(m, CFG, rules)
    out = mrc_check(repaired, CFG, rules)
    assert out["clean"]
    # the legal lines survive the repair
    assert repaired[:, 9:13].all()


def test_rules_validation():
    with pytest.raises(ValueError):
        MaskRules(min_width_nm=-1.0)
