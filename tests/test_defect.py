"""Mask-defect printability disposition: planted defects must be found at
their planted locations with physically sensible severities, and benign
(sub-resolution, far-from-feature) defects must NOT flag.

No reference counterpart; oracles are constructed defects with known
positions and the framework's own nominal print.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig, ResistModel
from lithographysimulator_tpu.metrology import defect_printability

CFG = OpticsConfig(pixel_number=48)  # 25 nm px
BIG_N = 96


def _lines(n=BIG_N, w=4, pitch=16):
    m = np.zeros((n, n), np.float32)
    for x in range(8, n - 8, pitch):
        m[8:-8, x:x + w] = 1.0
    return m


@pytest.fixture(scope="module")
def source():
    return np.asarray(LightSource(CFG, sigma_out=0.5).classical())


KW = dict(resist=ResistModel(threshold=0.4), rank=16, halo=8)


def test_intrusion_defect_prints_and_localizes(source):
    """A 3-px notch bitten out of one line thins that feature: the CD
    delta must exceed spec, and the worst-CD location must land on the
    damaged feature (row and column within a pixel or two)."""
    m = _lines()
    bad = m.copy()
    bad[46:50, 40:42] = 0.0  # notch in the line at x=40..44
    out = defect_printability(m, bad, CFG, source, **KW)
    assert out["prints"]
    assert out["max_abs_cd_delta_nm"] > out["cd_spec_nm"]
    pf = out["per_focus"][0]
    y_nm, x_nm = pf["cd_delta_location_nm"]
    assert abs(y_nm - 48 * 25.0) < 4 * 25.0
    assert abs(x_nm - 42 * 25.0) < 4 * 25.0
    # aerial disturbance peaks near the notch too
    dy, dx = pf["delta_location_nm"]
    assert abs(dy - 48 * 25.0) < 5 * 25.0 and abs(dx - 41 * 25.0) < 5 * 25.0


def test_subresolution_speck_does_not_print(source):
    """A single-pixel transmissive speck in open area far from features is
    below the imaging resolution: no CD change beyond spec, no new
    features -> disposition 'does not print'."""
    m = _lines()
    bad = m.copy()
    bad[70, 14] = 1.0  # 25 nm speck in a 300 nm space
    out = defect_printability(m, bad, CFG, source, **KW)
    assert not out["prints"]
    assert out["new_features"] == 0 and out["missing_features"] == 0


def test_bridge_defect_reports_feature_change(source):
    """A full bridge between two lines merges features on the bridged cut
    lines — reported via missing/new feature counts (two target features
    match one printed blob) or a large CD delta."""
    m = _lines()
    bad = m.copy()
    bad[44:52, 24:44] = 1.0  # solid bridge between adjacent lines
    out = defect_printability(m, bad, CFG, source, **KW)
    assert out["prints"]
    assert (out["missing_features"] > 0 or out["new_features"] > 0
            or out["max_abs_cd_delta_nm"] > 3 * out["cd_spec_nm"])


def test_through_focus_worst_case(source):
    """The verdict is worst-case over the focus list; per-plane records
    come back for each plane."""
    m = _lines()
    bad = m.copy()
    bad[46:50, 40:42] = 0.0
    out = defect_printability(m, bad, CFG, source,
                              defocus_nm=(-80.0, 0.0, 80.0), **KW)
    assert len(out["per_focus"]) == 3
    assert out["max_abs_cd_delta_nm"] == pytest.approx(
        max(p["max_abs_cd_delta_nm"] for p in out["per_focus"]))


def test_shape_mismatch_raises(source):
    with pytest.raises(ValueError, match="shapes differ"):
        defect_printability(_lines(), _lines(64), CFG, source, **KW)
