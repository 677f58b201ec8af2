"""SRAF placement geometry + the optical payoff: off-focus edge slope
improves and the assist bars stay sub-printing.

No reference counterpart (no RET in the reference); oracles are geometric
invariants and the framework's own imaging.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lithographysimulator_tpu import LightSource, OpticsConfig, from_array, simulate
from lithographysimulator_tpu.models.resist import nils_table
from lithographysimulator_tpu.models.sraf import (
    sraf_band,
    sraf_insert,
    sraf_print_check,
)
from lithographysimulator_tpu.ops.focus import focus_stack_aberrations

CFG = OpticsConfig(pixel_number=64)  # 25 nm px, NA 0.7


def _iso_line():
    m = np.zeros((64, 64), np.float32)
    m[8:-8, 29:35] = 1.0  # isolated 150 nm line
    return m


def test_band_geometry():
    m = _iso_line()
    band = sraf_band(m, CFG, distance_nm=175.0, width_nm=25.0)
    assert band.any()
    assert not (band & (m > 0.5)).any()  # never on the feature
    # the band sits exactly 7 px (175 nm) off the feature edges (Chebyshev
    # distance in [d, d + w)): line spans cols 29..34, so cols 22 and 41
    assert band[32, 22] and band[32, 41]
    assert not band[32, 40] and not band[32, 42]
    assert not band[32, 21] and not band[32, 23]


def test_dense_regions_self_exclude():
    m = np.zeros((64, 64), np.float32)
    m[8:-8, 20:23] = 1.0
    m[8:-8, 27:30] = 1.0  # 100 nm gap << 2 x 150 nm: no band between
    band = sraf_band(m, CFG, distance_nm=175.0, width_nm=25.0)
    assert not band[32, 23:27].any()
    # but bands DO form on the outer flanks
    assert band[32, 20 - 7] and band[32, 29 + 7]


def test_insert_preserves_features():
    m = _iso_line()
    ms = sraf_insert(m, CFG, distance_nm=175.0, width_nm=25.0)
    np.testing.assert_array_equal(ms >= m, True)
    np.testing.assert_array_equal(ms[m > 0.5], 1.0)


def test_validation():
    with pytest.raises(ValueError):
        sraf_band(_iso_line(), CFG, distance_nm=0.0, width_nm=25.0)


def test_sraf_improves_offfocus_nils_without_printing():
    """The optical point: at 250 nm defocus the isolated line's edge NILS
    improves with assist bars at 175 nm, and the bars never print (in or
    out of focus)."""
    m = _iso_line()
    ms = sraf_insert(m, CFG, distance_nm=175.0, width_nm=25.0)
    src = np.asarray(LightSource(CFG, sigma_in=0.5, sigma_out=0.8).annular())
    thr = 0.55

    def image(mask, dz):
        ab = np.asarray(focus_stack_aberrations(
            np.zeros(5, np.float32), np.array([dz], np.float32))[0])
        img = np.asarray(simulate(from_array(mask, CFG), src, ab,
                                  normalize=True).image)
        return img / img.max()

    nils = {}
    for name, mask in (("plain", m), ("sraf", ms)):
        img = image(mask, 250.0)
        nils[name] = nils_table(img[28:37], CFG, threshold=thr,
                                normalize=False, row_step=1)["mean_nils"]
    assert nils["sraf"] > 1.05 * nils["plain"]

    for dz in (0.0, 250.0):
        profile = (image(ms, dz) > thr).astype(np.float32)
        check = sraf_print_check(profile, ms, m)
        assert check["sraf_px"] > 0
        assert check["clean"], check
