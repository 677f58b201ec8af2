"""2-D (crossed-grating) RCWA: the validation contract of
``ops.rcwa2d.rcwa2d_orders`` (VERDICT round-4 item 3's rigorous oracle).

The solver exists to bound the 1-D-calibrated edge-kernel M3D model's
residual at corners/line-ends (tests/test_mask3d_2d.py); here it is pinned
against every limit with an independent answer: the 1-D conical solver
(y-uniform patterns, machine precision — this also certifies Li's mixed
factorization reduces to the 1-D rules), the analytic transfer matrix
(homogeneous stacks), energy conservation (lossless crossed gratings),
and the x↔y mirror symmetry (improper rotation: swapped pattern + swapped
azimuth + s→s polarization maps order (mx,my) → (my,mx) exactly).

Reference parity anchor: the thin-mask spectrum this corrects is
``/root/reference/mask.py:42-59``.
"""

import numpy as np
import pytest

from lithographysimulator_tpu.ops.rcwa import (
    MASK_STACKS,
    GratingLayer,
    rcwa_orders_conical,
    transfer_matrix_stack,
)
from lithographysimulator_tpu.ops.rcwa2d import PatternedLayer, rcwa2d_orders


def test_y_uniform_reduces_to_conical_solver():
    """A pattern uniform along y must reproduce the 1-D conical solver on
    the my=0 row to machine precision (amplitudes AND efficiencies), with
    exactly zero energy scattered into my ≠ 0."""
    lay2d = [PatternedLayer(80.0, n_fill=1.0, n_box=0.9 + 1.7j,
                            boxes=((0.2, 0.0, 0.65, 1.0),))]
    lay1d = [GratingLayer(80.0, 0.9 + 1.7j, duty=0.45, offset=0.425)]
    r1 = rcwa_orders_conical(600.0, lay1d, 193.0, n_super=1.5,
                             theta_deg=17.0, phi_deg=35.0, psi_deg=55.0,
                             n_harmonics=11)
    r2 = rcwa2d_orders(600.0, 500.0, lay2d, 193.0, n_super=1.5,
                       theta_deg=17.0, phi_deg=35.0, psi_deg=55.0,
                       mx_max=5, my_max=3)
    sel = r2.my == 0
    np.testing.assert_allclose(r2.ty[sel], r1.ty, atol=1e-12)
    np.testing.assert_allclose(r2.tx[sel], r1.tx, atol=1e-12)
    np.testing.assert_allclose(r2.ry[sel], r1.ry, atol=1e-12)
    np.testing.assert_allclose(r2.eff_t[sel], r1.eff_t, atol=1e-12)
    np.testing.assert_allclose(r2.eff_r[sel], r1.eff_r, atol=1e-12)
    assert r2.eff_t[~sel].sum() + r2.eff_r[~sel].sum() < 1e-20


def test_homogeneous_matches_transfer_matrix():
    n_list = [1.4 + 0.2j, 2.0 + 0.0j]
    d_list = [55.0, 30.0]
    hom = [PatternedLayer(d, n_fill=n) for n, d in zip(n_list, d_list)]
    r_s, t_s = transfer_matrix_stack(n_list, d_list, 193.0, pol="te",
                                     n_super=1.5, n_sub=1.2, theta_deg=33.0)
    res = rcwa2d_orders(600.0, 500.0, hom, 193.0, n_super=1.5, n_sub=1.2,
                        theta_deg=33.0, phi_deg=40.0, psi_deg=90.0,
                        mx_max=2, my_max=2)
    mid = (len(res.ty) - 1) // 2
    sphi, cphi = np.sin(np.deg2rad(40.0)), np.cos(np.deg2rad(40.0))
    np.testing.assert_allclose(res.rx[mid], -sphi * r_s, atol=1e-10)
    np.testing.assert_allclose(res.ry[mid], cphi * r_s, atol=1e-10)
    np.testing.assert_allclose(res.tx[mid], -sphi * t_s, atol=1e-10)
    np.testing.assert_allclose(res.ty[mid], cphi * t_s, atol=1e-10)


def test_lossless_crossed_grating_conserves_energy():
    cross = [PatternedLayer(100.0, n_fill=1.0, n_box=2.1,
                            boxes=((0.1, 0.1, 0.6, 0.55),))]
    res = rcwa2d_orders(500.0, 450.0, cross, 193.0, n_super=1.5,
                        theta_deg=14.0, phi_deg=25.0, psi_deg=40.0,
                        mx_max=4, my_max=4)
    assert abs(res.energy - 1.0) < 1e-10


def test_xy_mirror_symmetry():
    """Reflecting the whole problem through the x=y plane (swap the box
    axes, swap the azimuth to 90°−φ, s stays s) must map order (mx, my) to
    (my, mx): efficiencies equal, co-pol amplitudes equal up to the global
    reflection sign."""
    boxA = [PatternedLayer(70.0, n_fill=1.0, n_box=0.9 + 1.7j,
                           boxes=((0.1, 0.3, 0.5, 0.8),))]
    boxB = [PatternedLayer(70.0, n_fill=1.0, n_box=0.9 + 1.7j,
                           boxes=((0.3, 0.1, 0.8, 0.5),))]
    ra = rcwa2d_orders(480.0, 480.0, boxA, 193.0, theta_deg=10.0,
                       phi_deg=20.0, psi_deg=90.0, mx_max=3, my_max=3)
    rb = rcwa2d_orders(480.0, 480.0, boxB, 193.0, theta_deg=10.0,
                       phi_deg=70.0, psi_deg=90.0, mx_max=3, my_max=3)
    effa, effb = ra.eff_t.reshape(7, 7), rb.eff_t.reshape(7, 7)
    np.testing.assert_allclose(effa, effb.T, atol=1e-12)
    tya, txb = ra.ty.reshape(7, 7), rb.tx.reshape(7, 7)
    err = min(np.abs(tya - txb.T).max(), np.abs(tya + txb.T).max())
    assert err < 1e-12


def test_euv_mirror_fast_path():
    """The 81-layer EUV reticle (patterned absorber over 40 homogeneous
    Mo/Si bilayers) runs through the homogeneous-layer shortcut: the bare
    blank must reflect ~73% into the specular order at the 6° chief ray
    (matching the 1-D solver's pinned mirror reflectivity), and a
    line-end absorber box must knock the total reflectance well below it
    while conserving energy minus absorption."""
    st = MASK_STACKS["euv_ta"]
    mirror = [PatternedLayer(th, n_fill=nm) for th, nm in st.mirror]
    blank = rcwa2d_orders(256.0, 256.0, mirror, 13.5, n_super=1.0,
                          n_sub=st.n_substrate, theta_deg=6.0,
                          psi_deg=90.0, mx_max=2, my_max=2)
    mid = (len(blank.ry) - 1) // 2
    assert 0.65 < blank.eff_r[mid] < 0.80
    absorber = [PatternedLayer(60.0, n_fill=1.0, n_box=0.9260 + 0.0440j,
                               boxes=((0.25, 0.1, 0.75, 0.7),))]
    patt = rcwa2d_orders(256.0, 256.0, absorber + mirror, 13.5, n_super=1.0,
                         n_sub=st.n_substrate, theta_deg=6.0,
                         psi_deg=90.0, mx_max=3, my_max=3)
    assert patt.eff_r.sum() < 0.7 * blank.eff_r.sum()
    assert patt.energy < 1.0 + 1e-9


def test_patterned_layer_validation():
    with pytest.raises(ValueError):
        PatternedLayer(60.0, boxes=((0.5, 0.0, 0.4, 1.0),))
    with pytest.raises(ValueError):
        PatternedLayer(60.0, boxes=((0.0, -0.1, 0.5, 1.0),))
