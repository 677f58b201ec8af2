"""Conical-mount RCWA: the validation contract of
``ops.rcwa.rcwa_orders_conical`` (VERDICT round-4 item 2).

Pins the solver against (a) the planar solver at azimuth 0 (exact block
reduction), (b) the analytic transfer matrix for homogeneous stacks at
arbitrary conical incidence — s-pol amplitudes directly, p-pol through the
derived tangential-field scales, (c) energy conservation for lossless
gratings at arbitrary (θ, φ, ψ), and (d) the m ↔ −m order symmetry of a
centered grating illuminated along its lines (azimuth 90°) — the EUV
chief-ray geometry seen by HORIZONTAL edges, where nothing shadows across
the lines but the obliquely-traversed absorber still changes the near
field (the effect the mirror-symmetrized H-edge approximation dropped).

Reference parity anchor: the thin-mask spectrum this corrects is
``/root/reference/mask.py:37-90``.
"""

import numpy as np
import pytest

from lithographysimulator_tpu.ops.rcwa import (
    GratingLayer,
    rcwa_orders,
    rcwa_orders_conical,
    transfer_matrix_stack,
)

ABSORBER = [GratingLayer(80.0, 0.9 + 1.7j, duty=0.45)]


@pytest.mark.parametrize("theta", [0.0, 20.0])
def test_azimuth_zero_matches_planar(theta):
    """phi=0 must reduce to the planar TE/TM blocks exactly: efficiencies
    for both polarizations, and the TE tangential amplitudes (the planar
    solver's own amplitude convention) to machine precision."""
    pl_te = rcwa_orders(600.0, ABSORBER, 193.0, pol="te", n_super=1.5,
                        theta_deg=theta)
    pl_tm = rcwa_orders(600.0, ABSORBER, 193.0, pol="tm", n_super=1.5,
                        theta_deg=theta)
    co_s = rcwa_orders_conical(600.0, ABSORBER, 193.0, n_super=1.5,
                               theta_deg=theta, phi_deg=0.0, psi_deg=90.0)
    co_p = rcwa_orders_conical(600.0, ABSORBER, 193.0, n_super=1.5,
                               theta_deg=theta, phi_deg=0.0, psi_deg=0.0)
    np.testing.assert_allclose(co_s.eff_r, pl_te.eff_r, atol=1e-12)
    np.testing.assert_allclose(co_s.eff_t, pl_te.eff_t, atol=1e-12)
    np.testing.assert_allclose(co_s.ry, pl_te.r, atol=1e-12)
    np.testing.assert_allclose(co_s.ty, pl_te.t, atol=1e-12)
    # pure s in / pure s out at phi=0: no cross-polarization
    assert np.abs(co_s.rx).max() < 1e-12
    assert np.abs(co_s.tx).max() < 1e-12
    np.testing.assert_allclose(co_p.eff_r, pl_tm.eff_r, atol=1e-12)
    np.testing.assert_allclose(co_p.eff_t, pl_tm.eff_t, atol=1e-12)
    assert np.abs(co_p.ry).max() < 1e-12
    assert np.abs(co_p.ty).max() < 1e-12


def test_homogeneous_conical_matches_transfer_matrix():
    """Homogeneous layers at (θ=33°, φ=40°): the physics is planar in the
    rotated frame, so the conical solve must reproduce the analytic s/p
    transfer-matrix amplitudes. s-pol: tangential E_r = r_s·(−sinφ, cosφ).
    p-pol (unit |E| incident, H_inc = n_I·ŝ): tangential E_r =
    −r_p·cosθ·(cosφ, sinφ) and E_t = t_p·(n_I·k_zII/ε_II)·(cosφ, sinφ)."""
    n_list = [1.4 + 0.2j, 2.0 + 0.0j]
    d_list = [55.0, 30.0]
    hom = [GratingLayer(d, n, n_groove=n, duty=0.0)
           for n, d in zip(n_list, d_list)]
    theta, phi = 33.0, 40.0
    nI, nII = 1.5, 1.2
    r_s, t_s = transfer_matrix_stack(n_list, d_list, 193.0, pol="te",
                                     n_super=nI, n_sub=nII, theta_deg=theta)
    r_p, t_p = transfer_matrix_stack(n_list, d_list, 193.0, pol="tm",
                                     n_super=nI, n_sub=nII, theta_deg=theta)
    co_s = rcwa_orders_conical(600.0, hom, 193.0, n_super=nI, n_sub=nII,
                               theta_deg=theta, phi_deg=phi, psi_deg=90.0,
                               n_harmonics=5)
    co_p = rcwa_orders_conical(600.0, hom, 193.0, n_super=nI, n_sub=nII,
                               theta_deg=theta, phi_deg=phi, psi_deg=0.0,
                               n_harmonics=5)
    mid = 2
    sphi, cphi = np.sin(np.deg2rad(phi)), np.cos(np.deg2rad(phi))
    ct = np.cos(np.deg2rad(theta))
    np.testing.assert_allclose(co_s.rx[mid], -sphi * r_s, atol=1e-10)
    np.testing.assert_allclose(co_s.ry[mid], cphi * r_s, atol=1e-10)
    np.testing.assert_allclose(co_s.tx[mid], -sphi * t_s, atol=1e-10)
    np.testing.assert_allclose(co_s.ty[mid], cphi * t_s, atol=1e-10)
    p_r = -r_p * ct
    np.testing.assert_allclose(co_p.rx[mid], cphi * p_r, atol=1e-10)
    np.testing.assert_allclose(co_p.ry[mid], sphi * p_r, atol=1e-10)
    st_t = nI * np.sin(np.deg2rad(theta)) / nII  # Snell into the substrate
    kz_II = nII * np.sqrt(1.0 - st_t ** 2)
    p_t = t_p * nI * kz_II / nII ** 2
    np.testing.assert_allclose(co_p.tx[mid], cphi * p_t, atol=1e-10)
    np.testing.assert_allclose(co_p.ty[mid], sphi * p_t, atol=1e-10)


@pytest.mark.parametrize("psi", [90.0, 0.0, 37.0])
def test_lossless_conical_conserves_energy(psi):
    layers = [GratingLayer(120.0, 2.1 + 0.0j, duty=0.5)]
    res = rcwa_orders_conical(700.0, layers, 193.0, n_super=1.5, n_sub=1.0,
                              theta_deg=25.0, phi_deg=55.0, psi_deg=psi,
                              n_harmonics=41)
    assert abs(res.energy - 1.0) < 1e-10


def test_tilt_along_lines_is_order_symmetric():
    """At azimuth 90° a centered grating keeps m ↔ −m symmetry (co-pol
    amplitudes even, efficiencies even; the small cross-pol component is
    odd under the mirror) — the tilt is along the lines, so there is no
    shadowing-induced pattern shift across them."""
    lay = [GratingLayer(60.0, 0.926 + 0.044j, duty=0.5)]
    res = rcwa_orders_conical(540.0, lay, 13.5, theta_deg=6.0, phi_deg=90.0,
                              psi_deg=0.0, n_harmonics=21)
    np.testing.assert_allclose(res.ry, res.ry[::-1], atol=1e-12)
    np.testing.assert_allclose(res.ty, res.ty[::-1], atol=1e-12)
    np.testing.assert_allclose(res.eff_t, res.eff_t[::-1], atol=1e-12)
    np.testing.assert_allclose(res.rx, -res.rx[::-1], atol=1e-12)


def test_tilt_along_lines_changes_the_near_field():
    """The physics the H-edge calibration must capture: a 6° tilt ALONG the
    lines (EUV chief ray over horizontal edges) changes the transmitted
    near field by several percent relative to normal incidence, even though
    the order symmetry is preserved."""
    lay = [GratingLayer(60.0, 0.926 + 0.044j, duty=0.5)]
    tilt = rcwa_orders_conical(540.0, lay, 13.5, theta_deg=6.0, phi_deg=90.0,
                               psi_deg=0.0, n_harmonics=21)
    norm = rcwa_orders_conical(540.0, lay, 13.5, theta_deg=0.0, phi_deg=90.0,
                               psi_deg=0.0, n_harmonics=21)
    delta = np.abs(tilt.ty - norm.ty).max()
    assert delta > 0.01  # far above the fit floor: must be calibrated, and
    assert delta < 0.5   # still a perturbation, not a regime change


def test_conical_input_validation():
    with pytest.raises(ValueError):
        rcwa_orders_conical(600.0, ABSORBER, 193.0, n_harmonics=4)
