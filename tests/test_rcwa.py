"""RCWA rigorous-solver tests (the validation contract of ops/rcwa.py):
homogeneous stacks must reproduce the analytic thin-film transfer matrix at
machine precision, lossless gratings conserve energy, large-period absorbers
converge to the Kirchhoff duty-cycle orders, TM converges in order count
(Li's rule), and the imaging bridge / boundary-layer calibration built on
top behaves physically."""

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig
from lithographysimulator_tpu.ops.rcwa import (
    MASK_STACKS,
    GratingLayer,
    kirchhoff_orders,
    rcwa_effective_mask,
    rcwa_orders,
    thin_mask_transmission,
    transfer_matrix_stack,
)

LAM = 193.0


# ---------------------------------------------------------------------------
# Core solver vs analytic oracles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pol", ["te", "tm"])
@pytest.mark.parametrize("theta", [0.0, 23.0])
def test_homogeneous_stack_matches_transfer_matrix(pol, theta):
    """duty=0 layers are homogeneous films: every off-axis order must vanish
    and the specular (r, t) must equal the analytic transfer-matrix stack —
    lossy absorber + dielectric spacer, oblique incidence, glass superstrate."""
    films = [(20.0, 1.965 + 1.201j), (68.0, 0.842 + 1.647j), (35.0, 1.44 + 0j)]
    layers = [GratingLayer(thickness_nm=d, n_ridge=2.0, n_groove=n, duty=0.0)
              for d, n in films]
    res = rcwa_orders(600.0, layers, LAM, pol=pol, n_super=1.5631,
                      n_sub=1.0, theta_deg=theta, n_harmonics=11)
    r_ref, t_ref = transfer_matrix_stack(
        [n for _, n in films], [d for d, _ in films], LAM, pol=pol,
        n_super=1.5631, n_sub=1.0, theta_deg=theta)
    mid = (len(res.orders) - 1) // 2
    assert abs(res.r[mid] - r_ref) < 1e-11
    assert abs(res.t[mid] - t_ref) < 1e-11
    off = np.delete(np.arange(len(res.orders)), mid)
    assert np.abs(res.r[off]).max() < 1e-12
    assert np.abs(res.t[off]).max() < 1e-12


@pytest.mark.parametrize("pol", ["te", "tm"])
def test_lossless_grating_conserves_energy(pol):
    """Real-index grating with several propagating orders: total reflected +
    transmitted efficiency is exactly 1."""
    layers = [GratingLayer(thickness_nm=150.0, n_ridge=2.1, n_groove=1.0,
                           duty=0.45)]
    res = rcwa_orders(800.0, layers, LAM, pol=pol, n_super=1.5,
                      n_sub=1.0, theta_deg=8.0, n_harmonics=41)
    assert abs(res.energy - 1.0) < 1e-10
    # sanity: the large period really does support off-axis orders
    mid = (len(res.orders) - 1) // 2
    assert res.eff_t[mid + 1] > 1e-4 and res.eff_t[mid - 1] > 1e-4


def test_energy_deficit_for_absorber():
    """A chrome grating absorbs: energy strictly < 1 (and > 0)."""
    layers = [GratingLayer(thickness_nm=68.0, n_ridge=0.842 + 1.647j,
                           duty=0.5)]
    res = rcwa_orders(400.0, layers, LAM, pol="te", n_super=1.5631)
    assert 0.0 < res.energy < 0.9


def test_large_period_converges_to_kirchhoff():
    """Scalar-diffraction regime: at period >> lambda the normalized
    transmitted orders of an absorber grating approach the ideal thin-mask
    (Kirchhoff) duty-cycle orders, and the residual shrinks with period."""
    stack = MASK_STACKS["binary_cr"]
    t_thin = thin_mask_transmission(stack, LAM)

    def kirchhoff_err(period_nm: float) -> float:
        layers = [GratingLayer(thickness_nm=d, n_ridge=n, duty=0.5)
                  for d, n in stack.layers]
        res = rcwa_orders(period_nm, layers, LAM, pol="te",
                          n_super=stack.n_blank, n_harmonics=61)
        blank = [GratingLayer(thickness_nm=d, n_ridge=n, duty=0.0)
                 for d, n in stack.layers]
        # normalize to the bare-blank path as rcwa_effective_mask does;
        # blank layers are air (n_groove=1), i.e. the clear opening
        res0 = rcwa_orders(period_nm, blank, LAM, pol="te",
                           n_super=stack.n_blank, n_harmonics=61)
        mid = (len(res.orders) - 1) // 2
        sel = np.arange(mid - 3, mid + 4)
        t = res.t[sel] / res0.t[mid]
        ref = kirchhoff_orders(0.5, res.orders[sel], transmission=t_thin)
        return float(np.abs(t - ref).max())

    # periods chosen off integer multiples of λ (a period of exactly m·λ
    # parks an order on the Rayleigh anomaly, which the solver regularizes
    # but which is physically outside the scalar limit being tested)
    err_near, err_far = kirchhoff_err(10.4 * LAM), kirchhoff_err(41.6 * LAM)
    assert err_far < 0.02
    assert err_far < 0.5 * err_near


def test_tm_li_rule_convergence():
    """Metallic grating in TM — the case Li's inverse rule exists for: the
    efficiency spectrum is already converged at 21 harmonics (vs 61)."""
    layers = [GratingLayer(thickness_nm=68.0, n_ridge=0.842 + 1.647j,
                           duty=0.5)]

    def eff(nh):
        res = rcwa_orders(400.0, layers, LAM, pol="tm", n_super=1.5631,
                          n_harmonics=nh)
        mid = (len(res.orders) - 1) // 2
        return res.eff_t[mid - 2: mid + 3], res.eff_r[mid - 2: mid + 3]

    t21, r21 = eff(21)
    t61, r61 = eff(61)
    assert np.abs(t21 - t61).max() < 1e-3
    assert np.abs(r21 - r61).max() < 1e-3


def test_offset_is_a_pure_phase_shift():
    """Translating the grating by a fraction of the period multiplies order m
    by exp(-2pi i m offset) exactly (both polarizations)."""
    for pol in ("te", "tm"):
        mk = lambda off: [GratingLayer(thickness_nm=68.0,
                                       n_ridge=0.842 + 1.647j,
                                       duty=0.4, offset=off)]
        a = rcwa_orders(500.0, mk(0.0), LAM, pol=pol, n_super=1.5631)
        b = rcwa_orders(500.0, mk(0.22), LAM, pol=pol, n_super=1.5631)
        # sign fixed by the module's order convention (kx_m = kx0 - m λ/Λ
        # plus the final conjugation): +offset translates order m by
        # exp(+2πi m offset) — the same convention rcwa_effective_mask's
        # synthesis assumes, so the two must stay in lockstep.
        phase = np.exp(2j * np.pi * a.orders * 0.22)
        np.testing.assert_allclose(b.t, a.t * phase, atol=1e-10)


def test_normal_incidence_symmetry():
    """A centered grating at normal incidence is mirror-symmetric: order m
    and order -m carry identical amplitudes."""
    layers = [GratingLayer(thickness_nm=72.0, n_ridge=2.343 + 0.586j,
                           duty=0.5)]
    res = rcwa_orders(600.0, layers, LAM, pol="tm", n_super=1.5631)
    np.testing.assert_allclose(res.t, res.t[::-1], atol=1e-12)
    np.testing.assert_allclose(res.r, res.r[::-1], atol=1e-12)


def test_input_validation():
    with pytest.raises(ValueError):
        rcwa_orders(400.0, [], LAM, pol="circular")
    with pytest.raises(ValueError):
        rcwa_orders(400.0, [], LAM, n_harmonics=10)


# ---------------------------------------------------------------------------
# Stack characterization helpers
# ---------------------------------------------------------------------------


def test_thin_mask_transmission_binary_and_psm():
    """Binary chrome is opaque (<1% intensity); the 6% MoSi PSM transmits
    ~6% intensity at ~180 deg relative phase — the values the drawn PSM
    layout should carry."""
    t_cr = thin_mask_transmission("binary_cr", LAM)
    assert abs(t_cr) ** 2 < 0.01
    t_psm = thin_mask_transmission("att_psm_mosi", LAM)
    assert 0.03 < abs(t_psm) ** 2 < 0.09
    phase_deg = np.rad2deg(np.angle(t_psm))
    assert 150.0 < abs(phase_deg) <= 180.0


# ---------------------------------------------------------------------------
# Reflective (EUV) stacks
# ---------------------------------------------------------------------------


def test_euv_multilayer_mirror_reflectivity():
    """The 40x Mo/Si Bragg mirror reflects ~70-75% at the 6 deg chief ray —
    the real-blank number — and RCWA's homogeneous-limit specular amplitude
    matches the analytic transfer matrix at machine precision."""
    stack = MASK_STACKS["euv_ta"]
    r_ref, _ = transfer_matrix_stack(
        [n for _, n in stack.mirror], [d for d, _ in stack.mirror], 13.5,
        pol="te", n_super=1.0, n_sub=stack.n_substrate, theta_deg=6.0)
    assert 0.68 < abs(r_ref) ** 2 < 0.76
    layers = [GratingLayer(thickness_nm=d, n_ridge=2.0, n_groove=n, duty=0.0)
              for d, n in stack.mirror]
    res = rcwa_orders(100.0, layers, 13.5, pol="te", n_super=1.0,
                      n_sub=stack.n_substrate, theta_deg=6.0, n_harmonics=5)
    mid = (len(res.orders) - 1) // 2
    assert abs(res.r[mid] - r_ref) < 1e-11


def test_euv_thin_mask_reflectance():
    """Blanket TaBN over the mirror reflects ~1-3% relative to the bare
    mirror — absorber contrast, the value the drawn EUV layout carries."""
    t = thin_mask_transmission("euv_ta", 13.5, incidence_deg=6.0)
    assert 0.005 < abs(t) ** 2 < 0.04


def test_euv_effective_mask_shadowing_asymmetry():
    """The reflected near field is mirror-symmetric at normal incidence and
    strongly left/right asymmetric at the 6 deg chief ray (absorber
    shadowing) — the physics behind the EUV pattern shift. Clear masks
    normalize to exactly 1 regardless of incidence."""
    cfg = OpticsConfig(pixel_number=64, wavelength=13.5, na=0.33,
                       pixel_size=4.0)
    clear = rcwa_effective_mask(cfg, pitch_px=16, duty=0.0, stack="euv_ta",
                                incidence_deg=6.0)
    np.testing.assert_allclose(clear, np.ones((64, 64)), atol=1e-6)

    def profile(deg):
        f = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16,
                                stack="euv_ta", pol="te", incidence_deg=deg)
        return np.abs(f[0, :16])

    def mirror_asym(row):
        # reflect about the absorber center (x = 0, periodic)
        return float(np.abs(row - np.roll(row[::-1], 1)).max())

    assert mirror_asym(profile(0.0)) < 1e-9
    assert mirror_asym(profile(6.0)) > 0.3


# ---------------------------------------------------------------------------
# Imaging bridge: rcwa_effective_mask
# ---------------------------------------------------------------------------


def test_effective_mask_clear_normalization():
    """duty=0 (no absorber anywhere) must give the unit clear field exactly —
    the thin-mask normalization convention."""
    cfg = OpticsConfig(pixel_number=32)
    field = rcwa_effective_mask(cfg, pitch_px=16, duty=0.0)
    np.testing.assert_allclose(field, np.ones((32, 32)), atol=1e-6)


def test_effective_mask_shape_tiling_and_pol_split():
    cfg = OpticsConfig(pixel_number=64)
    te = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16, pol="te")
    tm = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16, pol="tm")
    assert te.shape == (64, 64) and te.dtype == np.complex64
    # rows identical (lines along rows), pattern tiles at the pitch
    np.testing.assert_allclose(te[0], te[33], atol=0)
    np.testing.assert_allclose(te[0, :16], te[0, 16:32], atol=0)
    # TE/TM really differ (the H-V bias source), but share the DC scale
    assert np.abs(te - tm).max() > 0.01
    assert abs(np.abs(te.mean()) - np.abs(tm.mean())) < 0.2
    # axis=0 transposes the pattern
    t0 = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16, pol="te", axis=0)
    np.testing.assert_allclose(t0, te.T, atol=0)
    with pytest.raises(ValueError):
        rcwa_effective_mask(cfg, pitch_px=17, duty=0.4)


# ---------------------------------------------------------------------------
# First-principles boundary-layer calibration (ops/mask3d bridge)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stack", ["binary_cr", "att_psm_mosi"])
def test_boundary_layer_from_rcwa_certifies_fit(stack):
    """End-to-end M3D calibration with no external EMF tool: the fitted BL
    must explain most of the rigorous-vs-thin image residual (the report's
    fit NRMS well under the thin-mask NRMS), and unpolarized illumination
    must yield an isotropic model (beta_h == beta_v by symmetry). The PSM
    stack exercises the complex drawn-layout path end to end."""
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa

    cfg = OpticsConfig(pixel_number=32)
    bl, rep = boundary_layer_from_rcwa(cfg, stack=stack, pitch_px=16,
                                       illumination_pol="unpolarized",
                                       steps=60)
    assert bl.beta_h == bl.beta_v
    assert abs(bl.beta_v) > 0.1  # a real thick-mask correction, not noise
    assert rep["fit_nrms"]["avg"] < 0.25 * rep["thin_nrms"]["avg"]


@pytest.mark.slow
def test_boundary_layer_from_rcwa_polarized_hv_split():
    """x-polarized illumination sees TM across vertical edges and TE across
    horizontal ones: the calibrated model must carry a genuine H-V split,
    with both polarizations' fits certified against their RCWA targets."""
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa

    cfg = OpticsConfig(pixel_number=32)
    bl, rep = boundary_layer_from_rcwa(cfg, stack="binary_cr", pitch_px=16,
                                       illumination_pol="x", steps=60)
    assert abs(bl.beta_h - bl.beta_v) > 1e-3
    for pol in ("te", "tm"):
        assert rep["fit_nrms"][pol] < 0.3 * rep["thin_nrms"][pol]


def test_cli_m3dcal(capsys):
    """CLI front-end to the first-principles calibration: prints a JSON
    report with the calibrated betas and the certification residuals."""
    import json

    from lithographysimulator_tpu.cli import main

    rc = main(["m3dcal", "--pixel-number", "32", "--pitch", "16",
               "--steps", "40"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert report["stack"] == "binary_cr"
    assert report["beta_h"] == report["beta_v"]  # unpolarized -> isotropic
    # default duty rounds the absorber to an odd pixel count (9 px here)
    assert report["duty"] == pytest.approx(9 / 16)
    assert report["fit_nrms"]["avg"] < 0.3 * report["thin_nrms"]["avg"]


def test_euv_edge_kernel_calibration():
    """EUV end-to-end: at the 6° chief ray the 1-px boundary layer cannot
    explain the rigorous image (shadowed near field spans several pixels),
    but the multi-tap edge kernel closes the residual by >10×, carries a
    genuine rise/fall (shadowing) split on the vertical edges, and — round
    5 — calibrates horizontal edges DIRECTLY against the conical-mount
    rigorous near field (tilt along the lines changes the image by ~8%
    nRMS, which the old mirror-symmetrized-from-vertical taps stripped
    entirely)."""
    from lithographysimulator_tpu.ops.mask3d import (
        EdgeKernelM3D, _symmetrized_taps, boundary_layer_from_rcwa)

    cfg = OpticsConfig(pixel_number=32, wavelength=13.5, na=0.33,
                       pixel_size=4.0)
    ek, rep = boundary_layer_from_rcwa(
        cfg, stack="euv_ta", pitch_px=16, illumination_pol="unpolarized",
        steps=300, incidence_deg=6.0, taps=1)
    assert isinstance(ek, EdgeKernelM3D) and ek.k == 1
    assert rep["fit_nrms"]["avg"] < 0.1 * rep["thin_nrms"]["avg"]
    # shadowing: rising and falling vertical edges differ materially
    diff = max(abs(r - f) for r, f in zip(ek.taps_v_rise,
                                          ek.taps_v_fall[::-1]))
    assert diff > 0.05
    # horizontal edges: the along-lines tilt is a real image effect...
    assert rep["thin_nrms"]["h_avg"] > 0.04
    # ...which the direct conical fit certifies away (>5x)
    assert rep["fit_nrms"]["h_avg"] < 0.2 * rep["thin_nrms"]["h_avg"]
    # the direct taps differ materially from the old approximation
    sym_r, _ = _symmetrized_taps(rep["fits"]["avg"])
    assert max(abs(a - b) for a, b in zip(ek.taps_h_rise, sym_r)) > 0.1
    # tilt exactly along the lines: the near field is mirror-symmetric, so
    # the shipped h taps must be too (the fit's split there is image-null
    # degeneracy, not physics)
    for i in range(3):
        assert ek.taps_h_rise[i] == ek.taps_h_fall[2 - i]


@pytest.mark.slow
def test_euv_azimuth_sweep_through_slit():
    """Across-slit chief-ray rotation (m3dcal --azimuth): sweeping the tilt
    direction from +x (0°) toward +y moves the shadowing asymmetry from
    vertical edges onto horizontal ones — at 0° the V edges carry it all
    (H taps exactly mirror-symmetric, tilt purely along the H lines); at
    60° the across-H component dominates and the V asymmetry shrinks by
    the cos(azimuth) projection. Every fit stays certified against its own
    conical rigorous target."""
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa

    cfg = OpticsConfig(pixel_number=32, wavelength=13.5, na=0.33,
                       pixel_size=4.0)

    def asym(r, f):
        return max(abs(a - b) for a, b in zip(r, f[::-1]))

    results = {}
    for az in (0.0, 60.0):
        ek, rep = boundary_layer_from_rcwa(
            cfg, stack="euv_ta", pitch_px=16,
            illumination_pol="unpolarized", steps=200, incidence_deg=6.0,
            taps=1, azimuth_deg=az)
        assert rep["azimuth_deg"] == az
        for k in rep["fit_nrms"]:
            assert rep["fit_nrms"][k] < 0.35 * rep["thin_nrms"][k]
        results[az] = ek
    ek0, ek60 = results[0.0], results[60.0]
    assert asym(ek0.taps_h_rise, ek0.taps_h_fall) == 0.0
    assert asym(ek0.taps_v_rise, ek0.taps_v_fall) > 0.3
    assert asym(ek60.taps_h_rise, ek60.taps_h_fall) > 0.2
    assert (asym(ek60.taps_v_rise, ek60.taps_v_fall)
            < 0.8 * asym(ek0.taps_v_rise, ek0.taps_v_fall))


def test_effective_mask_azimuth_zero_matches_planar():
    """azimuth_deg=0 routes through the planar solver; an infinitesimal
    azimuth through the conical one. The bridge synthesizes the same field
    components (Ey for TE, Hy for TM), so the two must agree for BOTH
    polarizations — the continuity that makes --azimuth a smooth knob."""
    cfg = OpticsConfig(pixel_number=64)
    for pol in ("te", "tm"):
        planar = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16, pol=pol,
                                     incidence_deg=5.0)
        conical = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16, pol=pol,
                                      incidence_deg=5.0, azimuth_deg=1e-6)
        np.testing.assert_allclose(conical, planar, atol=1e-5)


def test_effective_mask_tracks_kirchhoff_dc():
    """The rigorous field's mean transmission is within ~10% (absolute) of
    the ideal duty-cycle average — edge perturbations are a correction, not
    a rescale."""
    cfg = OpticsConfig(pixel_number=64)
    duty = 7 / 16
    field = rcwa_effective_mask(cfg, pitch_px=16, duty=duty, pol="te")
    ideal = (1 - duty) * 1.0 + duty * thin_mask_transmission("binary_cr")
    assert abs(field.mean() - ideal) < 0.1


def test_stack_wavelength_guard():
    """Named stacks carry wavelength-specific optical constants: running
    them at the wrong config wavelength must fail loudly (an EUV TaBN
    reticle "solved" at 193 nm is confidently wrong, not approximate)."""
    from lithographysimulator_tpu.ops.rcwa import resolve_stack

    with pytest.raises(ValueError, match="13.5"):
        resolve_stack("euv_ta", 193.0)
    with pytest.raises(ValueError, match="193"):
        resolve_stack("binary_cr", 13.5)
    with pytest.raises(ValueError, match="available"):
        resolve_stack("no_such_stack", 193.0)
    # in-tolerance and unguarded (custom) stacks pass
    assert resolve_stack("euv_ta", 13.5) is MASK_STACKS["euv_ta"]
    assert resolve_stack("binary_cr", 193.4).design_wavelength_nm == 193.0
    custom = MASK_STACKS["binary_cr"].__class__(
        layers=((60.0, 1.2 + 0.5j),))  # no design wavelength -> no check
    assert resolve_stack(custom, 157.0) is custom

    # the guard fires on the imaging bridge too (config carries lambda)
    cfg = OpticsConfig(pixel_number=32)  # 193 nm default
    with pytest.raises(ValueError, match="wavelength"):
        rcwa_effective_mask(cfg, pitch_px=16, duty=0.5, stack="euv_ta")


def test_cli_m3dcal_wavelength_guard(capsys):
    """The CLI surfaces the stack/wavelength mismatch as a clean exit with
    the fix in the message, not a traceback."""
    from lithographysimulator_tpu.cli import main

    with pytest.raises(SystemExit, match="13.5"):
        main(["m3dcal", "--pixel-number", "32", "--pitch", "16",
              "--stack", "euv_ta", "--steps", "5"])


def test_shadow_shift_direction_pinned():
    """Pin the ABSOLUTE direction of the EUV shadowing pattern shift against
    the tilt sign (the mask->wafer image-inversion convention documented in
    :func:`rcwa_effective_mask`): order m is synthesized as exp(+2pi i m x /
    pitch) while Moharam order m propagates as exp(-2pi i m x / pitch) — the
    flip is the scanner inversion, layouts being drawn in WAFER coordinates.
    Consequence: ``incidence_deg > 0`` (transverse momentum along +x at the
    mask) shifts the printed pattern along +x at the wafer, and flipping the
    tilt mirrors the shift exactly."""
    cfg = OpticsConfig(pixel_number=64, wavelength=13.5, na=0.33,
                       pixel_size=4.0)

    def bright_centroid_px(deg):
        f = rcwa_effective_mask(cfg, pitch_px=16, duty=7 / 16,
                                stack="euv_ta", pol="te", incidence_deg=deg)
        row = np.abs(f[0, :16]) ** 2
        h1 = (row * np.exp(-2j * np.pi * np.arange(16) / 16)).sum()
        return np.angle(h1) / (2 * np.pi) * 16  # in (-8, 8]

    # Absorber centered at x=0 -> bright region centered at x = ±8 (the
    # same periodic point; the phase wraps there).
    assert abs(abs(bright_centroid_px(0.0)) - 8.0) < 1e-9

    def shift_px(deg):
        # minimal displacement of the bright centroid from ±8, mod 16
        return (bright_centroid_px(deg) - 8.0 + 8.0) % 16.0 - 8.0

    plus, minus = shift_px(6.0), shift_px(-6.0)
    assert plus > 0.5             # pattern moved along +x at the wafer
    assert minus < -0.5           # mirrored for the mirrored tilt
    np.testing.assert_allclose(plus, -minus, atol=1e-6)
