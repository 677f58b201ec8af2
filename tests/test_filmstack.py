"""Rigorous image-in-resist (wafer film stack) tests.

The film-stack module replaces DepthResist's separable I(x,y)*D(z) latent
image with exact per-angle, per-polarization thin-film interference inside
the resist. Its reflection physics is pinned at machine precision against
the independent analytic transfer-matrix oracle already used to certify the
RCWA solver (ops/rcwa.transfer_matrix_stack), and its imaging limit against
the plain scalar/vector Abbe paths. (The reference has no resist or wafer
film model — reference README.md:19.)
"""

import numpy as np
import pytest

import lithographysimulator_tpu as lt
from lithographysimulator_tpu.config import OpticsConfig
from lithographysimulator_tpu.models.resist import DepthResist, MackResist
from lithographysimulator_tpu.ops.filmstack import (
    MATERIALS_193, WaferStack, film_coefficients, film_depth_factors,
    film_component_multipliers, open_frame_profile, substrate_reflectance,
    underlayer_sweep)
from lithographysimulator_tpu.ops.rcwa import transfer_matrix_stack
from lithographysimulator_tpu.ops.vector import _vector_basis

SI = MATERIALS_193["si"]
BARC = MATERIALS_193["barc"]

STACK = WaferStack(n_resist=1.71 + 0.02j, thickness_nm=150.0,
                   under_layers=((37.0, BARC),), n_substrate=SI)


def test_reflection_matches_transfer_matrix_oracle():
    """Total stack reflection == the independent analytic transfer matrix
    (same tangential conventions as the RCWA certification oracle)."""
    for pol in ("te", "tm"):
        for theta in (0.0, 17.0, 35.0, 55.0):
            kx = np.sin(np.deg2rad(theta))
            _, _, _, r_tot = film_coefficients(
                STACK, np.asarray(kx), 193.0, pol=pol, n_top=1.0)
            r_oracle, _ = transfer_matrix_stack(
                [STACK.n_resist, BARC], [150.0, 37.0], 193.0, pol=pol,
                n_super=1.0, n_sub=SI, theta_deg=theta)
            assert abs(complex(r_tot) - r_oracle) < 1e-12


def test_flux_conservation_lossless():
    """Net downward Poynting flux inside a lossless resist equals the
    transmitted fraction at the top interface: q_r(|A|^2 - |B|^2) =
    q_top(1 - |r|^2)."""
    loss = WaferStack(n_resist=1.6, thickness_nm=120.0, n_substrate=1.5)
    for pol in ("te", "tm"):
        for kx in (0.0, 0.35, 0.8):
            a, b, kz_r, r = film_coefficients(
                loss, np.asarray(kx), 193.0, pol=pol, n_top=1.0)
            q_r = kz_r if pol == "te" else kz_r / 1.6**2
            kz_top = np.sqrt(1.0 - kx**2)
            q_top = kz_top if pol == "te" else kz_top
            flux_in = float((q_r * (abs(a) ** 2 - abs(b) ** 2)).real)
            flux_top = float(q_top * (1.0 - abs(r) ** 2))
            assert abs(flux_in - flux_top) < 1e-12


def test_no_film_limit_reduces_to_vector_factors():
    """Trivial stack (resist = top medium = substrate) at z = 0 gives the
    Jones-pupil factors exactly: F_te = 1, F_tm_in = cos(theta),
    F_tm_z = -sin(theta)."""
    cfg = OpticsConfig(pixel_number=32, na=0.85)
    triv = WaferStack(n_resist=1.0, thickness_nm=50.0, n_substrate=1.0)
    f_te, f_in, f_z = film_depth_factors(triv, cfg, 0.0)
    _, _, _, _, gamma, sin_t, inside = _vector_basis(cfg)
    assert np.abs((f_te - 1.0) * inside).max() < 1e-12
    assert np.abs((f_in - gamma) * inside).max() < 1e-12
    assert np.abs((f_z + sin_t) * inside).max() < 1e-12


def test_te_tm_coincide_at_normal_incidence():
    """At the pupil center (normal incidence) TE and in-plane TM factors
    must be identical at every depth (polarization is undefined there)."""
    cfg = OpticsConfig(pixel_number=32, na=0.85)
    i = cfg.pixel_number // 2  # rho = 0 on the [-2, 2) sigma grid
    for z in (0.0, 40.0, 111.0, 150.0):
        f_te, f_in, f_z = film_depth_factors(STACK, cfg, z)
        assert abs(f_te[i, i] - f_in[i, i]) < 1e-12
        assert abs(f_z[i, i]) < 1e-15


def test_matched_substrate_is_pure_beer_lambert():
    """Resist index-matched to the substrate has no reflected wave: the
    open-frame profile is exactly exp(-absorbance * z)."""
    n_r = 1.71 + 0.02j
    stack = WaferStack(n_resist=n_r, thickness_nm=200.0, n_substrate=n_r)
    cfg = OpticsConfig(pixel_number=16)
    z = np.linspace(0.0, 200.0, 41)
    prof = open_frame_profile(stack, cfg, z)
    alpha = 4.0 * np.pi * n_r.imag / 193.0  # intensity absorbance, 1/nm
    assert np.abs(prof - np.exp(-alpha * z)).max() < 1e-12


def test_standing_wave_period():
    """Over bare silicon the open-frame profile oscillates with depth at
    the classic period lambda / (2 n_resist)."""
    stack = WaferStack(n_resist=1.71 + 0.005j, thickness_nm=400.0,
                       n_substrate=SI)
    cfg = OpticsConfig(pixel_number=16)
    z = np.linspace(0.0, 400.0, 4001)
    prof = open_frame_profile(stack, cfg, z)
    # peak spacing of the interference term
    interior = (z > 20) & (z < 380)
    d2 = np.diff(np.sign(np.diff(prof)))
    peaks = z[1:-1][(d2 < 0) & interior[1:-1]]
    spacing = np.diff(peaks).mean()
    expected = 193.0 / (2.0 * 1.71)
    assert abs(spacing - expected) < 0.3


def test_mack_depth_profile_agrees_at_weak_reflection():
    """DepthResist.depth_profile (Mack's analytic D(z)) is the weak-top-
    reflection limit of the rigorous profile: on a matched-loss low-contrast
    substrate the two agree to a few percent."""
    n_r = 1.70 + 0.01j
    # substrate LESS dense than the resist: the reflection coefficient is
    # positive-real, matching the + sign Mack's D(z) puts on the
    # interference term (a denser substrate flips the phase — a reflection
    # subtlety the analytic model has no knob for)
    n_sub = 1.45  # |r_bot|^2 ~ 0.6%
    stack = WaferStack(n_resist=n_r, thickness_nm=150.0, n_substrate=n_sub)
    cfg = OpticsConfig(pixel_number=16)
    r_bot = abs((n_r - n_sub) / (n_r + n_sub)) ** 2
    dr = DepthResist(
        mack=MackResist(thickness_nm=150.0), nz=30,
        absorbance_per_um=4.0 * np.pi * n_r.imag / 193.0 * 1e3,
        substrate_reflectivity=r_bot, n_resist=n_r.real, wavelength_nm=193.0)
    rig = open_frame_profile(stack, cfg, dr.depths_nm)
    approx = dr.depth_profile()
    assert np.abs(rig - approx).max() < 0.05


def test_tm_component_standing_waves_are_out_of_phase():
    """The upward TM branch flips its in-plane E component but not its z
    component, so their standing waves are node-swapped — the signature
    effect the separable D(z) model cannot represent."""
    stack = WaferStack(n_resist=1.7, thickness_nm=300.0, n_substrate=SI)
    cfg = OpticsConfig(pixel_number=32, na=0.9)
    z = np.linspace(0.0, 300.0, 121)
    # pick an oblique pupil sample: strongest TM splitting near the rim
    iy, ix = cfg.pixel_number // 2, cfg.pixel_number // 2 + 6  # rho = 0.75
    f_in = np.array([film_depth_factors(stack, cfg, d)[1][iy, ix] for d in z])
    f_z = np.array([film_depth_factors(stack, cfg, d)[2][iy, ix] for d in z])
    a = np.abs(f_in) ** 2
    b = np.abs(f_z) ** 2
    corr = np.corrcoef(a - a.mean(), b - b.mean())[0, 1]
    assert corr < -0.9


def test_substrate_reflectance_and_barc_sweep():
    """The BARC suppresses the resist-bottom reflectance by >10x vs bare
    silicon, and the thickness sweep has an interior minimum."""
    cfg = OpticsConfig(pixel_number=16)
    bare = WaferStack(n_resist=1.71 + 0.02j, thickness_nm=150.0,
                      n_substrate=SI)
    r_bare = substrate_reflectance(bare, cfg)
    r_barc = substrate_reflectance(STACK, cfg)
    assert r_bare > 0.4
    assert r_barc < r_bare / 10.0
    # absorbing BARC: reflectance decays toward the bare resist/BARC
    # interface value with thickness (no sharp quarter-wave dip); some
    # practical thickness must reach < 0.5% reflectance
    thicknesses = np.linspace(10.0, 120.0, 45)
    sweep = underlayer_sweep(STACK, cfg, thicknesses)
    assert sweep.min() < 0.005
    assert sweep[0] > 10.0 * sweep.min()  # thickness tuning matters


def test_trivial_stack_scalar_image_identity():
    """film_stack_images with the trivial stack at z = 0 IS the plain
    scalar aerial image (the multiplier is exactly 1 on the pupil)."""
    cfg = OpticsConfig(pixel_number=32, na=0.85)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.6).classical())
    triv = WaferStack(n_resist=1.0, thickness_nm=50.0, n_substrate=1.0)
    film = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=triv, depths_nm=[0.0],
        normalize=True))[0]
    plain = np.asarray(lt.simulate(mask, src, normalize=True).image)
    assert np.sqrt(np.mean((film - plain) ** 2)) <= 1e-7 * plain.max()


def test_trivial_stack_vector_image_identity():
    cfg = OpticsConfig(pixel_number=32, na=0.85)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.6).classical())
    triv = WaferStack(n_resist=1.0, thickness_nm=50.0, n_substrate=1.0)
    film = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=triv, depths_nm=[0.0],
        polarization="unpolarized", normalize=True))[0]
    plain = np.asarray(lt.simulate(mask, src, normalize=True,
                                   polarization="unpolarized").image)
    nrms = np.sqrt(np.mean((film - plain) ** 2)) / plain.max()
    assert nrms < 1e-6


def test_vector_and_scalar_film_images_agree_at_small_na():
    """At small NA the vector treatment collapses onto the scalar TE-Airy
    image (same scalar-limit regression the dry vector engine passes)."""
    cfg = OpticsConfig(pixel_number=32, na=0.25)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.5).classical())
    s = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=STACK, depths_nm=[40.0, 120.0],
        normalize=True))
    v = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=STACK, depths_nm=[40.0, 120.0],
        polarization="unpolarized", normalize=True))
    nrms = np.sqrt(np.mean((s - v) ** 2)) / s.max()
    assert nrms < 2e-3


def test_image_standing_waves_over_silicon():
    """Imaged through the film path, a bright feature's exposure oscillates
    with depth over bare Si and decays monotonically when the substrate is
    index-matched (no reflected wave)."""
    cfg = OpticsConfig(pixel_number=32, na=0.8)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.4).classical())
    depths = np.linspace(5.0, 295.0, 24)
    n_r = 1.71 + 0.01j
    on_si = WaferStack(n_resist=n_r, thickness_nm=300.0, n_substrate=SI)
    matched = WaferStack(n_resist=n_r, thickness_nm=300.0, n_substrate=n_r)
    bright = np.unravel_index(
        np.argmax(np.asarray(lt.simulate(mask, src).image)), (32, 32))
    col_si = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=on_si, depths_nm=depths,
        normalize=True))[:, bright[0], bright[1]]
    col_m = np.asarray(lt.film_stack_images(
        mask, src, config=cfg, wafer_stack=matched, depths_nm=depths,
        normalize=True))[:, bright[0], bright[1]]
    assert (np.diff(col_m) < 0).all()  # pure decay when matched
    sign_changes = (np.diff(np.sign(np.diff(col_si))) != 0).sum()
    assert sign_changes >= 4  # standing waves over Si


def test_from_resist_and_rigorous_handoff():
    """WaferStack.from_resist maps the Dill absorbance to Im(n); the
    rigorous() DepthResist disables the analytic D(z) (identically 1)."""
    dr = DepthResist(mack=MackResist(thickness_nm=180.0), nz=6,
                     absorbance_per_um=0.9, substrate_reflectivity=0.3,
                     n_resist=1.68, wavelength_nm=193.0)
    stack = WaferStack.from_resist(dr)
    assert stack.thickness_nm == 180.0
    assert abs(stack.n_resist.real - 1.68) < 1e-12
    expected_k = 0.9e-3 * 193.0 / (4.0 * np.pi)
    assert abs(stack.n_resist.imag - expected_k) < 1e-15
    rig = dr.rigorous()
    assert np.abs(rig.depth_profile() - 1.0).max() < 1e-12
    # untouched knobs carry over
    assert rig.nz == dr.nz and rig.n_resist == dr.n_resist


def test_develop_through_rigorous_stack():
    """End to end: rigorous in-film exposure -> eikonal develop produces a
    resist profile that clears the bright spaces and keeps the dark lines."""
    cfg = OpticsConfig(pixel_number=32, na=0.8)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.5).classical())
    dr = DepthResist(mack=MackResist(thickness_nm=120.0, develop_s=60.0),
                     nz=6, absorbance_per_um=0.5, n_resist=1.71)
    stack = WaferStack.from_resist(dr, under_layers=((37.0, BARC),))
    film = lt.film_stack_images(mask, src, config=cfg, wafer_stack=stack,
                                resist=dr, normalize=True)
    assert film.shape == (6, 32, 32)
    profile = np.asarray(dr.rigorous().develop_profile_binary(
        film, 1.0, pixel_size_nm=cfg.pixel_size))
    cleared = profile[-1]  # bottom slab: 1 = resist removed
    geometry = np.asarray(mask.geometry)  # 1 = transmitting bar -> bright
    assert cleared[geometry > 0.5].mean() > 0.9  # bright bars clear
    # dark field survives (mean includes proximity-cleared bar edges)
    assert cleared[geometry < 0.5].mean() < 0.45
    assert cleared[:, :4].mean() < 0.05  # far field fully intact


def test_rigorous_swing_curve():
    """swing_curve(wafer_stack=...) drives E0 from the rigorous open-frame
    Airy profile: over silicon the swing oscillates at lambda/(2 n_resist);
    an index-matched substrate kills it."""
    import dataclasses

    from lithographysimulator_tpu.models.resist import swing_curve

    n_r = 1.70 + 0.012j
    dr = DepthResist(mack=MackResist(thickness_nm=300.0, develop_s=30.0),
                     nz=24, n_resist=n_r.real, wavelength_nm=193.0)
    on_si = WaferStack(n_resist=n_r, thickness_nm=300.0, n_substrate=SI)
    thicknesses = np.arange(260.0, 420.0, 4.0)
    sw = swing_curve(thicknesses, dr, wafer_stack=on_si)
    assert np.isfinite(sw["dose_to_clear"]).all()
    assert sw["swing_ratio"] > 0.05
    d = sw["dose_to_clear"]
    resid = d - np.polyval(np.polyfit(thicknesses, d, 1), thicknesses)
    spec = np.abs(np.fft.rfft(resid))
    freqs = np.fft.rfftfreq(len(resid), d=4.0)
    peak = freqs[1 + np.argmax(spec[1:])]
    assert 1.0 / peak == pytest.approx(193.0 / (2.0 * n_r.real), rel=0.2)

    matched = dataclasses.replace(on_si, n_substrate=n_r)
    sw0 = swing_curve(thicknesses, dr, wafer_stack=matched)
    assert sw0["swing_ratio"] < 0.2 * sw["swing_ratio"]


def test_film_socs_matches_exact_stack():
    """Per-slab film-SOCS kernels reproduce the exact in-film stack at
    rank-limited accuracy, scalar and vector, with the deep slabs built
    WARM from the previous slab's Ritz basis."""
    from lithographysimulator_tpu.simulate import (film_socs_kernels,
                                                   film_socs_stack)

    cfg = OpticsConfig(pixel_number=32, na=0.85)
    mask = lt.demo_bars(cfg)
    src = np.asarray(lt.LightSource(cfg, sigma_out=0.6).classical())
    dr = DepthResist(mack=MackResist(thickness_nm=150.0), nz=4,
                     n_resist=1.71, absorbance_per_um=0.5)
    wafer = WaferStack.from_resist(dr, under_layers=((37.0, BARC),))
    for pol, tol in ((None, 1e-4), ("unpolarized", 5e-4)):
        exact = np.asarray(lt.film_stack_images(
            mask, src, config=cfg, wafer_stack=wafer, resist=dr,
            polarization=pol, normalize=True))
        kernels = film_socs_kernels(src, config=cfg, wafer_stack=wafer,
                                    resist=dr, polarization=pol, rank=48)
        assert len(kernels) == 4
        fast = np.asarray(film_socs_stack(
            mask, kernels, config=cfg, source_total=float(src.sum())))
        nrms = np.sqrt(np.mean((fast - exact) ** 2)) / exact.max()
        assert nrms < tol

    # warm-chained deep-slab kernels match an independent cold build
    k_cold = film_socs_kernels(src, config=cfg, wafer_stack=wafer,
                               depths_nm=[dr.depths_nm[3]], rank=48)
    kernels = film_socs_kernels(src, config=cfg, wafer_stack=wafer,
                                resist=dr, rank=48)
    img_c = np.asarray(film_socs_stack(
        mask, k_cold, config=cfg, source_total=float(src.sum())))[0]
    img_w = np.asarray(film_socs_stack(
        mask, [kernels[3]], config=cfg, source_total=float(src.sum())))[0]
    assert np.sqrt(np.mean((img_w - img_c) ** 2)) / img_c.max() < 1e-5


def test_film_socs_stack_requires_source_total():
    from lithographysimulator_tpu.simulate import film_socs_stack

    cfg = OpticsConfig(pixel_number=16)
    with pytest.raises(ValueError, match="source_total"):
        film_socs_stack(lt.demo_bars(cfg), [], config=cfg)


def test_multiplier_component_count_and_dtype():
    cfg = OpticsConfig(pixel_number=16, na=0.7)
    m = film_component_multipliers(cfg, STACK, [10.0, 75.0])
    assert m.shape == (2, 1, 16, 16) and m.dtype == np.complex128
    mv = film_component_multipliers(cfg, STACK, [10.0, 75.0],
                                    polarization="unpolarized")
    assert mv.shape[:2] == (2, 6)
    mx = film_component_multipliers(cfg, STACK, [10.0], polarization="x")
    assert mx.shape[:2] == (1, 3)


def test_swing_curve_immersion_index():
    """swing_curve(immersion_index=...) sets the medium above the resist on
    the rigorous path (advisor fix: it was silently air). Water (n~1.44) is
    closer index-matched to the resist than air, so (a) more dose couples in
    (E0 drops) and (b) the top-interface reflection — one of the two mirrors
    of the swing etalon — weakens, shrinking the swing ratio."""
    from lithographysimulator_tpu.models.resist import swing_curve

    n_r = 1.70 + 0.012j
    dr = DepthResist(mack=MackResist(thickness_nm=300.0, develop_s=30.0),
                     nz=24, n_resist=n_r.real, wavelength_nm=193.0)
    on_si = WaferStack(n_resist=n_r, thickness_nm=300.0, n_substrate=SI)
    thicknesses = np.arange(260.0, 420.0, 4.0)
    air = swing_curve(thicknesses, dr, wafer_stack=on_si)
    h2o = swing_curve(thicknesses, dr, wafer_stack=on_si,
                      immersion_index=1.437)
    assert np.isfinite(air["dose_to_clear"]).all()
    assert np.isfinite(h2o["dose_to_clear"]).all()
    assert h2o["dose_to_clear"][0] < 0.75 * air["dose_to_clear"][0]
    assert h2o["swing_ratio"] < 0.9 * air["swing_ratio"]
