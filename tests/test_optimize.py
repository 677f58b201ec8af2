"""Differentiability + SMO training-step tests (CPU, small grids)."""

import jax
import numpy as np
import optax
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    abbe_image_points,
    demo_bars,
    mask_spectrum,
    pupil_function,
)
from lithographysimulator_tpu.optimize import (
    SMOProblem,
    forward,
    init_params,
    loss_fn,
    make_train_step,
    mask_from_latent,
    optimize,
    optimize_socs,
)
from lithographysimulator_tpu.parallel import padded_source_arrays, source_mesh

CFG = OpticsConfig(pixel_number=32)


def _setup(chunk=8):
    src = np.asarray(LightSource(CFG, sigma_out=0.4).classical())
    shifts, weights, _ = padded_source_arrays(src, 8 * chunk)
    return shifts, weights


def test_image_grad_wrt_mask_nonzero():
    shifts, weights = _setup()
    pup = pupil_function(np.zeros(1), CFG)

    def f(geom):
        spec = mask_spectrum(geom, CFG)
        return abbe_image_points(spec, pup, shifts, weights, CFG,
                                 chunk=8, normalize=True).sum()

    g = jax.grad(f)(demo_bars(CFG).geometry)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_image_grad_wrt_aberrations_nonzero():
    shifts, weights = _setup()
    spec = mask_spectrum(demo_bars(CFG).geometry, CFG)

    def f(ab):
        pup = pupil_function(ab, CFG)
        img = abbe_image_points(spec, pup, shifts, weights, CFG,
                                chunk=8, normalize=True)
        return ((img - 0.5) ** 2).mean()

    g = np.asarray(jax.grad(f)(np.array([0, 0, 0.1, 0, 30.0], np.float32)))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_smo_loss_decreases():
    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8)
    ab = np.zeros(1, np.float32)

    target_geom = demo_bars(CFG).geometry
    target_params = init_params(problem, target_geom)
    target = forward(target_params, ab, shifts, weights, problem)

    # start from a blurred / wrong mask
    rng = np.random.default_rng(0)
    geom0 = np.clip(np.asarray(target_geom) * 0.5 +
                    0.25 * rng.random((32, 32)), 0, 1).astype(np.float32)
    params, history = optimize(problem, target, geom0, ab, shifts, weights,
                               steps=30, learning_rate=0.2)
    assert history[-1] < history[0] * 0.5


def test_smo_sharded_step_matches_local():
    """The sharded training step computes the same loss/update as local."""
    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8)
    ab = np.zeros(1, np.float32)
    target = forward(init_params(problem, demo_bars(CFG).geometry),
                     ab, shifts, weights, problem)
    geom0 = np.full((32, 32), 0.4, np.float32)

    opt = optax.sgd(0.1)
    params0 = init_params(problem, geom0)

    step_local = make_train_step(problem, opt)
    step_shard = make_train_step(problem, opt, mesh=source_mesh())

    p1, _, loss1 = step_local(params0, opt.init(params0), target, ab, shifts, weights)
    p2, _, loss2 = step_shard(params0, opt.init(params0), target, ab, shifts, weights)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    g1, g2 = np.asarray(p1["mask_latent"]), np.asarray(p2["mask_latent"])
    scale = np.abs(g1).max()
    np.testing.assert_allclose(g1 / scale, g2 / scale, atol=2e-4)


def test_source_optimization_params():
    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8, optimize_source=True)
    ab = np.zeros(1, np.float32)
    params = init_params(problem, demo_bars(CFG).geometry,
                         source_weights_init=np.maximum(np.asarray(weights), 1e-3))
    img = forward(params, ab, shifts, weights, problem)
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(lambda p: forward(p, ab, shifts, weights, problem).sum())(params)
    assert np.abs(np.asarray(g["source_logits"])).max() > 0


@pytest.mark.slow
def test_smo_socs_mask_only_matches_abbe():
    """SOCS-forward SMO reaches the same quality as the exact-Abbe loop:
    final loss EVALUATED UNDER THE ABBE MODEL comparable, big reduction."""
    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8)
    ab = np.zeros(1, np.float32)
    target_geom = demo_bars(CFG).geometry
    target = forward(init_params(problem, target_geom), ab, shifts, weights,
                     problem)
    rng = np.random.default_rng(0)
    geom0 = np.clip(np.asarray(target_geom) * 0.5 +
                    0.25 * rng.random((32, 32)), 0, 1).astype(np.float32)

    params_socs, hist = optimize_socs(problem, target, geom0, ab, shifts,
                                      weights, steps=30, learning_rate=0.2,
                                      rank=24)
    assert "source_logits" not in params_socs
    # Abbe-model loss of the SOCS-optimized mask: the rank truncation must
    # not have optimized into a model artifact.
    abbe_loss = float(loss_fn(params_socs, target, ab, shifts, weights,
                              problem))
    start_loss = float(loss_fn(init_params(problem, geom0), target, ab,
                               shifts, weights, problem))
    assert abbe_loss < start_loss * 0.5
    assert hist[-1] < hist[0] * 0.5


def test_smo_socs_alternating_source_decreases_loss():
    """Alternating source/mask SMO: warm-rebuilt kernels per source update,
    loss decreases and the source actually moves."""
    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8, optimize_source=True)
    ab = np.zeros(1, np.float32)
    target_geom = demo_bars(CFG).geometry
    target = forward(
        init_params(problem, target_geom,
                    source_weights_init=np.maximum(np.asarray(weights), 1e-3)),
        ab, shifts, weights, problem)
    geom0 = np.full((32, 32), 0.4, np.float32)
    w0 = np.maximum(np.asarray(weights), 1e-3)

    params, hist = optimize_socs(
        problem, target, geom0, ab, shifts, weights, steps=24,
        learning_rate=0.2, rank=24, mask_steps_per_build=8,
        source_weights_init=w0)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.6
    moved = np.abs(np.asarray(params["source_logits"]) -
                   np.log(w0)).max()
    assert moved > 1e-4


@pytest.mark.slow
def test_aberration_retrieval_recovers_image():
    """Fit Zernike coefficients to a target image generated with known
    aberrations: the fitted model must reproduce the target image closely
    (coefficient-space recovery can be ambiguous; image-space is the
    physical criterion)."""
    from lithographysimulator_tpu import mask_spectrum, demo_bars
    from lithographysimulator_tpu.optimize import fit_aberrations

    shifts, weights = _setup()
    spec = mask_spectrum(demo_bars(CFG).geometry, CFG)
    true_ab = np.array([0, 0, 0.06, 0.04, 40.0], np.float32)
    pup = pupil_function(true_ab, CFG)
    target = abbe_image_points(spec, pup, shifts, weights, CFG,
                               chunk=8, normalize=True)

    coeffs, hist = fit_aberrations(target, spec, shifts, weights, CFG,
                                   n_coeffs=5, steps=150, learning_rate=0.08,
                                   chunk=8)
    assert hist[-1] < hist[0] * 0.05

    fitted = abbe_image_points(spec, pupil_function(coeffs, CFG), shifts,
                               weights, CFG, chunk=8, normalize=True)
    t = np.asarray(target) / np.asarray(target).max()
    f = np.asarray(fitted) / np.asarray(fitted).max()
    assert np.sqrt(np.mean((t - f) ** 2)) < 0.01


def test_opc_improves_print_fidelity():
    """OPC against the resist profile must beat printing the raw design."""
    from lithographysimulator_tpu import ResistModel, mask_spectrum, pattern_fidelity
    from lithographysimulator_tpu.optimize import SMOProblem, opc_correct
    from lithographysimulator_tpu.ops.abbe import abbe_image_points

    shifts, weights = _setup()
    problem = SMOProblem(config=CFG, chunk=8)
    target = np.asarray(demo_bars(CFG).geometry)
    ab = np.zeros(1, np.float32)
    resist = ResistModel(threshold=0.35, steepness=30.0)

    def printed(mask_geom):
        spec = mask_spectrum(jnp.asarray(mask_geom, jnp.float32), CFG)
        img = abbe_image_points(spec, pupil_function(ab, CFG), shifts, weights,
                                CFG, chunk=8, normalize=True)
        return resist.develop_binary(img, CFG)

    import jax.numpy as jnp
    base = pattern_fidelity(printed(target), target, CFG)
    corrected, hist = opc_correct(target, ab, shifts, weights, problem,
                                  resist=resist, steps=80, learning_rate=0.1)
    after = pattern_fidelity(printed(np.asarray(corrected)), target, CFG)
    assert hist[-1] < hist[0]
    assert after["mean_epe_nm"] <= base["mean_epe_nm"] + 1e-9
    assert after["iou"] >= base["iou"]


@pytest.mark.slow
def test_pw_opc_beats_nominal_on_worst_corner():
    """Process-window OPC (round 3): optimizing across (defocus, dose)
    corners yields a mask whose WORST-corner resist mismatch beats the
    nominal-only-optimized mask's."""
    import numpy as np
    import jax.numpy as jnp

    from lithographysimulator_tpu import (LightSource, OpticsConfig,
                                          demo_bars)
    from lithographysimulator_tpu.models.resist import ResistModel
    from lithographysimulator_tpu.optimize import opc_correct_pw

    cfg = OpticsConfig(pixel_number=32)
    target = np.asarray(demo_bars(cfg).geometry, np.float32)
    src = np.asarray(LightSource(cfg, sigma_out=0.6).classical())
    resist = ResistModel(threshold=0.35, steepness=30.0)
    corners = dict(defocus_nm=(-80.0, 0.0, 80.0), doses=(0.9, 1.0, 1.1))

    pw_mask, pw_report = opc_correct_pw(
        target, cfg, src, resist=resist, steps=40, rank=24, **corners)
    # nominal-only: same machinery, single corner
    nom_mask, _ = opc_correct_pw(
        target, cfg, src, resist=resist, steps=40, rank=24,
        defocus_nm=(0.0,), doses=(1.0,))

    # evaluate BOTH masks on the full corner grid via one 0-step call
    def corner_losses(mask):
        _, rep = opc_correct_pw(
            np.asarray(mask), cfg, src, resist=resist, steps=1,
            learning_rate=0.0, rank=24, **corners)
        return rep["corner_losses"]

    pw_losses = corner_losses(pw_mask)
    nom_losses = corner_losses(nom_mask)
    assert pw_losses.shape == (3, 3)
    assert np.isfinite(pw_losses).all()
    assert pw_losses.max() < nom_losses.max()  # better worst corner
    # loss history decreased
    h = pw_report["loss_history"]
    assert h[-1] < h[0]


@pytest.mark.slow
def test_aberration_retrieval_through_focus_recovers_coefficients():
    """Scanner matching: a focal stack pins the aberration FUNCTION, not
    just one image — the odd terms (astig/coma) land on their true values,
    the even (focus-symmetric) spherical term recovers its SIGN and
    magnitude, and the fit generalizes to focal planes it never saw,
    including extrapolation beyond the measured range. (Base defocus Z2
    and spherical's rho^2 content form a near-flat direction at this
    small-NA phase diversity — coefficient-exact c4 is NOT asserted; the
    wavefront equivalence class is what the unseen-plane check pins.)"""
    from lithographysimulator_tpu import demo_bars, mask_spectrum
    from lithographysimulator_tpu.optimize import fit_aberrations

    shifts, weights = _setup()
    spec = mask_spectrum(demo_bars(CFG).geometry, CFG)
    # astig (j=3), base defocus 25 nm (j=4), coma (j=7), spherical (j=12)
    true_ab = np.zeros(13, np.float32)
    true_ab[3] = 0.05
    true_ab[4] = 25.0
    true_ab[7] = 0.04
    true_ab[12] = -0.03

    def image_at(ab, off):
        a = np.asarray(ab, np.float32).copy()
        a[4] += off
        out = np.asarray(abbe_image_points(
            spec, pupil_function(a, CFG), shifts, weights, CFG,
            chunk=8, normalize=True))
        return out / out.max()

    offsets = np.array([-150.0, -50.0, 50.0, 150.0], np.float32)
    target = np.stack([image_at(true_ab, o) for o in offsets])

    coeffs, hist = fit_aberrations(
        target, spec, shifts, weights, CFG, n_coeffs=13, steps=600,
        learning_rate=0.05, chunk=8, defocus_nm=offsets)
    assert hist[-1] < hist[0] * 0.02
    got = np.asarray(coeffs)
    assert abs(got[3] - 0.05) < 5e-3
    assert abs(got[7] - 0.04) < 5e-3
    # even-aberration SIGN + magnitude — unresolvable from one in-focus image
    assert got[12] < 0 and abs(got[12] - (-0.03)) < 1e-2
    # generalization: unseen interpolated + extrapolated planes match truth
    for off in (0.0, -250.0):
        nrms = np.sqrt(np.mean((image_at(true_ab, off)
                                - image_at(got, off)) ** 2))
        assert nrms < 0.01, (off, nrms)
    # input validation
    with pytest.raises(ValueError, match="matching"):
        fit_aberrations(target[0], spec, shifts, weights, CFG,
                        defocus_nm=offsets)
    with pytest.raises(ValueError, match="single-image"):
        fit_aberrations(target, spec, shifts, weights, CFG)


def test_m3d_aware_opc_corrects_euv_shadowing_shift():
    """EUV M3D-aware OPC regression: an asymmetric edge kernel (chief-ray
    shadowing) shifts the printed pattern; tile OPC run THROUGH the kernel
    must pre-compensate, beating the uncorrected design printed through the
    same thick-mask forward."""
    import jax.numpy as jnp

    from lithographysimulator_tpu import (LightSource, ResistModel,
                                          pattern_fidelity)
    from lithographysimulator_tpu.ops.hopkins import randomized_socs
    from lithographysimulator_tpu.ops.mask3d import EdgeKernelM3D
    from lithographysimulator_tpu.ops.tiled import tiled_socs_image
    from lithographysimulator_tpu.optimize import opc_correct_tiled

    tile_cfg = OpticsConfig(pixel_number=32)
    big_n = 64
    target = np.zeros((big_n, big_n), np.float32)
    for c in range(10, big_n - 6, 16):
        target[6:-6, c:c + 5] = 1.0
    src = np.asarray(LightSource(tile_cfg, sigma_out=0.5).classical())
    # rise/fall asymmetry — the EUV shadowing signature the kernel fit
    # produces at the 6-deg chief ray (magnitudes of that order)
    ek = EdgeKernelM3D(width_nm=8.0,
                       taps_v_rise=(0.05j, -0.30 + 0.05j, 0j),
                       taps_v_fall=(0j, -0.10 + 0.02j, 0.03j),
                       taps_h_rise=(0.015j, -0.20 + 0.035j, 0.015j),
                       taps_h_fall=(0.015j, -0.20 + 0.035j, 0.015j))
    resist = ResistModel(threshold=0.35, steepness=30.0)

    socs = randomized_socs(
        pupil_function(np.zeros(1, np.float32), tile_cfg),
        jnp.asarray(src), tile_cfg, rank=24, seed=0)

    def printed(mask_big):
        img = np.asarray(tiled_socs_image(
            jnp.asarray(mask_big, jnp.float32), socs, tile_cfg, mask3d=ek))
        return (img / img.max()) > resist.threshold

    base = pattern_fidelity(printed(target).astype(np.float32), target,
                            tile_cfg)
    corrected = opc_correct_tiled(
        target, tile_cfg, src, resist=resist, steps=40, learning_rate=0.2,
        rank=24, mask3d=ek)
    after = pattern_fidelity(printed(np.asarray(corrected)).astype(np.float32),
                             target, tile_cfg)
    assert after["iou"] > base["iou"]
    assert after["mean_epe_nm"] < base["mean_epe_nm"]
