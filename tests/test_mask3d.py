"""Thick-mask (boundary-layer) model tests: thin-mask limit, edge-field
bookkeeping, H-V bias, focus asymmetry, solver-path consistency, and the
differentiable calibration fit."""

import jax
import jax.numpy as jnp
import numpy as np

from lithographysimulator_tpu import (
    BoundaryLayer,
    LightSource,
    OpticsConfig,
    apply_boundary_layers,
    demo_bars,
    fit_boundary_layer,
    lines_and_spaces,
    simulate,
)
from lithographysimulator_tpu.ops.mask3d import edge_fields

CFG = OpticsConfig(pixel_number=32)


def _source(cfg=CFG):
    return np.asarray(LightSource(cfg, sigma_out=0.5).classical())


def test_thin_mask_limit_exact():
    """width 0 or beta 0 reproduces the thin-mask image bit-for-bit (the
    perturbation term is exactly zero)."""
    mask = demo_bars(CFG)
    src = _source()
    base = np.asarray(simulate(mask, src, normalize=True).image)
    for bl in (BoundaryLayer(width_nm=0.0, beta_h=0.3, beta_v=0.3),
               BoundaryLayer(width_nm=8.0, beta_h=0.0, beta_v=0.0)):
        img = np.asarray(simulate(mask, src, normalize=True, mask3d=bl).image)
        np.testing.assert_allclose(img, base, rtol=1e-6)


def test_edge_fields_unit_step_bookkeeping():
    """A unit step contributes total weight 1 split across its two flanking
    pixels, on the correct orientation channel only."""
    g = np.zeros((16, 16), np.float32)
    g[:, 8:] = 1.0  # one vertical edge (transmission changes along axis 1)
    e_h, e_v = edge_fields(jnp.asarray(g))
    e_h, e_v = np.asarray(e_h), np.asarray(e_v)
    # wrap-around at column 0/15 creates a second (periodic) edge; restrict
    # to the interior edge at columns 7|8
    assert e_v[4, 7] == 0.5 and e_v[4, 8] == 0.5
    assert abs(e_v[:, 6]).max() < 1e-6
    # no horizontal-edge response anywhere (columns are constant)
    assert abs(e_h[1:-1]).max() < 1e-6


def test_hv_bias_orientation_selective():
    """beta_v perturbs vertical-line imaging but leaves the same pattern
    rotated 90 degrees untouched when beta_h = 0 — the H-V bias signature
    a thin mask cannot produce."""
    src = _source()
    v_mask = lines_and_spaces(CFG, line_width_px=4, pitch_px=8)
    h_mask = lines_and_spaces(CFG, line_width_px=4, pitch_px=8,
                              vertical=False)
    bl = BoundaryLayer(width_nm=10.0, beta_v=-0.4, beta_h=0.0)

    v_thin = np.asarray(simulate(v_mask, src, normalize=True).image)
    v_thick = np.asarray(simulate(v_mask, src, normalize=True,
                                  mask3d=bl).image)
    h_thin = np.asarray(simulate(h_mask, src, normalize=True).image)
    h_thick = np.asarray(simulate(h_mask, src, normalize=True,
                                  mask3d=bl).image)

    v_delta = np.abs(v_thick - v_thin).max() / v_thin.max()
    h_delta = np.abs(h_thick - h_thin).max() / h_thin.max()
    assert v_delta > 0.02          # vertical edges strongly perturbed
    assert h_delta < v_delta / 50  # horizontal pattern essentially untouched


def test_imaginary_beta_breaks_focus_symmetry():
    """A real thin mask images identically at +-defocus (Hermitian spectrum,
    even pupil). An imaginary boundary layer makes the effective mask
    complex, producing the thick-mask best-focus shift: images at +-defocus
    differ."""
    mask = lines_and_spaces(CFG, line_width_px=4, pitch_px=8)
    src = _source()
    defocus = np.zeros(5, np.float32)
    defocus[4] = 60.0  # Z4 defocus

    thin_p = np.asarray(simulate(mask, src, defocus, normalize=True).image)
    thin_m = np.asarray(simulate(mask, src, -defocus, normalize=True).image)
    np.testing.assert_allclose(thin_p, thin_m, rtol=1e-4)

    bl = BoundaryLayer(width_nm=10.0, beta_h=0.3j, beta_v=0.3j)
    thick_p = np.asarray(simulate(mask, src, defocus, normalize=True,
                                  mask3d=bl).image)
    thick_m = np.asarray(simulate(mask, src, -defocus, normalize=True,
                                  mask3d=bl).image)
    asym = np.abs(thick_p - thick_m).max() / thick_p.max()
    assert asym > 1e-3


def test_socs_path_matches_abbe_with_mask3d():
    """The SOCS fast path sees the same effective mask: socs vs exact Abbe
    agree to kernel-truncation accuracy with a boundary layer applied."""
    mask = demo_bars(CFG)
    src = _source()
    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.2 + 0.1j, beta_v=-0.3)
    exact = np.asarray(simulate(mask, src, normalize=True, mask3d=bl).image)
    fast = np.asarray(simulate(mask, src, solver="socs", normalize=True,
                               mask3d=bl).image)
    rms = np.sqrt(np.mean((fast - exact) ** 2)) / exact.max()
    assert rms < 1e-3


def test_fit_boundary_layer_recovers_parameters():
    """Calibration: images rendered with a known (beta_h, beta_v) are fitted
    from zero init to the true parameters."""
    from lithographysimulator_tpu.ops.abbe import source_points

    cfg = CFG
    mask = demo_bars(cfg)
    src = _source(cfg)
    pts = source_points(src)
    pad = (-pts.live_count) % 8
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])

    true = BoundaryLayer(width_nm=8.0, beta_h=-0.25 + 0.15j,
                         beta_v=0.1 - 0.2j)
    target = np.asarray(simulate(mask, src, normalize=True,
                                 mask3d=true).image)

    fitted, history = fit_boundary_layer(
        target, mask.geometry, shifts, weights, cfg, width_nm=8.0,
        steps=300, learning_rate=0.02)
    assert history[-1] < history[0] * 1e-2
    assert abs(fitted.beta_h - true.beta_h) < 0.05
    assert abs(fitted.beta_v - true.beta_v) < 0.05


def test_edge_fields_signed_split():
    """rise + fall recovers edge_fields; the direction channels put the
    interior rising edge (dark->bright along +x) on rise only, with the
    falling response confined to the periodic wraparound."""
    from lithographysimulator_tpu.ops.mask3d import edge_fields_signed

    g = np.zeros((16, 16), np.float32)
    g[:, 8:] = 1.0
    e_h, e_v = edge_fields(jnp.asarray(g))
    e_hr, e_hf, e_vr, e_vf = map(np.asarray, edge_fields_signed(jnp.asarray(g)))
    np.testing.assert_allclose(e_hr + e_hf, np.asarray(e_h), atol=1e-6)
    np.testing.assert_allclose(e_vr + e_vf, np.asarray(e_v), atol=1e-6)
    assert e_vr[4, 7] == 0.5 and e_vr[4, 8] == 0.5   # interior rise at 7|8
    assert abs(e_vf[:, 6:10]).max() < 1e-6           # no interior fall
    assert e_vf[4, 15] == 0.5 and e_vf[4, 0] == 0.5  # wraparound fall
    # phase-only steps (alt-PSM) have no magnitude direction: even split
    p = np.ones((16, 16), np.complex64)
    p[:, 8:] = -1.0
    _, _, pvr, pvf = map(np.asarray, edge_fields_signed(jnp.asarray(p)))
    np.testing.assert_allclose(pvr[4, 7], pvf[4, 7], rtol=1e-6)
    # ... including when the pi phase is stored as a REAL sign (a real
    # alternating-PSM array): direction is by |t|, not by signed value
    pr = np.ones((16, 16), np.float32)
    pr[:, 8:] = -1.0
    _, _, rvr, rvf = map(np.asarray, edge_fields_signed(jnp.asarray(pr)))
    np.testing.assert_allclose(rvr[4, 7], rvf[4, 7], rtol=1e-6)
    # and a real 0 -> -1 step is a RISE in |t| (not a fall)
    q = np.zeros((16, 16), np.float32)
    q[:, 8:] = -1.0
    _, _, qvr, qvf = map(np.asarray, edge_fields_signed(jnp.asarray(q)))
    assert qvr[4, 7] > 0.49 and abs(qvf[:, 6:10]).max() < 1e-3


def test_asymmetric_bl_shifts_pattern():
    """EUV-shadowing signature: a rising/falling edge asymmetry moves the
    printed line (pattern shift), with direction following the sign of the
    asymmetry — while the symmetric model leaves the centroid in place."""
    mask = lines_and_spaces(CFG, line_width_px=4, pitch_px=16)
    src = _source()
    x = np.arange(CFG.n)

    def centroid(bl):
        img = np.asarray(simulate(mask, src, normalize=True, mask3d=bl).image)
        row = img[CFG.n // 2]
        row = row.max() - row  # dark line -> positive mass at the feature
        row = np.where(np.abs(x - 8) <= 6, row, 0.0)  # isolate one line
        return float((x * row).sum() / row.sum())

    c_sym = centroid(BoundaryLayer(width_nm=12.5, beta_h=-0.3, beta_v=-0.3))
    c_pos = centroid(BoundaryLayer(width_nm=12.5, beta_h=-0.3, beta_v=-0.3,
                                   beta_v_asym=0.5))
    c_neg = centroid(BoundaryLayer(width_nm=12.5, beta_h=-0.3, beta_v=-0.3,
                                   beta_v_asym=-0.5))
    c_thin = centroid(BoundaryLayer(width_nm=0.0))
    assert abs(c_sym - c_thin) < 0.02          # symmetric: no shift
    assert (c_pos - c_sym) > 0.05              # asym moves the line...
    assert abs((c_neg - c_sym) + (c_pos - c_sym)) < 0.02  # ...antisymmetrically


def test_fit_boundary_layer_recovers_asymmetry():
    """fit_asym=True recovers a known rising/falling asymmetry (the EUV
    calibration path) from zero init."""
    from lithographysimulator_tpu.ops.abbe import source_points

    mask = demo_bars(CFG)
    src = _source()
    pts = source_points(src)
    pad = (-pts.live_count) % 8
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])

    # real-valued truth: the imaginary sector is a near-flat direction of an
    # in-focus fit (documented in boundary_layer_from_rcwa) — the REAL parts
    # (CD bias + shadowing shift) are what a single-plane target determines
    true = BoundaryLayer(width_nm=8.0, beta_h=-0.2, beta_v=-0.25,
                         beta_v_asym=0.15)
    target = np.asarray(simulate(mask, src, normalize=True,
                                 mask3d=true).image)
    fitted, history = fit_boundary_layer(
        target, mask.geometry, shifts, weights, CFG, width_nm=8.0,
        steps=300, learning_rate=0.02, fit_asym=True)
    assert history[-1] < history[0] * 1e-2
    assert abs(fitted.beta_v_asym.real - true.beta_v_asym) < 0.05
    assert abs(fitted.beta_h_asym.real) < 0.05
    assert abs(fitted.beta_v.real - true.beta_v) < 0.05
    assert abs(fitted.beta_h.real - true.beta_h) < 0.05


def test_edge_kernel_k0_equals_boundary_layer():
    """EdgeKernelM3D with single taps (beta ± asym) reproduces the
    asymmetric BoundaryLayer bit-for-bit — it is the K=0 special case."""
    from lithographysimulator_tpu.ops.mask3d import (EdgeKernelM3D,
                                                     apply_boundary_layers)

    g = np.asarray(demo_bars(CFG).geometry)
    bh, bv, av = -0.2 + 0.1j, -0.3 - 0.05j, 0.12 - 0.04j
    bl_eff = np.asarray(jax.jit(lambda m: apply_boundary_layers(
        m, CFG, width_nm=8.0, beta_h=bh, beta_v=bv,
        beta_v_asym=av))(jnp.asarray(g)))
    ek = EdgeKernelM3D(width_nm=8.0,
                       taps_h_rise=(bh,), taps_h_fall=(bh,),
                       taps_v_rise=(bv + av,), taps_v_fall=(bv - av,))
    ek_eff = np.asarray(jax.jit(ek.apply, static_argnums=1)(jnp.asarray(g),
                                                            CFG))
    np.testing.assert_allclose(ek_eff, bl_eff, atol=1e-7)


def test_edge_kernel_validation():
    from lithographysimulator_tpu.ops.mask3d import EdgeKernelM3D

    with np.testing.assert_raises(ValueError):
        EdgeKernelM3D(taps_h_rise=(0j, 0j))  # even length
    with np.testing.assert_raises(ValueError):
        EdgeKernelM3D(taps_h_rise=(0j, 0j, 0j), taps_v_rise=(0j,))


def test_fit_edge_kernel_explains_multitap_target():
    """A target rendered with a known K=1 kernel is fit to image-space
    agreement far below the thin-mask residual (parameter identity is not
    asserted: tap bases overlap through the band limit)."""
    from lithographysimulator_tpu.ops.abbe import source_points
    from lithographysimulator_tpu.ops.mask3d import (EdgeKernelM3D,
                                                     fit_edge_kernel)

    mask = demo_bars(CFG)
    src = _source()
    pts = source_points(src)
    pad = (-pts.live_count) % 8
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])

    true = EdgeKernelM3D(width_nm=8.0,
                         taps_h_rise=(0.05j, -0.2 + 0.1j, 0.1),
                         taps_h_fall=(0.1, -0.2 - 0.05j, 0.05j),
                         taps_v_rise=(0.02, -0.3, 0.15),
                         taps_v_fall=(0.15, -0.25, 0.02))
    target = np.asarray(simulate(mask, src, normalize=True,
                                 mask3d=true).image)
    fitted, history = fit_edge_kernel(
        target, mask.geometry, shifts, weights, CFG, k=1, width_nm=8.0,
        steps=300, learning_rate=0.02)
    assert fitted.k == 1
    corrected = np.asarray(simulate(mask, src, normalize=True,
                                    mask3d=fitted).image)
    thin = np.asarray(simulate(mask, src, normalize=True).image)
    err_fit = np.sqrt(np.mean((corrected / corrected.max()
                               - target / target.max()) ** 2))
    err_thin = np.sqrt(np.mean((thin / thin.max()
                                - target / target.max()) ** 2))
    assert err_fit < 0.05 * err_thin


def test_mask3d_gradient_flows_to_mask():
    """SMO/OPC through the BL model: the image stays differentiable w.r.t.
    the (continuous) mask with the edge-field nonlinearity in the path."""
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum

    g0 = np.asarray(demo_bars(CFG).geometry) * 0.8 + 0.1
    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.2, beta_v=-0.2)

    @jax.jit
    def total(g):
        eff = apply_boundary_layers(g, CFG, width_nm=bl.width_nm,
                                    beta_h=bl.beta_h, beta_v=bl.beta_v)
        return jnp.sum(jnp.abs(mask_spectrum(eff, CFG)) ** 2)

    grad = np.asarray(jax.grad(total)(jnp.asarray(g0, jnp.float32)))
    assert np.isfinite(grad).all()
    assert np.abs(grad).max() > 0


def test_tiled_mask3d_matches_global_apply():
    """Per-tile BL application equals applying the BL to the whole mask
    first (the stencil is local; wraparound lands in the cropped halo)."""
    from lithographysimulator_tpu.ops.hopkins import randomized_socs
    from lithographysimulator_tpu.ops.tiled import tiled_socs_image
    from lithographysimulator_tpu.models.pupil import pupil_function

    tile_cfg = OpticsConfig(pixel_number=32)
    big_n = 64
    rng = np.random.default_rng(3)
    mask_big = (rng.random((big_n, big_n)) > 0.6).astype(np.float32)
    # zero the chip border so periodic global apply and zero-padded
    # per-tile apply agree everywhere (border transmission steps are the
    # one place the two boundary conventions legitimately differ)
    mask_big[:6] = mask_big[-6:] = 0.0
    mask_big[:, :6] = mask_big[:, -6:] = 0.0
    src = _source(tile_cfg)
    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.2, beta_v=-0.35 + 0.1j)

    pupil = pupil_function(jnp.zeros(1, jnp.float32), tile_cfg)
    socs = randomized_socs(pupil, jnp.asarray(src), tile_cfg, rank=24,
                           seed=1)

    tiled_bl = np.asarray(tiled_socs_image(
        jnp.asarray(mask_big), socs, tile_cfg, mask3d=bl))

    @jax.jit
    def global_eff(m):
        return apply_boundary_layers(m, tile_cfg, width_nm=bl.width_nm,
                                     beta_h=bl.beta_h, beta_v=bl.beta_v)

    # global apply, then tile the COMPLEX effective mask with no mask3d
    eff_big = global_eff(jnp.asarray(mask_big))
    tiled_eff = np.asarray(tiled_socs_image(eff_big, socs, tile_cfg))

    # the window's outermost (wraparound) ring differs between the two
    # paths and bleeds into the core through the PSF tail — same order as
    # the tiled path's inherent halo-truncation error (<0.2% here)
    np.testing.assert_allclose(tiled_bl, tiled_eff,
                               rtol=4e-3, atol=1e-3 * float(tiled_eff.max()))


def test_model_json_round_trip():
    """model_to_json / model_from_json is the m3dcal -> imaging contract:
    both model kinds survive dict, JSON-string, and file round trips, with
    extra report keys ignored."""
    import json

    from lithographysimulator_tpu.ops.mask3d import (EdgeKernelM3D,
                                                     model_from_json,
                                                     model_to_json)

    bl = BoundaryLayer(width_nm=6.0, beta_h=-0.2 + 0.1j, beta_v=-0.3j,
                       beta_v_asym=0.04 - 0.02j)
    ek = EdgeKernelM3D(width_nm=8.0,
                       taps_v_rise=(0.1j, -0.2 + 0j, 0.05 + 0.01j),
                       taps_v_fall=(0.02j, 0.1j, 0.2j),
                       taps_h_rise=(0j, -0.1 + 0.05j, 0j),
                       taps_h_fall=(0j, -0.1 + 0.05j, 0j))
    for model in (bl, ek):
        d = model_to_json(model)
        assert model_from_json(d) == model
        assert model_from_json(json.dumps(d)) == model
        d_report = dict(d, stack="binary_cr", fit_nrms={"avg": 0.001})
        assert model_from_json(d_report) == model


def test_cli_m3dcal_out_and_m3d_flag(tmp_path, capsys):
    """End-to-end handoff: m3dcal --out writes the calibrated model file,
    simulate --m3d consumes it, and the resulting image differs from the
    thin-mask run by exactly the boundary-layer perturbation."""
    from lithographysimulator_tpu.cli import main
    from lithographysimulator_tpu.ops.mask3d import model_from_json

    cal = tmp_path / "cal.json"
    rc = main(["m3dcal", "--pixel-number", "32", "--pitch", "16",
               "--steps", "30", "--out", str(cal)])
    assert rc == 0
    model = model_from_json(str(cal))
    assert isinstance(model, BoundaryLayer) and model.beta_h != 0

    out_m3d = tmp_path / "m3d.npy"
    out_thin = tmp_path / "thin.npy"
    capsys.readouterr()
    assert main(["simulate", "--pixel-number", "32", "--m3d", str(cal),
                 "--out", str(out_m3d)]) == 0
    report = capsys.readouterr().out.splitlines()[0]
    assert "BL(" in report
    assert main(["simulate", "--pixel-number", "32",
                 "--out", str(out_thin)]) == 0
    img_m3d = np.load(out_m3d, allow_pickle=True).item()["image"] \
        if out_m3d.exists() and np.load(out_m3d, allow_pickle=True).dtype == object \
        else np.load(out_m3d)
    img_thin = np.load(out_thin)
    assert img_m3d.shape == img_thin.shape
    assert np.abs(img_m3d - img_thin).max() > 1e-4


def test_tiled_metrology_accepts_mask3d():
    """Full-chip metrology through the calibrated thick-mask model: the
    mask3d argument must actually reach the tiled imager (focus stack and
    FEM both), not be silently dropped."""
    from lithographysimulator_tpu.metrology import tiled_fem, tiled_focus_images

    tile_cfg = OpticsConfig(pixel_number=32)
    big_n = 64
    mask_big = np.zeros((big_n, big_n), np.float32)
    for c in range(8, big_n - 4, 16):
        mask_big[8:-8, c:c + 5] = 1.0
    src = _source(tile_cfg)
    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.35, beta_v=-0.35 + 0.1j)
    thin = np.asarray(tiled_focus_images(mask_big, tile_cfg, src, [0.0],
                                         rank=24))[0]
    thick = np.asarray(tiled_focus_images(mask_big, tile_cfg, src, [0.0],
                                          rank=24, mask3d=bl))[0]
    nrms = np.linalg.norm(thick - thin) / np.linalg.norm(thin)
    assert nrms > 1e-2  # darkened edge strips change the chip image

    fem = tiled_fem(mask_big, tile_cfg, src, defocus_nm=[0.0], doses=[1.0],
                    rank=24, target_cd_nm=125.0, mask3d=bl)
    assert np.isfinite(np.asarray(fem["cd_nm"])).all()


def test_through_focus_fit_pins_im_beta_sign():
    """Ground-truth round trip: Im(beta) sets the thick-mask best-focus
    shift, which an in-focus image constrains only at second order. A
    through-focus target (the +-defocus asymmetry) recovers the full
    complex beta — sign of the imaginary part included."""
    import jax.numpy as jnp

    from lithographysimulator_tpu.ops.focus import (focus_stack_aberrations,
                                                    through_focus_images)
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg = OpticsConfig(pixel_number=32)
    geom = np.asarray(lines_and_spaces(cfg, line_width_px=5,
                                       pitch_px=16).geometry)
    src = _source(cfg)
    shifts, weights, _ = padded_source_arrays(src, 8)
    true = BoundaryLayer(width_nm=8.0, beta_h=-0.25 + 0.15j,
                         beta_v=-0.25 + 0.15j)
    stack_ab = np.asarray(focus_stack_aberrations(
        np.zeros(5, np.float32), np.array([-80.0, 0.0, 80.0], np.float32)))

    @jax.jit
    def make_target(g):
        eff = true.apply(g, cfg)
        spec = mask_spectrum(eff, cfg)
        img = through_focus_images(spec, stack_ab, shifts, weights, cfg,
                                   chunk=8, normalize=True)
        return img / jnp.max(img)

    target = np.asarray(make_target(jnp.asarray(geom)))
    fitted, hist = fit_boundary_layer(
        target, geom, shifts, weights, cfg, width_nm=8.0, chunk=8,
        steps=250, learning_rate=0.03, aberrations=stack_ab)
    assert hist[-1] < 1e-7
    assert abs(fitted.beta_v - true.beta_v) < 0.03
    assert fitted.beta_v.imag > 0.10  # the sign (and magnitude) is pinned
    # shape mismatch fails loudly, not silently
    import pytest

    with pytest.raises(ValueError, match="target"):
        fit_boundary_layer(target[0], geom, shifts, weights, cfg,
                           aberrations=stack_ab, steps=1)


def test_rcwa_calibration_through_focus():
    """First-principles through-focus calibration: the report carries the
    planes, the fit beats thin-mask on the SAME focal stack, and Im(beta)
    comes out with a definite sign."""
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa

    cfg = OpticsConfig(pixel_number=32)
    bl, rep = boundary_layer_from_rcwa(
        cfg, stack="binary_cr", pitch_px=16, steps=60,
        defocus_nm=(-80.0, 0.0, 80.0))
    assert rep["defocus_nm"] == [-80.0, 0.0, 80.0]
    assert rep["fit_nrms"]["avg"] < 0.35 * rep["thin_nrms"]["avg"]
    assert bl.beta_h == bl.beta_v  # unpolarized isotropy preserved
    assert abs(bl.beta_v.imag) > 1e-3


def test_tiled_halo_must_cover_mask3d_stencil():
    """Tiled paths reject a halo smaller than the mask3d apply stencil
    (k+1 px for EdgeKernelM3D): per-window application would wrap tap
    contributions into the kept tile core via jnp.roll."""
    import pytest

    from lithographysimulator_tpu.ops.mask3d import EdgeKernelM3D
    from lithographysimulator_tpu.ops.tiled import (_check_mask3d_halo,
                                                    tiled_socs_image)

    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.2, beta_v=-0.2)
    ek = EdgeKernelM3D(width_nm=8.0,
                       taps_h_rise=(0j, -0.2 + 0j, 0j),
                       taps_h_fall=(0j, -0.2 + 0j, 0j),
                       taps_v_rise=(0j, -0.2 + 0j, 0j),
                       taps_v_fall=(0j, -0.2 + 0j, 0j))  # k=1, stencil 2
    _check_mask3d_halo(None, 0)
    _check_mask3d_halo(bl, 1)
    _check_mask3d_halo(ek, 2)
    with pytest.raises(ValueError, match="stencil"):
        _check_mask3d_halo(bl, 0)
    with pytest.raises(ValueError, match="stencil"):
        _check_mask3d_halo(ek, 1)
    # and the guard is live on the public entry point
    from lithographysimulator_tpu.ops.hopkins import randomized_socs
    from lithographysimulator_tpu.models.pupil import pupil_function

    tile_cfg = OpticsConfig(pixel_number=32)
    pupil = pupil_function(jnp.zeros(5), tile_cfg)
    socs = randomized_socs(pupil, _source(tile_cfg), tile_cfg, rank=8)
    with pytest.raises(ValueError, match="stencil"):
        tiled_socs_image(jnp.zeros((64, 64), jnp.float32), socs, tile_cfg,
                         halo=1, mask3d=ek)
