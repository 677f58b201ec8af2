"""Abbe imaging engine: golden parity, solver cross-checks, physics limits."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    DEMO_CONFIG,
    LightSource,
    OpticsConfig,
    abbe_image,
    demo_bars,
    from_array,
    pupil_function,
    simulate,
    source_points,
    spectrum_direct,
    spectrum_fft,
)

DEMO_ABERR = np.array([0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01], np.float32)


def demo_source():
    return LightSource(DEMO_CONFIG, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8)


def test_demo_image_perfect_pupil_matches_reference(golden, rms):
    """Aberration-free demo image: isolates engine parity from the
    reference's fp16 Zernike rounding."""
    ref = golden("demo_aerial_image_fft_perfect")
    spec = spectrum_fft(demo_bars(DEMO_CONFIG).geometry, DEMO_CONFIG)
    pup = pupil_function(np.zeros(1), DEMO_CONFIG)
    img = np.asarray(abbe_image(spec, pup, np.asarray(demo_source()), DEMO_CONFIG))
    assert rms(img, ref) < 1e-5


def test_demo_image_annular_perfect_matches_reference(golden, rms):
    ref = golden("demo_aerial_image_fft_annular_perfect")
    spec = spectrum_fft(demo_bars(DEMO_CONFIG).geometry, DEMO_CONFIG)
    pup = pupil_function(np.zeros(1), DEMO_CONFIG)
    src = LightSource(DEMO_CONFIG, sigma_in=0.4, sigma_out=0.8).annular()
    img = np.asarray(abbe_image(spec, pup, np.asarray(src), DEMO_CONFIG))
    assert rms(img, ref) < 1e-5


def test_demo_image_aberrated_matches_reference(golden, rms):
    """Full demo pipeline (imageformation.py:99-119). fp16 Zernike phases in
    the reference set the tolerance floor."""
    ref = golden("demo_aerial_image_fft")
    res = simulate(demo_bars(DEMO_CONFIG), demo_source(), DEMO_ABERR)
    assert rms(np.asarray(res.image), ref) < 2e-3


def test_small_image_fft_matches_reference(golden, rms):
    """At n=32 the reference's final pad arithmetic under-pads and returns a
    30x30 image (SURVEY §2.2.8); ours center-pads to 32x32 — compare our
    central crop against the full reference output."""
    geom = golden("small_mask_geometry")
    ref = golden("small_aerial_image_fft")
    cfg = OpticsConfig(pixel_number=32)
    mask = from_array(geom, cfg)
    src = LightSource(cfg, sigma_out=0.3).classical()
    ab = np.array([0, 0, 0, 0, 50], np.float32)
    res = simulate(mask, src, ab)
    img = np.asarray(res.image)
    assert img.shape == (32, 32)
    m = ref.shape[0]
    p = (32 - m) // 2
    core = img[p : p + m, p : p + m]
    assert rms(core, ref) < 2e-3
    # padding ring is exactly zero
    assert img[0].max() == 0 and img[-1].max() == 0


def test_small_image_direct_matches_reference(golden, rms):
    """Direct (non-FFT) solver parity: the reference's O(n^4) trapz integral
    vs our separable matmul transform (imageformation.py:3-30).

    The 5e-3 tolerance here is the reference's own fp16 k/x grids; our
    numerics are pinned at <= 1e-6 against a complex128 oracle in
    test_accuracy.py::test_direct_solver_matches_f64_oracle."""
    geom = golden("small_mask_geometry")
    ref = golden("small_aerial_image_direct")
    cfg = OpticsConfig(pixel_number=32)
    mask = from_array(geom, cfg)
    src = LightSource(cfg, sigma_out=0.3).classical()
    ab = np.array([0, 0, 0, 0, 50], np.float32)
    res = simulate(mask, src, ab, solver="direct")
    assert rms(np.asarray(res.image), ref) < 5e-3


def test_point_list_and_dense_paths_agree():
    """Static point-list scan == dense weighted reduction over the grid."""
    import jax

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.4).classical())

    sparse = np.asarray(abbe_image(spec, pup, src, cfg))
    dense = np.asarray(
        jax.jit(lambda s: abbe_image(spec, pup, s, cfg, chunk=64))(src)
    )
    np.testing.assert_allclose(sparse, dense, rtol=1e-4, atol=1e-4 * sparse.max())


def test_chunk_size_invariance():
    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.4).classical())
    a = np.asarray(abbe_image(spec, pup, src, cfg, chunk=8))
    b = np.asarray(abbe_image(spec, pup, src, cfg, chunk=32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * a.max())


def test_monopole_is_coherent_image():
    """Classical-limit property: a single on-axis source point gives exactly
    the coherent image |IFFT(P * M)|^2 (no pupil shift)."""
    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg).monopole())

    img = np.asarray(abbe_image(spec, pup, src, cfg))

    from lithographysimulator_tpu.ops.abbe import _postprocess_gau23
    from lithographysimulator_tpu.ops.fourier import (
        centered_ifft2, crop_center, pad_center)
    N = cfg.wavelength_scaling().fft_size
    field = crop_center(centered_ifft2(pad_center(pup * spec, N)), cfg.n)
    expected = np.asarray(_postprocess_gau23(abs(np.asarray(field)) ** 2, cfg))
    np.testing.assert_allclose(img, expected, rtol=1e-5, atol=1e-5 * expected.max())


def test_direct_vs_fft_solver_cross_check():
    """BASELINE config 4: the two solvers agree on the same mask up to the
    wavelength-scaling approximation (the fast path resamples by eps)."""
    cfg = OpticsConfig(pixel_number=32)
    mask = demo_bars(cfg)
    src = LightSource(cfg, sigma_out=0.3).classical()
    img_fft = np.asarray(simulate(mask, src, solver="gau23", normalize=True).image)
    img_dir = np.asarray(simulate(mask, src, solver="direct", normalize=True).image)
    # The direct path has no epsilon resampling; normalize each to peak 1 and
    # compare shape. (norm='forward' ifft vs trapz scaling differ globally.)
    # The 0.05 budget is the *algorithmic* Gau'23 resampling gap — quantified
    # against the complex128 oracle in
    # test_accuracy.py::test_solver_gap_is_algorithmic_not_numerical.
    a = img_fft / img_fft.max()
    b = img_dir / img_dir.max()
    assert np.sqrt(np.mean((a - b) ** 2)) < 0.05


def test_normalize_flag():
    cfg = OpticsConfig(pixel_number=32)
    mask = demo_bars(cfg)
    src = LightSource(cfg, sigma_out=0.4).classical()
    raw = np.asarray(simulate(mask, src).image)
    norm = np.asarray(simulate(mask, src, normalize=True).image)
    pts = source_points(np.asarray(src))
    np.testing.assert_allclose(norm * pts.total_weight, raw, rtol=1e-5)


def test_image_is_real_nonnegative():
    res = simulate(demo_bars(DEMO_CONFIG), demo_source(), DEMO_ABERR)
    img = np.asarray(res.image)
    assert img.dtype == np.float32
    assert img.min() >= 0.0


def test_windowed_matmul_engine_exact():
    """The windowed zoom-DFT contraction (pupil-support window only) equals
    the dense matmul engine — the omitted entries are true zeros; only the
    rounding order differs (phase-free 3M vs dense complex contraction)."""
    cfg = OpticsConfig(pixel_number=64)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.array([0, 0, 0.01, 0, 100], np.float32), cfg)
    src = np.asarray(LightSource(cfg, sigma_in=0.2, sigma_out=0.6,
                                 shift_x=0.1).annular())
    from lithographysimulator_tpu.ops.abbe import abbe_image_points
    from lithographysimulator_tpu.parallel import padded_source_arrays

    shifts, weights, _ = padded_source_arrays(src, 4)
    ms = int(np.abs(np.asarray(shifts)).max())
    dense = np.asarray(abbe_image_points(spec, pup, shifts, weights, cfg,
                                         engine="matmul"))
    windowed = np.asarray(abbe_image_points(spec, pup, shifts, weights, cfg,
                                            engine="matmul", max_abs_shift=ms))
    np.testing.assert_allclose(windowed, dense, rtol=2e-6,
                               atol=2e-6 * np.abs(dense).max())


def test_demo_image_shifted_source_matches_reference(golden, rms):
    """Off-axis (shifted) source imaging end-to-end parity."""
    ref = golden("demo_aerial_image_fft_shifted_perfect")
    src_ref = golden("demo_source_shifted_small")
    ours_src = np.asarray(LightSource(DEMO_CONFIG, sigma_in=0.2, sigma_out=0.6,
                                      shift_x=0.3, shift_y=-0.2).annular())
    np.testing.assert_array_equal(ours_src, src_ref)
    spec = spectrum_fft(demo_bars(DEMO_CONFIG).geometry, DEMO_CONFIG)
    pup = pupil_function(np.zeros(1), DEMO_CONFIG)
    img = np.asarray(abbe_image(spec, pup, ours_src, DEMO_CONFIG))
    assert rms(img, ref) < 1e-5


def test_demo_image_dipole_matches_reference(golden, rms):
    ref = golden("demo_aerial_image_fft_dipole_perfect")
    src_ref = golden("demo_source_dipole")
    ours_src = np.asarray(LightSource(DEMO_CONFIG, sigma_in=0.5, sigma_out=0.8)
                          .quasar(2, 0.0))
    np.testing.assert_array_equal(ours_src, src_ref)
    spec = spectrum_fft(demo_bars(DEMO_CONFIG).geometry, DEMO_CONFIG)
    pup = pupil_function(np.zeros(1), DEMO_CONFIG)
    img = np.asarray(abbe_image(spec, pup, ours_src, DEMO_CONFIG))
    assert rms(img, ref) < 1e-5
