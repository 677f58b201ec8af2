"""Mask geometry + spectrum solvers: golden parity and properties."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    DEMO_CONFIG,
    OpticsConfig,
    demo_bars,
    from_array,
    spectrum_direct,
    spectrum_fft,
)


def test_demo_geometry_matches_reference(golden):
    ref = golden("demo_mask_geometry")
    ours = np.asarray(demo_bars(DEMO_CONFIG).geometry)
    np.testing.assert_array_equal(ours, ref)


def test_spectrum_fft_matches_reference(golden, rms):
    ref = golden("demo_mask_spectrum_fft")
    ours = np.asarray(spectrum_fft(demo_bars(DEMO_CONFIG).geometry, DEMO_CONFIG))
    assert rms(ours, ref) < 1e-5


def test_spectrum_fft_small_matches_reference(golden, rms):
    geom = golden("small_mask_geometry")
    ref = golden("small_mask_spectrum_fft")
    cfg = OpticsConfig(pixel_number=32)
    ours = np.asarray(spectrum_fft(from_array(geom, cfg).geometry, cfg))
    assert rms(ours, ref) < 1e-5


def test_spectrum_direct_small_matches_reference(golden, rms):
    """The reference builds the O(n^4) 4-D integrand in fp16 grids/complex64
    (mask.py:42-59); ours is the separable two-matmul form in f64 host kernel
    + f32 matmul. fp16 k*x products in the reference phase dominate the
    difference."""
    geom = golden("small_mask_geometry")
    ref = golden("small_mask_spectrum_direct")
    cfg = OpticsConfig(pixel_number=32)
    ours = np.asarray(spectrum_direct(from_array(geom, cfg).geometry, cfg))
    assert rms(ours, ref) < 5e-3


def test_spectrum_dc_equals_trapz_mass():
    """DC bin of the direct solver = trapezoid-weighted mask mass."""
    cfg = OpticsConfig(pixel_number=32)
    rng = np.random.default_rng(0)
    geom = (rng.random((32, 32)) < 0.5).astype(np.float32)
    s = np.asarray(spectrum_direct(geom, cfg))
    w = np.ones(32); w[0] = w[-1] = 0.5
    mass = np.einsum("i,ij,j->", w, geom, w)
    # DC sits at index n//2 on the centered grid only if k=0 is on-grid: the
    # k axis is [-2, 2) so k[n//2] == 0 exactly.
    assert s[16, 16].real == pytest.approx(mass, rel=1e-5)
    assert abs(s[16, 16].imag) < 1e-3 * mass


def test_demo_bars_scaled():
    cfg = OpticsConfig(pixel_number=128)
    geom = np.asarray(demo_bars(cfg).geometry)
    assert geom.shape == (128, 128)
    assert geom.sum() == 4 * (110 - 18) * 8  # four bars, scaled 2x


def test_from_array_infers_size():
    geom = np.zeros((48, 48)); geom[10:20, 10:20] = 1
    m = from_array(geom, DEMO_CONFIG)
    assert m.config.pixel_number == 48


def test_from_array_rejects_nonsquare():
    with pytest.raises(ValueError):
        from_array(np.zeros((4, 8)), DEMO_CONFIG)
