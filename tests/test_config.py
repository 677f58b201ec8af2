"""Grid/config constants vs reference-derived values (SURVEY §1)."""

import numpy as np
import pytest

from lithographysimulator_tpu import DEMO_CONFIG, Grid, OpticsConfig, nearest_pow2


def test_demo_wavelength_scaling():
    # Verified reference values: beta=123.52, N=128, eps≈1.0363 (mask.py:67-72).
    ws = DEMO_CONFIG.wavelength_scaling()
    assert ws.beta == pytest.approx(123.52)
    assert ws.fft_size == 128
    assert ws.epsilon == pytest.approx(1.0363, abs=1e-4)


def test_grid_constants():
    cfg = DEMO_CONFIG
    assert cfg.delta_k == pytest.approx(0.0625)
    assert cfg.k_bound == pytest.approx(2.0)
    assert cfg.pixel_bound == pytest.approx(800.0)


def test_axes_span_and_step():
    g = Grid(DEMO_CONFIG)
    assert g.sigma[0] == -2.0 and len(g.sigma) == 64
    np.testing.assert_allclose(np.diff(g.sigma), 0.0625)
    np.testing.assert_allclose(g.k, g.sigma)  # sigma grid ≡ k grid invariant
    assert g.x[0] == -800.0 and g.x[-1] == 775.0


def test_nearest_pow2_tie_and_rounding():
    assert nearest_pow2(123.52) == 128
    assert nearest_pow2(3.0) == 2  # tie -> smaller, matching argmin over table
    assert nearest_pow2(3952.64) == 4096  # 2048^2 mask, 25 nm pixels, 193 nm


def test_defocus_conversion():
    # 100 nm -> 0.0635 waves at NA=0.7, lambda=193 (verified, pupil.py:92).
    assert DEMO_CONFIG.defocus_nm_to_waves(100.0) == pytest.approx(0.063472, abs=1e-6)


def test_config_validation():
    with pytest.raises(ValueError):
        OpticsConfig(pixel_number=63)
    with pytest.raises(ValueError):
        OpticsConfig(na=2.0)
    OpticsConfig(na=1.35)  # 193i immersion is a valid configuration
