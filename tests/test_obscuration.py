"""Central pupil obscuration (high-NA EUV annular pupil).

No reference counterpart (unobscured reference optics, pupil.py:102-111);
oracles are geometric (annulus energy) and cross-solver consistency.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    demo_bars,
    pupil_function,
    simulate,
)
from lithographysimulator_tpu.grid import Grid


def test_annulus_geometry_and_energy():
    cfg0 = OpticsConfig(pixel_number=64)
    cfg = OpticsConfig(pixel_number=64, obscuration=0.3)
    p0 = np.asarray(pupil_function(np.zeros(1, np.float32), cfg0))
    p = np.asarray(pupil_function(np.zeros(1, np.float32), cfg))
    r = Grid(cfg).radius()
    assert (np.abs(p[r < 0.3]) == 0).all()
    np.testing.assert_array_equal(p[r >= 0.3], p0[r >= 0.3])
    # annulus area fraction ~ 1 - obs^2
    frac = np.abs(p).sum() / np.abs(p0).sum()
    assert frac == pytest.approx(1 - 0.3 ** 2, abs=0.02)


def test_obscured_imaging_consistent_across_solvers():
    """The obscuration flows through the pupil into both the exact Abbe
    path and the SOCS kernel build — images agree, and differ from the
    unobscured ones."""
    cfg = OpticsConfig(pixel_number=32, obscuration=0.25)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    exact = np.asarray(simulate(demo_bars(cfg), src, normalize=True).image)
    socs = np.asarray(simulate(demo_bars(cfg), src, normalize=True,
                               solver="socs").image)
    rms = np.sqrt(np.mean((exact - socs) ** 2)) / exact.max()
    assert rms < 1e-3
    clear = np.asarray(simulate(
        demo_bars(OpticsConfig(pixel_number=32)), src,
        normalize=True).image)
    assert not np.allclose(exact, clear, atol=1e-3)


def test_validation():
    with pytest.raises(ValueError):
        OpticsConfig(obscuration=1.0)
    with pytest.raises(ValueError):
        OpticsConfig(obscuration=-0.1)
