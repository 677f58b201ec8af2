"""Depth-resolved resist develop: limits, monotonicity, and composition with
through-focus aerial stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig, demo_bars, simulate
from lithographysimulator_tpu.models.resist import DepthResist, MackResist

CFG = OpticsConfig(pixel_number=32)


@pytest.fixture(scope="module")
def aerial():
    src = LightSource(CFG, sigma_out=0.6).annular()
    return np.asarray(simulate(demo_bars(CFG), src).image)


def test_scalar_limit_matches_thin_film(aerial):
    """Zero absorption + a depth-uniform stack collapses to the thin-film
    MackResist: constant rate r means cleared depth = r * t exactly."""
    mack = MackResist()
    dr = DepthResist(mack=mack, absorbance_per_um=0.0, nz=8)
    depth_3d = np.asarray(dr.cleared_depth_nm(aerial))
    depth_thin = np.clip(np.asarray(mack.cleared_depth_nm(aerial)),
                         0.0, mack.thickness_nm)
    np.testing.assert_allclose(depth_3d, depth_thin, rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(dr.develop_binary(aerial)),
                                  np.asarray(mack.develop_binary(aerial)))


def test_absorption_slows_clearing(aerial):
    clear = DepthResist(absorbance_per_um=0.0)
    dark = DepthResist(absorbance_per_um=5.0)
    d_clear = np.asarray(clear.cleared_depth_nm(aerial))
    d_dark = np.asarray(dark.cleared_depth_nm(aerial))
    assert (d_dark <= d_clear + 1e-6).all()
    assert d_dark.mean() < d_clear.mean()  # attenuation bites somewhere


def test_dose_monotonicity(aerial):
    dr = DepthResist()
    lo = np.asarray(dr.cleared_depth_nm(aerial, dose=0.5))
    hi = np.asarray(dr.cleared_depth_nm(aerial, dose=1.5))
    assert (hi >= lo - 1e-6).all()
    assert hi.mean() > lo.mean()


def test_cleared_depth_bounded(aerial):
    dr = DepthResist()
    d = np.asarray(dr.cleared_depth_nm(aerial, dose=50.0))
    assert (d >= 0).all() and (d <= dr.mack.thickness_nm + 1e-3).all()
    assert np.asarray(dr.height_map_nm(aerial)).min() >= -1e-3


def test_film_defocus_grid():
    dr = DepthResist(nz=4)
    z = dr.depths_nm
    assert len(z) == 4 and z[0] > 0 and z[-1] < dr.mack.thickness_nm
    df = dr.film_defocus_nm(n_resist=1.7)
    # symmetric about mid-film, compressed by the resist index
    np.testing.assert_allclose(df + df[::-1], 0.0, atol=1e-9)
    assert np.ptp(df) == pytest.approx(np.ptp(z) / 1.7)


def test_through_focus_stack_composes(aerial):
    """A real focal stack through the film: stack planes differ, and the
    developed pattern stays between the best/worst single-plane patterns."""
    from lithographysimulator_tpu.models.pupil import pupil_function
    from lithographysimulator_tpu.ops.abbe import source_points
    from lithographysimulator_tpu.ops.focus import (focus_stack_aberrations,
                                                    through_focus_images)
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum

    dr = DepthResist(nz=4, mack=MackResist(thickness_nm=400.0))
    src = np.asarray(LightSource(CFG, sigma_out=0.6).annular())
    pts = source_points(src)
    pad = (-pts.live_count) % 4
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])
    spec = mask_spectrum(demo_bars(CFG).geometry, CFG)
    stack = through_focus_images(
        spec, focus_stack_aberrations(np.zeros(5), dr.film_defocus_nm()),
        jnp.asarray(shifts), jnp.asarray(weights), CFG)
    assert stack.shape == (4, 32, 32)
    profile = np.asarray(dr.develop_binary(stack))
    assert profile.shape == (32, 32)
    assert 0 < profile.sum() < profile.size  # prints something, not everything


def test_develop_differentiable(aerial):
    dr = DepthResist()

    def loss(dose):
        return jnp.sum(dr.develop(aerial, dose))

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and float(g) > 0  # more dose clears more


def test_wrong_stack_planes_raises(aerial):
    dr = DepthResist(nz=8)
    with pytest.raises(ValueError):
        dr.latent(jnp.stack([jnp.asarray(aerial)] * 3))
