"""Eikonal development-front solver + DepthResist lateral development,
standing waves, and PEB diffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig, demo_bars, simulate
from lithographysimulator_tpu.models.resist import DepthResist, MackResist
from lithographysimulator_tpu.ops.eikonal import arrival_times

CFG = OpticsConfig(pixel_number=32)
PX = CFG.pixel_size


@pytest.fixture(scope="module")
def aerial():
    src = LightSource(CFG, sigma_out=0.6).annular()
    return np.asarray(simulate(demo_bars(CFG), src).image)


# -- solver unit tests --------------------------------------------------------


def test_uniform_medium_vertical_exact():
    """Constant slowness, laterally uniform: t at slab bottom k is exactly
    s * (k+1) * hz (the lateral Godunov terms vanish at convergence)."""
    s = 0.37
    hz, hxy = 12.5, 25.0
    slow = np.full((6, 8, 8), s, np.float32)
    t = np.asarray(arrival_times(slow, (hz, hxy, hxy), iterations=12))
    expect = np.broadcast_to((s * hz * (np.arange(6) + 1.0))[:, None, None],
                             t.shape)
    np.testing.assert_allclose(t, expect, rtol=1e-6)


def test_barrier_undercut():
    """A slow slab with a single hole: voxels below the barrier are reached
    laterally through the hole (undercut), with arrival increasing with
    lateral distance from the hole."""
    nz, n = 6, 16
    slow = np.full((nz, n, n), 0.1, np.float32)
    slow[2] = 1e3          # nearly impenetrable barrier slab...
    slow[2, 8, 8] = 0.1    # ...with a hole at (8, 8)
    t = np.asarray(arrival_times(slow, (10.0, 10.0, 10.0), iterations=80))
    below = t[3]
    assert below[8, 8] < 1e3          # straight through the hole
    assert below[8, 12] < 2e3         # reached laterally, not through barrier
    # monotone in lateral distance from the hole along a row
    d = below[8, 8:14]
    assert np.all(np.diff(d) > 0)
    # far corner is reached later than near the hole
    assert below[0, 0] > below[8, 9]


def test_truncated_iterations_upper_bound():
    """Fewer sweeps can only leave times higher (truncation under-etches)."""
    rng = np.random.default_rng(0)
    slow = rng.uniform(0.05, 1.0, size=(5, 12, 12)).astype(np.float32)
    t_few = np.asarray(arrival_times(slow, (10.0, 25.0, 25.0), iterations=4))
    t_many = np.asarray(arrival_times(slow, (10.0, 25.0, 25.0), iterations=40))
    assert (t_few >= t_many - 1e-5).all()


def test_anisotropic_spacing():
    """Halving the lateral pitch halves lateral travel time."""
    nz, n = 2, 16
    slow = np.full((nz, n, n), 1.0, np.float32)
    slow[0] = 1e3            # top slab is a barrier...
    slow[0, :, 0] = 1.0      # ...except the first column
    t_wide = np.asarray(arrival_times(slow, (1.0, 8.0, 8.0), iterations=40))
    t_narrow = np.asarray(arrival_times(slow, (1.0, 4.0, 4.0), iterations=40))
    # bottom slab, far column: reached laterally along the bottom slab
    ratio = (t_wide[1, 8, 10] - t_wide[1, 8, 0]) / (
        t_narrow[1, 8, 10] - t_narrow[1, 8, 0])
    assert ratio == pytest.approx(2.0, rel=0.05)


# -- DepthResist lateral development ------------------------------------------


def test_lateral_matches_vertical_when_uniform():
    """Laterally uniform exposure: the eikonal front is a flat plane and the
    arrival times equal the vertical chain cumsum(dz / r) exactly."""
    dr = DepthResist(nz=8)
    img = np.full((16, 16), 0.7, np.float32)
    t = np.asarray(dr.arrival_times(img, pixel_size_nm=PX, normalize=False))
    m = np.asarray(dr.latent(img, normalize=False))
    rate = np.asarray(dr.mack.development_rate(m))
    dz = dr.mack.thickness_nm / dr.nz
    np.testing.assert_allclose(t, np.cumsum(dz / rate, axis=0), rtol=1e-5)
    d_lat = np.asarray(dr.cleared_depth_nm_lateral(img, pixel_size_nm=PX,
                                                   normalize=False))
    d_ver = np.asarray(dr.cleared_depth_nm(img, normalize=False))
    np.testing.assert_allclose(d_lat, d_ver, rtol=1e-5, atol=1e-3)


def test_lateral_clears_at_least_vertical(aerial):
    """More propagation paths can only speed the front: eikonal clearing
    dominates column-wise clearing, and beats it near feature edges."""
    dr = DepthResist(nz=8)
    d_lat = np.asarray(dr.cleared_depth_nm_lateral(aerial, pixel_size_nm=PX))
    d_ver = np.asarray(dr.cleared_depth_nm(aerial))
    assert (d_lat >= d_ver - 1e-3).all()
    assert d_lat.sum() > d_ver.sum() + 1.0  # lateral etch bites somewhere


def test_develop_profile_shapes_and_range(aerial):
    dr = DepthResist(nz=8)
    prof = np.asarray(dr.develop_profile(aerial, pixel_size_nm=PX))
    assert prof.shape == (8, 32, 32)
    assert (prof >= 0).all() and (prof <= 1).all()
    hard = np.asarray(dr.develop_profile_binary(aerial, pixel_size_nm=PX))
    assert set(np.unique(hard)) <= {0.0, 1.0}
    # deeper slabs clear no more than shallower ones in cleared-volume terms
    assert hard[0].sum() >= hard[-1].sum()


@pytest.mark.slow
def test_lateral_develop_differentiable(aerial):
    dr = DepthResist(nz=4)

    def loss(dose):
        return jnp.sum(dr.develop_profile(aerial, dose, pixel_size_nm=PX,
                                          iterations=12))

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and float(g) > 0


def test_lateral_counts_voids_under_barrier():
    """A buried cleared region under an intact top slab (reached laterally
    through a hole) must count toward removed thickness — the cumulative-
    inverse form assigned such voids zero."""
    mack = MackResist(thickness_nm=100.0, develop_s=5.0)
    dr = DepthResist(mack=mack, nz=4, absorbance_per_um=0.0)
    n = 16
    stack = np.zeros((4, n, n), np.float32)  # top slab dark (slow)...
    stack[0, 8, 8] = 1.0                     # ...except one hole
    stack[1:] = 1.0                          # bright (fast) below
    d = np.asarray(dr.cleared_depth_nm_lateral(
        stack, pixel_size_nm=10.0, normalize=False, iterations=60))
    dz = mack.thickness_nm / dr.nz
    # columns away from the hole: top intact, but buried slabs cleared via
    # the lateral path -> at least one slab's thickness removed
    assert d[8, 12] > dz
    # and the top slab there really is intact (vertical-only barely etches)
    d_vert = np.asarray(dr.cleared_depth_nm(stack, normalize=False))
    assert d_vert[8, 12] < 2.0


def test_surface_inhibition(aerial):
    """Surface inhibition slows clearing (strictly, near the top) and
    factor=1 is an exact no-op; the eikonal path sees the same rates."""
    base = DepthResist(nz=8)
    inhib = DepthResist(nz=8, surface_rate_factor=0.2, inhibition_depth_nm=40.0)
    d0 = np.asarray(base.cleared_depth_nm(aerial))
    d1 = np.asarray(inhib.cleared_depth_nm(aerial))
    assert (d1 <= d0 + 1e-6).all() and d1.mean() < d0.mean()
    f = inhib.rate_depth_factor()
    assert f[0] < f[-1] < 1.0  # suppressed most at the surface
    np.testing.assert_array_equal(DepthResist(nz=8).rate_depth_factor(), 1.0)
    t0 = np.asarray(base.arrival_times(aerial, pixel_size_nm=PX, iterations=12))
    t1 = np.asarray(inhib.arrival_times(aerial, pixel_size_nm=PX, iterations=12))
    assert (t1 >= t0 - 1e-5).all()  # inhibited fronts arrive no earlier


# -- standing waves + PEB ------------------------------------------------------


def test_depth_profile_beer_lambert_regression():
    """R = 0 recovers pure Beer-Lambert attenuation (round-2 behavior)."""
    dr = DepthResist(absorbance_per_um=2.0, substrate_reflectivity=0.0, nz=16)
    np.testing.assert_allclose(
        dr.depth_profile(), np.exp(-2.0e-3 * dr.depths_nm), rtol=1e-12)


def test_standing_wave_period():
    """Standing-wave oscillation period through depth is lambda / (2 n)."""
    dr = DepthResist(mack=MackResist(thickness_nm=400.0), nz=256,
                     absorbance_per_um=0.2, substrate_reflectivity=0.3,
                     n_resist=1.7, wavelength_nm=193.0)
    d = dr.depth_profile()
    z = dr.depths_nm
    interior = slice(2, -2)
    peaks = [i for i in range(1, len(d) - 1)
             if d[i] > d[i - 1] and d[i] > d[i + 1]][1:-1]
    spacing = np.diff(z[peaks]).mean()
    assert spacing == pytest.approx(193.0 / (2 * 1.7), rel=0.05)
    assert np.ptp(d[interior]) > 0.1  # the swing is material, not noise


def test_peb_smooths_standing_waves():
    """PEB diffusion damps the standing-wave modulation of the latent image;
    a uniform latent image is invariant (mean-preserving blur)."""
    kw = dict(mack=MackResist(thickness_nm=400.0), nz=64,
              absorbance_per_um=0.2, substrate_reflectivity=0.3)
    img = np.full((8, 8), 0.8, np.float32)
    m_raw = np.asarray(DepthResist(**kw).latent(img, normalize=False))
    m_peb = np.asarray(DepthResist(**kw, peb_diffusion_nm=30.0).latent(
        img, normalize=False, pixel_size_nm=PX))
    assert m_peb.std(axis=0).mean() < 0.5 * m_raw.std(axis=0).mean()
    # uniform-in-depth latent is unchanged by the blur
    flat = DepthResist(nz=8, absorbance_per_um=0.0, peb_diffusion_nm=30.0)
    m_flat = np.asarray(flat.latent(img, normalize=False, pixel_size_nm=PX))
    np.testing.assert_allclose(m_flat, m_flat[0, 0, 0], rtol=1e-5)


def test_peb_requires_pixel_size():
    dr = DepthResist(peb_diffusion_nm=10.0)
    with pytest.raises(ValueError):
        dr.latent(np.ones((8, 8), np.float32))
