"""Vector (Jones-pupil, high-NA) imaging: scalar-limit regression,
radiometry, symmetry, and API wiring."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    demo_bars,
    from_array,
    polarization_states,
    pupil_function,
    simulate,
    spectrum_fft,
    vector_abbe_image,
    vector_pupils,
)
from lithographysimulator_tpu.parallel import padded_source_arrays


def _setup(na, n=32):
    cfg = OpticsConfig(pixel_number=n, na=na)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    shifts, weights, _ = padded_source_arrays(src, 4)
    ms = int(np.abs(np.asarray(shifts)).max())
    return cfg, spec, pup, shifts, weights, ms


def _nrms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a = a / a.max()
    b = b / b.max()
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.slow
def test_scalar_limit_low_na():
    """Unpolarized vector image converges to the scalar image as NA -> 0
    (vector corrections are O((NA rho)^2))."""
    from lithographysimulator_tpu import abbe_image_points

    errs = []
    for na in (0.9, 0.5, 0.1):
        cfg, spec, pup, shifts, weights, ms = _setup(na)
        scalar = abbe_image_points(spec, pup, shifts, weights, cfg,
                                   max_abs_shift=ms)
        vector = vector_abbe_image(spec, pup, shifts, weights, cfg,
                                   polarization="unpolarized", apodize=False,
                                   max_abs_shift=ms)
        errs.append(_nrms(vector, scalar))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 2e-2  # NA=0.1: (NA*rho)^2 <= 1e-2 corrections


def test_vector_pupil_identity_at_zero_na_limit():
    cfg = OpticsConfig(pixel_number=32, na=1e-4)
    pup = pupil_function(np.zeros(1), cfg)
    comps = np.asarray(vector_pupils(pup, cfg, (1.0, 0.0), apodize=False))
    np.testing.assert_allclose(comps[0], np.asarray(pup), atol=1e-6)
    assert np.abs(comps[1]).max() < 1e-3  # cross-pol vanishes
    assert np.abs(comps[2]).max() < 1e-3  # z-component vanishes


def test_unpolarized_is_mean_of_x_and_y():
    cfg, spec, pup, shifts, weights, ms = _setup(0.85)
    args = (spec, pup, shifts, weights, cfg)
    ix = np.asarray(vector_abbe_image(*args, polarization="x",
                                      max_abs_shift=ms))
    iy = np.asarray(vector_abbe_image(*args, polarization="y",
                                      max_abs_shift=ms))
    iu = np.asarray(vector_abbe_image(*args, polarization="unpolarized",
                                      max_abs_shift=ms))
    np.testing.assert_allclose(iu, 0.5 * (ix + iy), rtol=1e-5,
                               atol=1e-5 * iu.max())


def test_x_y_polarizations_related_by_rotation():
    """For a 90-degree-symmetric mask and source, the y-polarized image is
    the 90-degree rotation of the x-polarized image."""
    cfg = OpticsConfig(pixel_number=32, na=0.9)
    geom = np.zeros((32, 32), np.float32)
    geom[12:20, 12:20] = 1.0  # centered square: 4-fold symmetric
    spec = spectrum_fft(geom, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.4).classical())
    shifts, weights, _ = padded_source_arrays(src, 4)
    ix = np.asarray(vector_abbe_image(spec, pup, shifts, weights, cfg,
                                      polarization="x"))
    iy = np.asarray(vector_abbe_image(spec, pup, shifts, weights, cfg,
                                      polarization="y"))
    # rotate by 90 degrees about the array center (grid center at n/2 for
    # even n is off by one sample row/col; compare the interior)
    iy_rot = np.rot90(iy)
    assert _nrms(ix[2:-2, 2:-2], iy_rot[2:-2, 2:-2]) < 2e-2


def test_z_component_energy_grows_with_na():
    def z_fraction(na):
        cfg, spec, pup, shifts, weights, ms = _setup(na)
        comps = vector_pupils(pup, cfg, (1.0, 0.0), apodize=False)
        from lithographysimulator_tpu import abbe_image_points

        tot = [float(np.asarray(abbe_image_points(
            spec, comps[c], shifts, weights, cfg, max_abs_shift=ms)).sum())
            for c in range(3)]
        return tot[2] / sum(tot)

    lo = z_fraction(0.4)
    hi = z_fraction(0.95)
    assert hi > lo > 0.0
    assert hi > 0.02  # z light is a real effect at NA ~ 0.95


def test_polarization_states_parsing():
    assert polarization_states("x") == [(1.0, (1.0, 0.0))]
    (w, (jx, jy)), = polarization_states((1.0, 1.0))
    assert w == 1.0 and abs(abs(jx) ** 2 + abs(jy) ** 2 - 1.0) < 1e-12
    assert len(polarization_states("unpolarized")) == 2
    with pytest.raises(ValueError):
        polarization_states("circularish")
    with pytest.raises(ValueError):
        polarization_states((0.0, 0.0))


@pytest.mark.slow
def test_simulate_polarization_api():
    cfg = OpticsConfig(pixel_number=32, na=0.9)
    src = LightSource(cfg, sigma_out=0.5).classical()
    res = simulate(demo_bars(cfg), src, polarization="unpolarized",
                   normalize=True)
    assert res.report["polarization"] == "unpolarized"
    img = np.asarray(res.image)
    assert img.min() >= 0 and img.max() > 0
    scalar = np.asarray(simulate(demo_bars(cfg), src, normalize=True).image)
    # same physics family: peak within ~20% even at NA 0.9
    assert _nrms(img, scalar) < 0.1

    # polarized SOCS fast path (round 3): same physics through the vector
    # kernel build — must agree with the exact vector Abbe path
    res_socs = simulate(demo_bars(cfg), src, solver="socs",
                        polarization="unpolarized", normalize=True)
    assert _nrms(np.asarray(res_socs.image), img) < 2e-3
    assert res_socs.report["socs_rank"] > 0


def test_immersion_restores_hyper_na_pupil():
    """Dry NA=1.35 is unphysical: pupil positions with NA*rho >= 1 are
    evanescent and cut. Water immersion (n=1.437) makes the whole pupil
    propagate again."""
    from lithographysimulator_tpu.ops.vector import _vector_factors

    dry = OpticsConfig(pixel_number=32, na=1.35)
    wet = OpticsConfig(pixel_number=32, na=1.35, immersion_index=1.437)
    v_dry, inside_dry = _vector_factors(dry, False)
    v_wet, inside_wet = _vector_factors(wet, False)
    assert inside_dry.sum() < inside_wet.sum()  # TIR cutoff bites dry only
    # the dry cutoff sits at rho = 1/1.35
    from lithographysimulator_tpu.grid import Grid

    rho = np.hypot(Grid(dry).sigma[None, :], Grid(dry).sigma[:, None])
    np.testing.assert_array_equal(inside_dry, (rho <= 1.0) & (1.35 * rho < 1.0 - 1e-12))
    np.testing.assert_array_equal(inside_wet, rho <= 1.0)
    # evanescent region carries no field
    assert np.abs(v_dry[:, :, ~inside_dry]).max() == 0.0


def test_immersion_index_one_unchanged():
    """immersion_index=1 reproduces the pre-immersion vector pupils exactly
    at sub-unity NA (sin = NA*rho < 1 everywhere inside)."""
    from lithographysimulator_tpu.ops.vector import _vector_factors

    a = OpticsConfig(pixel_number=32, na=0.9)
    b = OpticsConfig(pixel_number=32, na=0.9, immersion_index=1.0)
    va, _ = _vector_factors(a, True)
    vb, _ = _vector_factors(b, True)
    np.testing.assert_array_equal(va, vb)


def test_immersion_imaging_end_to_end():
    cfg = OpticsConfig(pixel_number=32, na=1.35, immersion_index=1.437)
    geom = np.zeros((32, 32), np.float32)
    geom[12:20, 12:20] = 1.0
    spec = spectrum_fft(geom, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    shifts, weights, _ = padded_source_arrays(src, 4)
    img = np.asarray(vector_abbe_image(spec, pup, shifts, weights, cfg,
                                       polarization="unpolarized"))
    assert np.isfinite(img).all() and img.max() > 0
    # hyper-NA in water keeps a substantial z-component
    iz = np.asarray(vector_abbe_image(
        spec, pup, shifts, weights, cfg, polarization="x"))
    assert iz.max() > 0


def test_bad_immersion_index_rejected():
    import pytest

    with pytest.raises(ValueError):
        OpticsConfig(pixel_number=32, immersion_index=0.9)
