"""xfer helpers + pattern-fidelity metrics."""

import numpy as np

from lithographysimulator_tpu import OpticsConfig, ResistModel, demo_bars
from lithographysimulator_tpu.models.resist import pattern_fidelity
from lithographysimulator_tpu.xfer import to_device_complex, to_host_complex


def test_complex_roundtrip():
    rng = np.random.default_rng(0)
    arr = (rng.normal(size=(16, 16)) + 1j * rng.normal(size=(16, 16))).astype(np.complex64)
    dev = to_device_complex(arr)
    assert dev.dtype == np.complex64
    back = to_host_complex(dev)
    np.testing.assert_allclose(back, arr, rtol=1e-6)


def test_real_passthrough():
    arr = np.ones((4, 4), np.float32)
    np.testing.assert_array_equal(np.asarray(to_device_complex(arr)), arr)
    np.testing.assert_array_equal(to_host_complex(arr), arr)


def test_pattern_fidelity_perfect():
    cfg = OpticsConfig(pixel_number=32)
    g = np.asarray(demo_bars(cfg).geometry)
    m = pattern_fidelity(g, g, cfg)
    assert m["iou"] == 1.0 and m["xor_area_nm2"] == 0.0 and m["mean_epe_nm"] == 0.0


def test_pattern_fidelity_one_pixel_bias():
    cfg = OpticsConfig(pixel_number=32)
    target = np.zeros((32, 32)); target[8:24, 8:24] = 1
    printed = np.zeros((32, 32)); printed[8:24, 8:25] = 1  # one column wider
    m = pattern_fidelity(printed, target, cfg)
    assert 0 < m["mean_epe_nm"] < cfg.pixel_size
    assert m["iou"] < 1.0


def test_fidelity_of_simulated_print():
    cfg = OpticsConfig(pixel_number=64)
    from lithographysimulator_tpu import LightSource, simulate
    mask = demo_bars(cfg)
    src = LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quadrupole()
    img = simulate(mask, src, normalize=True).image
    profile = ResistModel(threshold=0.4).develop_binary(img, cfg)
    m = pattern_fidelity(profile, mask.geometry, cfg)
    assert m["iou"] > 0.5
    assert m["mean_epe_nm"] < 3 * cfg.pixel_size


def test_mack_resist_physics():
    import jax
    import jax.numpy as jnp
    from lithographysimulator_tpu import LightSource, simulate
    from lithographysimulator_tpu.models.resist import MackResist

    cfg = OpticsConfig(pixel_number=64)
    img = simulate(demo_bars(cfg),
                   LightSource(cfg, sigma_out=0.5).classical(),
                   normalize=True).image
    model = MackResist()

    # rate is monotone-decreasing in remaining inhibitor m
    m = np.linspace(0, 1, 21)
    r = np.asarray(model.development_rate(jnp.asarray(m)))
    assert np.all(np.diff(r) <= 1e-6)
    assert r[-1] >= model.r_min_nm_s - 1e-6

    # more dose clears more resist
    cleared = [float(np.asarray(model.develop_binary(img, dose)).mean())
               for dose in (0.3, 1.0, 3.0)]
    assert cleared[0] <= cleared[1] <= cleared[2]
    assert cleared[2] > 0

    # differentiable w.r.t. the image
    g = jax.grad(lambda im: model.develop(im).sum())(img)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_meef_positive_for_lines():
    from lithographysimulator_tpu import (LightSource, ResistModel,
                                          mask_spectrum, pupil_function)
    from lithographysimulator_tpu.models.resist import meef
    from lithographysimulator_tpu.ops.abbe import abbe_image_points
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg = OpticsConfig(pixel_number=64)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    shifts, weights, _ = padded_source_arrays(src, 4)
    pup = pupil_function(np.zeros(1), cfg)

    def image_fn(geometry):
        spec = mask_spectrum(np.asarray(geometry, np.float32), cfg)
        return abbe_image_points(spec, pup, shifts, weights, cfg, chunk=4,
                                 normalize=True)

    value = meef(demo_bars(cfg).geometry, image_fn, cfg,
                 ResistModel(threshold=0.4))
    assert 0.2 < value < 10.0  # wider mask lines print wider


def test_process_window():
    from lithographysimulator_tpu.models.resist import process_window

    defocus = [-100, -50, 0, 50, 100]
    doses = [0.8, 0.9, 1.0, 1.1, 1.2]
    # synthetic FEM: CD = 100 + 0.1*|defocus| + 80*(dose-1)
    cds = [[100 + 0.1 * abs(f) + 80 * (d - 1) for d in doses] for f in defocus]
    win = process_window(cds, defocus, doses, target_cd_nm=100.0,
                         tolerance=0.10)
    assert win["depth_of_focus_nm"] == 200.0  # all defocus in spec at dose 1
    assert 0.2 <= win["exposure_latitude"] <= 0.4
    assert 0 < win["in_spec_fraction"] < 1

    # Descending sweep axes give the same window (ADVICE r1: spans were
    # signed and collapsed to 0 on descending coordinates).
    win_desc = process_window(
        [row[::-1] for row in cds[::-1]], defocus[::-1], doses[::-1],
        target_cd_nm=100.0, tolerance=0.10)
    assert win_desc == win


def test_meef_edge_bias_does_not_wrap():
    from lithographysimulator_tpu.models.resist import meef

    cfg = OpticsConfig(pixel_number=16)
    # A feature touching the left field boundary: a circular roll would leak
    # its dilation onto the right edge and corrupt the finite difference.
    geom = np.zeros((16, 16), np.float32)
    geom[:, 0:3] = 1.0

    seen = []

    def image_fn(geometry):
        seen.append(np.asarray(geometry))
        # CD proxy: identity image, develop threshold picks up the geometry
        return np.asarray(geometry, np.float32)

    from lithographysimulator_tpu import ResistModel
    meef(geom, image_fn, cfg, ResistModel(threshold=0.5), bias_px=1)
    for g in seen:
        assert g[:, -1].max() == 0.0, "edge bias wrapped around the field"
