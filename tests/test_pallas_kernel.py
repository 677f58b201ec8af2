"""Pallas fused intensity kernel (interpret mode on CPU)."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    abbe_image,
    demo_bars,
    pupil_function,
    spectrum_fft,
)
from lithographysimulator_tpu.ops.kernels.intensity import (
    fused_column_transform_intensity,
    reference_column_transform_intensity,
)


def test_kernel_matches_reference_impl():
    rng = np.random.default_rng(0)
    b, n = 4, 128
    y = (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))).astype(np.complex64)
    t = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))).astype(np.complex64)
    w = rng.random(b).astype(np.float32)
    ref = np.asarray(reference_column_transform_intensity(y, t, w))
    out = np.asarray(fused_column_transform_intensity(
        y, t, w, tile_m=64, tile_n=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5 * ref.max())


def test_pallas_engine_end_to_end():
    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(1), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.4).classical())
    a = np.asarray(abbe_image(spec, pup, src, cfg, engine="matmul"))
    b = np.asarray(abbe_image(spec, pup, src, cfg, engine="pallas"))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5 * a.max())


def test_kernel_rejects_bad_tiles():
    y = np.zeros((2, 100, 100), np.complex64)
    t = np.zeros((100, 100), np.complex64)
    w = np.ones(2, np.float32)
    with pytest.raises(ValueError):
        fused_column_transform_intensity(y, t, w, tile_m=64, tile_n=64,
                                         interpret=True)
