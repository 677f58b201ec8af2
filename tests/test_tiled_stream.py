"""Streaming tiled imaging: full-chip images without a full-chip raster."""

import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig
from lithographysimulator_tpu.io.native import rasterize
from lithographysimulator_tpu.io.layout import window_provider
from lithographysimulator_tpu.ops.tiled import (array_window_fn,
                                                tiled_socs_image,
                                                tiled_socs_image_stream)
from lithographysimulator_tpu.simulate import _compiled_socs_build

TILE_CFG = OpticsConfig(pixel_number=64)
BIG_N = 160  # not a multiple of the tile step: exercises edge windows


@pytest.fixture(scope="module")
def socs():
    src = np.asarray(LightSource(TILE_CFG, sigma_out=0.6).annular())
    return _compiled_socs_build(TILE_CFG, 48)(np.zeros(5, np.float32), src)[0]


def test_stream_matches_array_path(socs):
    rng = np.random.default_rng(0)
    mask = (rng.random((BIG_N, BIG_N)) > 0.6).astype(np.float32)
    dense = np.asarray(tiled_socs_image(mask, socs, TILE_CFG, halo=16))
    streamed = np.asarray(tiled_socs_image_stream(
        array_window_fn(mask, TILE_CFG.n), BIG_N, socs, TILE_CFG, halo=16))
    np.testing.assert_allclose(streamed, dense, rtol=0, atol=1e-6 * dense.max())


def test_polygon_provider_matches_full_raster(socs):
    """Streamed window rasterization is bit-identical to slicing one big
    raster, so the streamed image equals the dense tiled image."""
    px = TILE_CFG.pixel_size
    polygons = []
    rng = np.random.default_rng(1)
    for _ in range(25):
        x0, y0 = rng.uniform(5 * px, (BIG_N - 25) * px, 2)
        w, h = rng.uniform(3 * px, 18 * px, 2)
        polygons.append([(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                         (x0, y0 + h)])
    origin = (0.0, 0.0)
    full = rasterize(polygons, origin=origin, pixel_size=px, n=BIG_N)
    window_fn = window_provider(polygons, TILE_CFG, BIG_N, origin=origin)

    # window == slice of the big raster wherever they overlap
    win = window_fn(32, 48)
    np.testing.assert_array_equal(win, full[32:32 + 64, 48:48 + 64])
    # negative offsets: out-of-chip halo must still rasterize consistently
    win = window_fn(-16, -16)
    np.testing.assert_array_equal(win[16:, 16:], full[:48, :48])

    dense = np.asarray(tiled_socs_image(full, socs, TILE_CFG, halo=16))
    streamed = np.asarray(tiled_socs_image_stream(
        window_fn, BIG_N, socs, TILE_CFG, halo=16))
    np.testing.assert_allclose(streamed, dense, rtol=0, atol=1e-6 * dense.max())


def test_empty_layout_images_to_zero(socs):
    window_fn = window_provider([], TILE_CFG, BIG_N, origin=(0.0, 0.0))
    img = np.asarray(tiled_socs_image_stream(
        window_fn, BIG_N, socs, TILE_CFG, halo=16))
    assert img.shape == (BIG_N, BIG_N)
    np.testing.assert_array_equal(img, 0.0)
