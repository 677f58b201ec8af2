"""Contour tracing + GDS export: exact raster round trip.

No reference counterpart (the reference has no IO); the oracle is the
native rasterizer — re-rasterizing the traced polygons must reproduce the
binary raster bit-for-bit.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig
from lithographysimulator_tpu.io.contours import (contours_to_gds,
                                                  rasterize_loops,
                                                  trace_contours)
from lithographysimulator_tpu.io.native import rasterize


def _roundtrip(binary, pixel_size=10.0):
    loops = trace_contours(binary, pixel_size=pixel_size)
    grid = rasterize_loops(loops, pixel_size=pixel_size, n=binary.shape[0])
    return loops, grid


def test_rectangle_is_four_vertices():
    m = np.zeros((32, 32))
    m[8:20, 4:14] = 1
    loops, grid = _roundtrip(m)
    assert len(loops) == 1
    assert loops[0].shape == (4, 2)
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_multiple_components_roundtrip():
    rng = np.random.default_rng(0)
    m = np.zeros((48, 48))
    m[4:12, 4:20] = 1
    m[20:40, 8:12] = 1
    m[30:34, 30:44] = 1
    m[44:46, 2:4] = 1
    loops, grid = _roundtrip(m)
    assert len(loops) == 4
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_hole_roundtrip():
    m = np.zeros((32, 32))
    m[4:28, 4:28] = 1
    m[12:20, 12:20] = 0  # hole
    loops, grid = _roundtrip(m)
    assert len(loops) == 2
    # outer CCW (positive signed area), hole CW (negative)
    def signed_area(xy):
        x, y = xy[:, 0], xy[:, 1]
        return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    areas = sorted(signed_area(l) for l in loops)
    assert areas[0] < 0 < areas[1]
    # XOR semantics: rasterizer even-odd fills reproduce the donut
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_checkerboard_corner_keeps_components_separate():
    m = np.zeros((8, 8))
    m[2:4, 2:4] = 1
    m[4:6, 4:6] = 1  # touches only at the corner (4, 4)
    loops, grid = _roundtrip(m)
    assert len(loops) == 2  # NOT one self-touching bowtie loop
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_random_blobs_roundtrip():
    rng = np.random.default_rng(3)
    noise = rng.random((64, 64))
    # smooth to get blobby regions with concavities and holes
    k = np.ones((5, 5)) / 25.0
    sm = np.real(np.fft.ifft2(np.fft.fft2(noise) *
                              np.fft.fft2(k, s=noise.shape)))
    m = (sm > np.median(sm)).astype(np.float64)
    loops, grid = _roundtrip(m)
    assert loops
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_empty_and_full():
    assert trace_contours(np.zeros((8, 8))) == []
    loops, grid = _roundtrip(np.ones((8, 8)))
    assert len(loops) == 1
    assert (grid > 0.5).all()


def test_gds_export_roundtrip(tmp_path):
    from lithographysimulator_tpu.io.gdsii import read_gds

    cfg = OpticsConfig(pixel_number=32, pixel_size=10.0)
    m = np.zeros((32, 32))
    m[6:18, 6:26] = 1
    m[22:28, 10:14] = 1
    path = tmp_path / "contour.gds"
    contours_to_gds(path, m, cfg, layer=7)
    lib = read_gds(path)
    polys = [p.xy_nm for p in lib.flatten("CONTOUR") if p.layer == 7]
    assert len(polys) == 2
    grid = rasterize_loops(polys, pixel_size=cfg.pixel_size, n=32)
    np.testing.assert_array_equal(grid > 0.5, m > 0.5)


def test_native_tracer_matches_python_fallback(monkeypatch):
    """The C++ stitching walk and the pure-python reference produce the
    same loop SET (order and start vertex may differ): compare via the
    XOR reconstruction and via sorted canonical loop forms."""
    import lithographysimulator_tpu.io.contours as cmod
    import lithographysimulator_tpu.io.native as nmod

    if not nmod.native_available():
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(9)
    k = np.ones((5, 5)) / 25.0
    for seed in range(3):
        noise = np.random.default_rng(seed).random((48, 48))
        sm = np.real(np.fft.ifft2(np.fft.fft2(noise) *
                                  np.fft.fft2(k, s=noise.shape)))
        m = (sm > np.median(sm)).astype(np.float64)

        native = trace_contours(m, pixel_size=3.0)
        monkeypatch.setattr(nmod, "trace_loops_native", lambda arr: None)
        python = trace_contours(m, pixel_size=3.0)
        monkeypatch.undo()

        assert len(native) == len(python)

        def canon(loop):
            pts = [tuple(v) for v in np.asarray(loop, np.int64).tolist()]
            best = min(range(len(pts)), key=lambda i: pts[i])
            return tuple(pts[best:] + pts[:best])

        scaled = lambda loops: sorted(canon(l / 3.0) for l in loops)
        assert scaled(native) == scaled(python)
        np.testing.assert_array_equal(
            rasterize_loops(native, pixel_size=3.0, n=48),
            rasterize_loops(python, pixel_size=3.0, n=48))
