"""Absolute float64-oracle accuracy at PRODUCTION grid sizes (VERDICT r3
#2): the small-grid certification in test_accuracy.py never executes the
code paths production runs — the windowed zoom-DFT at w > 768 routes
through the split-K int8 row kernel, and w > 1400 additionally takes the
batch split + f32 row fallback (ops/abbe.py:279-312). A sparse ~8-point
source keeps the complex128 oracle cost linear and small while the
framework executes exactly its production kernels (window size is set by
the GRID, not the source)."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    OpticsConfig,
    abbe_image,
    demo_bars,
    pupil_function,
    spectrum_fft,
)

from . import numpy_oracle as oracle
from .conftest import normalized_rms as nrms

AB = np.asarray([0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01], np.float32)


def _sparse_source(n: int, count: int = 8) -> np.ndarray:
    """~count scattered on-pixels within the windowed-path shift bound
    (|shift| <= n/4 - 2), spanning on-axis, mid-ring, and near-bound."""
    src = np.zeros((n, n), np.float32)
    b = n // 4 - 2
    pts = [(0, 0), (b, 0), (0, -b), (-(b // 2), b // 2),
           (b // 3, b // 3), (-b, -(b // 4)), (7, -29), (-53, 11)]
    for dy, dx in pts[:count]:
        src[n // 2 + dy, n // 2 + dx] = 1.0
    return src


def _case(n: int, engine: str, tol: float):
    cfg = OpticsConfig(pixel_number=n)
    geom = np.asarray(demo_bars(cfg).geometry)
    src = _sparse_source(n)
    ours = np.asarray(abbe_image(
        spectrum_fft(geom, cfg), pupil_function(AB, cfg), src, cfg,
        engine=engine, chunk=4))
    ref = oracle.abbe64(geom, src, AB, pixel_size=cfg.pixel_size,
                        wavelength=cfg.wavelength, na=cfg.na)
    err = nrms(ours, ref)
    assert err < tol, f"{n}^2 {engine}: nRMS {err:.3e} vs oracle"


@pytest.mark.parametrize("engine", ["fft", "matmul", "int8"])
def test_1024_sparse_source_vs_float64(engine):
    """1024^2 absolute accuracy per engine (w = 520: standard int8 row
    kernel), <= 1e-6 normalized RMS vs the complex128 oracle."""
    _case(1024, engine, 1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["matmul", "int8"])
def test_2048_sparse_source_vs_float64(engine):
    """2048^2 absolute accuracy: w = 1032 > 768 routes the int8 engine
    through the SPLIT-K row kernel (interpret mode on CPU) — the exact
    branch the TPU benchmark runs."""
    _case(2048, engine, 1e-6)


@pytest.mark.slow
def test_w_gt_1400_batch_split_vs_float64():
    """n = 2816 gives w = 1416 > 1400: the int8 engine takes the
    batch-split + f32-row-transform fallback (ops/abbe.py:279-284) — pin
    that branch against the oracle too (2 points keep it affordable)."""
    from lithographysimulator_tpu.ops.abbe import _window_size

    n = 2816
    assert _window_size(n) > 1400
    cfg = OpticsConfig(pixel_number=n)
    geom = np.asarray(demo_bars(cfg).geometry)
    src = np.zeros((n, n), np.float32)
    src[n // 2, n // 2] = 1.0
    src[n // 2 + 100, n // 2 - 64] = 1.0
    ours = np.asarray(abbe_image(
        spectrum_fft(geom, cfg), pupil_function(AB, cfg), src, cfg,
        engine="int8", chunk=2))
    ref = oracle.abbe64(geom, src, AB, pixel_size=cfg.pixel_size,
                        wavelength=cfg.wavelength, na=cfg.na)
    err = nrms(ours, ref)
    assert err < 1e-6, f"2816^2 int8 batch-split: nRMS {err:.3e}"
