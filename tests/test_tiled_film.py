"""Full-chip rigorous image-in-resist: tiled film stack vs single field.

The tiled path must agree with the single-field film-SOCS apply on any
feature whose optical neighborhood lies inside one tile core — the same
halo-sufficiency contract as the aerial tiled path (test_tiled.py), held
per resist slab.
"""

import numpy as np
import pytest

import lithographysimulator_tpu as lt
from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    WaferStack,
    tiled_film_stack,
)
from lithographysimulator_tpu.models.resist import DepthResist, MackResist
from lithographysimulator_tpu.simulate import film_socs_kernels, film_socs_stack

TILE_CFG = OpticsConfig(pixel_number=128)
BARC = 1.82 + 0.39j


@pytest.fixture(scope="module")
def resist():
    return DepthResist(mack=MackResist(thickness_nm=120.0), nz=3,
                       n_resist=1.71, absorbance_per_um=0.5)


@pytest.fixture(scope="module")
def wafer(resist):
    return WaferStack.from_resist(resist, under_layers=((37.0, BARC),))


@pytest.fixture(scope="module")
def src():
    return np.asarray(LightSource(TILE_CFG, sigma_out=0.6).classical())


@pytest.fixture(scope="module")
def kernels(src, wafer, resist):
    return film_socs_kernels(src, config=TILE_CFG, wafer_stack=wafer,
                             resist=resist, rank=48)


def test_isolated_feature_matches_single_field(kernels, src, resist):
    """Contact fully inside tile (1,1)'s core: every slab of the tiled
    stack equals the single-field film_socs_stack on that core."""
    n, halo = TILE_CFG.n, 32
    step = n - 2 * halo

    field = np.zeros((n, n), np.float32)
    field[60:68, 60:68] = 1.0
    direct = np.asarray(film_socs_stack(
        field, kernels, config=TILE_CFG, source_total=float(src.sum())))

    big = np.zeros((256, 256), np.float32)
    oy = 1 * step - halo
    big[oy + 60 : oy + 68, oy + 60 : oy + 68] = 1.0
    tiled = np.asarray(tiled_film_stack(
        big, kernels, TILE_CFG, source_total=float(src.sum()), halo=halo))

    assert tiled.shape == (resist.nz, 256, 256)
    core_direct = direct[:, halo : halo + step, halo : halo + step]
    core_tiled = tiled[:, 1 * step : 2 * step, 1 * step : 2 * step]
    np.testing.assert_allclose(core_tiled, core_direct, rtol=1e-4,
                               atol=1e-4 * core_direct.max())
    # the stack is a real depth series: slabs differ (absorption + standing
    # waves), so a collapsed/broadcast stack would be a bug
    assert np.abs(core_tiled[0] - core_tiled[-1]).max() > 1e-3 * core_tiled.max()


def test_tiling_offset_invariance(kernels, src):
    """Seam positions (halo choice) must not change the stitched stack
    beyond PSF-tail truncation, at every depth."""
    rng = np.random.default_rng(3)
    big = np.zeros((256, 256), np.float32)
    for _ in range(12):
        y, x = rng.integers(8, 244, 2)
        big[y : y + 6, x : x + 6] = 1.0
    big[40:216, 120:126] = 1.0
    a = np.asarray(tiled_film_stack(big, kernels, TILE_CFG, halo=32,
                                    source_total=float(src.sum())))
    b = np.asarray(tiled_film_stack(big, kernels, TILE_CFG, halo=40,
                                    source_total=float(src.sum())))
    rel = np.sqrt(np.mean((a - b) ** 2)) / b.max()
    assert rel < 4e-3


def test_empty_mask_and_validation(kernels):
    stack = np.asarray(tiled_film_stack(
        np.zeros((256, 256), np.float32), kernels, TILE_CFG, halo=32,
        source_total=1.0))
    assert stack.shape == (len(kernels), 256, 256)
    assert np.abs(stack).max() == 0.0

    with pytest.raises(ValueError, match="source_total"):
        tiled_film_stack(np.zeros((256, 256), np.float32), kernels, TILE_CFG)
    with pytest.raises(ValueError, match="non-empty"):
        tiled_film_stack(np.zeros((256, 256), np.float32), [], TILE_CFG,
                         source_total=1.0)
