"""Tiled full-chip imaging: halo sufficiency, stitching, sharded variant."""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    default_halo,
    pupil_function,
    randomized_socs,
    tiled_socs_image,
    tiled_socs_image_scan,
)
from lithographysimulator_tpu.parallel import source_mesh, tiled_socs_image_sharded

TILE_CFG = OpticsConfig(pixel_number=128)


@pytest.fixture(scope="module")
def socs():
    src = np.asarray(LightSource(TILE_CFG, sigma_in=0.3, sigma_out=0.7).annular())
    return randomized_socs(pupil_function(np.zeros(1), TILE_CFG), src, TILE_CFG,
                           rank=48, power_iters=2)


@pytest.fixture(scope="module")
def big_mask():
    rng = np.random.default_rng(7)
    m = np.zeros((256, 256), np.float32)
    # scattered contacts + lines crossing tile seams
    for _ in range(20):
        y, x = rng.integers(8, 244, 2)
        m[y : y + 6, x : x + 6] = 1.0
    m[40:216, 120:126] = 1.0  # vertical line through the center seam
    return m


def rel_rms(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.sqrt(np.mean((a - b) ** 2)) / max(b.max(), 1e-30))


def test_default_halo_reasonable():
    # sized for production tiles (512-1024 px): ~8 lambda/NA of guard band
    cfg = OpticsConfig(pixel_number=1024)
    h = default_halo(cfg)
    assert 8 <= h < cfg.n // 2
    assert h % 8 == 0
    # tighter guard for small test tiles
    assert default_halo(TILE_CFG, wavelengths=2.0) < TILE_CFG.n // 2


@pytest.mark.slow
def test_tiling_offset_invariance(big_mask, socs):
    """Different halo choices change the tile seams; the image must not care
    (this is the halo-sufficiency / stitching-correctness test)."""
    a = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32))
    b = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=40))
    assert a.shape == (256, 256)
    # The residual is halo truncation of the PSF tails: ~2e-3 relative at a
    # 32 px halo (0.8 um), shrinking with larger halos (production tiles use
    # default_halo ~ 96 px).
    assert rel_rms(a, b) < 4e-3
    wider = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=48))
    assert rel_rms(b, wider) < rel_rms(a, wider)  # bigger halo converges


def test_empty_mask_images_to_zero(socs):
    img = np.asarray(tiled_socs_image(np.zeros((256, 256), np.float32),
                                      socs, TILE_CFG, halo=32))
    assert np.abs(img).max() == 0.0


def test_scan_variant_matches_loop(big_mask, socs):
    a = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32))
    b = np.asarray(tiled_socs_image_scan(big_mask, socs, TILE_CFG, halo=32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * a.max())


def test_isolated_feature_matches_single_field(socs):
    """A feature fully inside one tile core must image identically to the
    same feature in a standalone single-field computation."""
    from lithographysimulator_tpu import mask_spectrum, socs_image

    n, halo = TILE_CFG.n, 32
    step = n - 2 * halo
    # standalone field: contact at the field center
    field = np.zeros((n, n), np.float32)
    field[60:68, 60:68] = 1.0
    direct = np.asarray(socs_image(mask_spectrum(field, TILE_CFG), socs, TILE_CFG))

    # big mask: same contact placed so tile (1,1)'s window equals `field`
    # window origin of tile (1,1) = (step - halo + ...)
    big = np.zeros((256, 256), np.float32)
    oy = 1 * step - halo  # window start in big coords
    big[oy + 60 : oy + 68, oy + 60 : oy + 68] = 1.0
    tiled = np.asarray(tiled_socs_image(big, socs, TILE_CFG, halo=halo))

    core_direct = direct[halo : halo + step, halo : halo + step]
    core_tiled = tiled[1 * step : 2 * step, 1 * step : 2 * step]
    np.testing.assert_allclose(core_tiled, core_direct, rtol=1e-4,
                               atol=1e-4 * core_direct.max())


def test_sharded_tiles_match_local(big_mask, socs):
    mesh = source_mesh()
    a = np.asarray(tiled_socs_image_sharded(big_mask, socs, TILE_CFG, mesh,
                                            halo=32))
    b = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * b.max())


def test_non_divisible_size(socs):
    """Mask size not a multiple of the core step still works (padding)."""
    rng = np.random.default_rng(3)
    m = (rng.random((200, 200)) < 0.1).astype(np.float32)
    img = np.asarray(tiled_socs_image(m, socs, TILE_CFG, halo=32))
    assert img.shape == (200, 200)
    assert np.isfinite(img).all()


def test_tiles_per_dispatch_invariance(big_mask, socs):
    a = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32,
                                    tiles_per_dispatch=1))
    b = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32,
                                    tiles_per_dispatch=3))  # non-divisor
    c = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32,
                                    tiles_per_dispatch=64))  # > tile count
    np.testing.assert_allclose(a, b, rtol=1e-6)
    np.testing.assert_allclose(a, c, rtol=1e-6)


@pytest.mark.slow
def test_field_dependent_aberrations(big_mask):
    """Field-point-sampled tiled imaging: a constant field reduces to the
    uniform path exactly; field-varying defocus changes edge tiles while the
    center stripe (assigned the center field sample) stays identical."""
    from lithographysimulator_tpu.ops.tiled import tiled_socs_image_field

    src = np.asarray(LightSource(TILE_CFG, sigma_in=0.3, sigma_out=0.7).annular())
    base = np.zeros(5, np.float32)

    uniform = np.asarray(tiled_socs_image_field(
        big_mask, TILE_CFG, src, lambda fx, fy: base,
        field_points=1, rank=32, halo=32))
    # constant field through the multi-sample path: identical kernels, and
    # the blend weights sum to 1 -> identical image (both blend modes)
    for blend in ("nearest", "linear"):
        const3 = np.asarray(tiled_socs_image_field(
            big_mask, TILE_CFG, src, lambda fx, fy: base,
            field_points=3, rank=32, halo=32, blend=blend))
        np.testing.assert_allclose(const3, uniform, rtol=1e-5,
                                   atol=1e-5 * uniform.max())

    def field_defocus(fx, fy):  # strong defocus at the field edges
        c = base.copy()
        c[4] = 120.0 * (fx**2 + fy**2)
        return c

    varying = np.asarray(tiled_socs_image_field(
        big_mask, TILE_CFG, src, field_defocus,
        field_points=3, rank=32, halo=32, blend="nearest"))
    assert varying.shape == uniform.shape
    # 256^2 chip / 64-px cores -> 4x4 tiles; with nearest assignment the
    # inner 2x2 block maps to the (0, 0) field sample (zero defocus) ->
    # EXACTLY the uniform image there, while corner tiles print with
    # ~135 nm defocus and differ materially.
    n = uniform.shape[0]
    q = n // 4
    np.testing.assert_allclose(varying[q:3 * q, q:3 * q],
                               uniform[q:3 * q, q:3 * q], rtol=1e-6)
    corner_diff = np.abs(varying[:q, :q] - uniform[:q, :q]).max()
    assert corner_diff > 1e-3 * uniform[:q, :q].max()


@pytest.mark.slow
def test_field_blend_cd_continuity():
    """Round-3 zone-boundary check: with linear image blending between
    field-kernel zones, the printed CD varies CONTINUOUSLY across the chip,
    while nearest-kernel assignment jumps at the zone boundary."""
    from lithographysimulator_tpu import feature_table
    from lithographysimulator_tpu.ops.tiled import tiled_socs_image_field

    big_n = 512  # 16 tile columns of 32-px cores under the 128^2 tile optics
    mask = np.zeros((big_n, big_n), np.float32)
    for x in range(8, big_n - 8, 32):
        mask[:, x:x + 8] = 1.0  # uniform vertical bars across the chip
    src = np.asarray(LightSource(TILE_CFG, sigma_out=0.6).classical())

    def slit(fx, fy):  # defocus grows quadratically along x only
        return np.array([0, 0, 0, 0, 250.0 * fx * fx], np.float32)

    def column_cds(blend):
        img = np.asarray(tiled_socs_image_field(
            mask, TILE_CFG, src, slit, field_points=3, rank=32, halo=48,
            blend=blend))
        norm = img / img.max()
        # subpixel CDs of every bar at mid-chip rows, averaged per bar
        t = feature_table(norm, TILE_CFG, threshold=0.35)
        mid = (t["row"] > big_n // 4) & (t["row"] < 3 * big_n // 4)
        centers = np.round(t["center_nm"][mid] / 25.0).astype(int)
        widths = t["width_nm"][mid]
        uniq = np.unique(centers)
        return np.array([widths[centers == c].mean() for c in uniq])

    cds_nearest = column_cds("nearest")
    cds_linear = column_cds("linear")
    assert len(cds_nearest) == len(cds_linear) >= 12
    jump_nearest = np.abs(np.diff(cds_nearest)).max()
    jump_linear = np.abs(np.diff(cds_linear)).max()
    # measured 0.70 nm nearest vs 0.18 nm linear (ratio 0.26): blending cuts
    # the worst bar-to-bar CD jump by well over half
    assert jump_linear < 0.45 * jump_nearest


def test_sharded_tiles_mask3d_match_local(big_mask, socs):
    """Sharded full-chip imaging with a thick-mask model equals the local
    tiled apply — the production EUV flow over the device mesh."""
    from lithographysimulator_tpu import BoundaryLayer

    bl = BoundaryLayer(width_nm=8.0, beta_h=-0.3, beta_v=-0.3 + 0.1j)
    mesh = source_mesh()
    a = np.asarray(tiled_socs_image_sharded(big_mask, socs, TILE_CFG, mesh,
                                            halo=32, mask3d=bl))
    b = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32,
                                    mask3d=bl))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * b.max())
    thin = np.asarray(tiled_socs_image(big_mask, socs, TILE_CFG, halo=32))
    assert np.linalg.norm(b - thin) / np.linalg.norm(thin) > 1e-3
