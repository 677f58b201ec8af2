"""Stage blur + flare perturbations: physics invariants and integration.

No reference counterpart (ideal-scanner reference); oracles are energy
conservation, the analytic Gaussian MTF on a sinusoid, and the NILS
erosion formula for uniform flare.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lithographysimulator_tpu import (
    ImagePerturbation,
    LightSource,
    OpticsConfig,
    apply_perturbation,
    demo_bars,
    simulate,
    simulate_batch,
)
from lithographysimulator_tpu.models.resist import nils_table

CFG = OpticsConfig(pixel_number=64)


def _sinusoid(n=256, px=2.0, period_nm=128.0):
    x = (np.arange(n) - n // 2) * px
    return np.tile(0.5 * (1 + np.cos(2 * np.pi * x / period_nm)), (n, 1))


def test_stage_blur_matches_gaussian_mtf():
    """A sinusoid's modulation under Gaussian blur drops by exactly
    exp(-2 pi^2 sigma^2 f^2)."""
    img = _sinusoid()
    sigma = 20.0
    out = np.asarray(apply_perturbation(
        jnp.asarray(img), ImagePerturbation(msd_x_nm=sigma), 2.0))
    mod_in = img.max() - img.min()
    mod_out = out.max() - out.min()
    f = 1.0 / 128.0
    expected = np.exp(-2 * np.pi ** 2 * sigma ** 2 * f ** 2)
    assert mod_out / mod_in == pytest.approx(expected, rel=1e-3)
    # energy conserved
    assert out.mean() == pytest.approx(img.mean(), rel=1e-6)
    # y-blur does nothing to an x-sinusoid
    out_y = np.asarray(apply_perturbation(
        jnp.asarray(img), ImagePerturbation(msd_y_nm=sigma), 2.0))
    np.testing.assert_allclose(out_y, img, atol=1e-5)


def test_uniform_flare_erodes_nils_analytically():
    """Uniform flare I' = (1-TIS) I + TIS <I> scales ILS at a crossing by
    I_t' slope ratio: NILS'(at the SAME feature) = NILS * (1 - TIS) *
    t' / ... — check against direct recomputation."""
    img = _sinusoid()
    tis = 0.2
    out = np.asarray(apply_perturbation(
        jnp.asarray(img), ImagePerturbation(flare_tis=tis), 2.0))
    np.testing.assert_allclose(out, (1 - tis) * img + tis * img.mean(),
                               atol=1e-6)
    cfg = OpticsConfig(pixel_number=256, pixel_size=2.0)
    n0 = nils_table(img, cfg, threshold=0.4, normalize=False,
                    row_step=64)["mean_nils"]
    n1 = nils_table(out, cfg, threshold=0.4, normalize=False,
                    row_step=64)["mean_nils"]
    assert n1 < n0  # flare always erodes edge slope at fixed threshold


def test_flare_kernel_spreads_locally():
    img = np.zeros((128, 128)); img[60:68, 60:68] = 1.0
    out = np.asarray(apply_perturbation(
        jnp.asarray(img), ImagePerturbation(flare_tis=0.1,
                                            flare_kernel_nm=40.0), 4.0))
    # energy conserved, background largest near the feature
    assert out.sum() == pytest.approx(img.sum(), rel=1e-5)
    assert out[64, 80] > out[64, 120]


def test_validation():
    with pytest.raises(ValueError):
        ImagePerturbation(flare_tis=1.0)
    with pytest.raises(ValueError):
        ImagePerturbation(msd_x_nm=-1.0)
    assert not ImagePerturbation().active
    assert ImagePerturbation(msd_x_nm=1.0).active


def test_simulate_integration():
    src = LightSource(CFG, sigma_out=0.5).classical()
    clean = simulate(demo_bars(CFG), src, normalize=True)
    blurred = simulate(demo_bars(CFG), src, normalize=True,
                       perturb=ImagePerturbation(msd_x_nm=30.0,
                                                 flare_tis=0.05))
    a, b = np.asarray(clean.image), np.asarray(blurred.image)
    assert not np.allclose(a, b)
    # blur + flare reduce peak intensity, roughly conserve energy
    assert b.max() < a.max()
    assert b.sum() == pytest.approx(a.sum(), rel=1e-3)
    assert "perturbation" in blurred.report
    # perturb=None and inactive perturb are bit-identical to clean
    off = simulate(demo_bars(CFG), src, normalize=True,
                   perturb=ImagePerturbation())
    np.testing.assert_array_equal(np.asarray(off.image), a)


def test_batch_integration():
    src = np.asarray(LightSource(CFG, sigma_out=0.5).classical())
    geoms = np.stack([np.abs(np.asarray(demo_bars(CFG).geometry))] * 2)
    out = np.asarray(simulate_batch(
        geoms, CFG, src, solver="socs", socs_rank=32,
        perturb=ImagePerturbation(msd_x_nm=30.0)))
    base = np.asarray(simulate_batch(geoms, CFG, src, solver="socs",
                                     socs_rank=32))
    assert out.shape == base.shape
    assert not np.allclose(out, base)


def test_fem_integration():
    """Flare shrinks the measured exposure latitude — the process-window
    effect the knob exists to quantify."""
    from lithographysimulator_tpu.metrology import tiled_fem
    from lithographysimulator_tpu.models.resist import ResistModel

    m = np.zeros((128, 128), np.float32)
    x = np.arange(128)
    m[:, :] = ((x // 8) % 4 == 0).astype(np.float32)[None, :]
    src = np.asarray(LightSource(CFG, sigma_out=0.6).annular())
    kw = dict(defocus_nm=[0.0], doses=[0.85, 1.0, 1.15],
              resist=ResistModel(threshold=0.25), rank=48, halo=16)
    clean = tiled_fem(m, CFG, src, **kw)
    flared = tiled_fem(m, CFG, src,
                       perturb=ImagePerturbation(flare_tis=0.15), **kw)
    assert flared["nils"]["mean_nils"] < clean["nils"]["mean_nils"]
