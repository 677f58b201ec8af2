"""Chromatic (finite laser-bandwidth) imaging: spectral quadrature,
focal-blend exactness, polychromatic SOCS parity, and API wiring.

No reference counterpart (the reference is strictly monochromatic — a single
``wavelength`` scalar in ``mask.py:5`` / ``pupil.py:6``); the oracle is the
framework's own exact-Abbe focal blend.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import (
    LaserSpectrum,
    LightSource,
    OpticsConfig,
    chromatic_aberrations,
    demo_bars,
    randomized_socs_chromatic,
    simulate,
    simulate_batch,
    socs_image,
    spectrum_fft,
)

CFG = OpticsConfig(pixel_number=32)
# Asymmetric aberrations + off-axis source, as in test_hopkins: convention
# mistakes cannot hide behind symmetry.
ABERR = np.array([0, 0, 0.05, 0.03, 30, 0.02, 0, 0.04], np.float32)
SPEC3 = LaserSpectrum(bandwidth_pm=0.8, focus_nm_per_pm=-250.0, samples=3)


def _src():
    return np.asarray(
        LightSource(CFG, sigma_in=0.2, sigma_out=0.6, shift_x=0.1).annular())


def nrms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.max(np.abs(b)))


# --- spectral quadrature ---------------------------------------------------


@pytest.mark.parametrize("shape", ["gaussian", "lorentzian", "tophat"])
def test_quadrature_symmetric_and_normalized(shape):
    spec = LaserSpectrum(bandwidth_pm=0.6, samples=7, shape=shape)
    off = spec.wavelength_offsets_pm()
    w = spec.weights()
    assert w.shape == off.shape == (7,)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    # symmetric line shapes sample symmetrically; odd count pins the center
    np.testing.assert_allclose(off, -off[::-1], atol=1e-12)
    assert abs(off[3]) < 1e-12


@pytest.mark.parametrize("shape", ["gaussian", "lorentzian", "tophat"])
def test_quadrature_spans_e95(shape):
    """Quantile-midpoint samples of a 95%-width spec stay inside roughly the
    E95 half-width (heavy Lorentzian tails excepted, still bounded)."""
    spec = LaserSpectrum(bandwidth_pm=1.0, samples=9, shape=shape)
    off = spec.wavelength_offsets_pm()
    assert np.all(np.diff(off) > 0)
    bound = 1.0 if shape != "lorentzian" else 3.0
    assert np.abs(off).max() < bound
    assert np.abs(off).max() > 0.2  # actually spreads


def test_zero_bandwidth_is_monochromatic():
    spec = LaserSpectrum(bandwidth_pm=0.0, samples=5)
    np.testing.assert_array_equal(spec.defocus_offsets_nm(), np.zeros(5))
    mono = simulate(demo_bars(CFG), _src(), ABERR)
    chrom = simulate(demo_bars(CFG), _src(), ABERR, chromatic=spec)
    assert nrms(chrom.image, mono.image) < 1e-6


def test_spectrum_validation():
    with pytest.raises(ValueError):
        LaserSpectrum(bandwidth_pm=-1.0)
    with pytest.raises(ValueError):
        LaserSpectrum(bandwidth_pm=0.3, samples=0)
    with pytest.raises(ValueError):
        LaserSpectrum(bandwidth_pm=0.3, shape="boxcar")


def test_chromatic_aberrations_additive():
    stack, w = chromatic_aberrations(ABERR, SPEC3)
    stack = np.asarray(stack)
    offsets = SPEC3.defocus_offsets_nm()
    np.testing.assert_allclose(stack[:, 4], ABERR[4] + offsets, rtol=1e-6)
    # all other entries untouched
    np.testing.assert_allclose(stack[:, :4], np.broadcast_to(ABERR[:4], (3, 4)))
    np.testing.assert_allclose(np.asarray(w).sum(), 1.0, rtol=1e-6)


# --- exact path: focal blend ----------------------------------------------


def test_exact_chromatic_is_weighted_focal_blend():
    """simulate(chromatic=...) on the exact solver equals the explicit
    spectrum-weighted sum of monochromatic images at the offset planes."""
    mask, src = demo_bars(CFG), _src()
    chrom = np.asarray(simulate(mask, src, ABERR, chromatic=SPEC3).image)
    manual = 0.0
    for dz, q in zip(SPEC3.defocus_offsets_nm(), SPEC3.weights()):
        ab = ABERR.copy()
        ab[4] += dz
        manual = manual + q * np.asarray(simulate(mask, src, ab).image)
    assert nrms(chrom, manual) < 1e-5


def test_bandwidth_reduces_contrast():
    """Finite bandwidth is a focus blur: image contrast falls monotonically
    with E95 width."""
    mask, src = demo_bars(CFG), _src()

    def contrast(bw):
        spec = LaserSpectrum(bandwidth_pm=bw, focus_nm_per_pm=-400.0,
                             samples=5)
        img = np.asarray(simulate(mask, src, ABERR, chromatic=spec,
                                  normalize=True).image)
        return img.max() - img.min()

    c0, c1, c2 = contrast(0.0), contrast(1.0), contrast(3.0)
    assert c0 > c1 > c2


def test_vector_chromatic_exact_runs():
    """Polarization and bandwidth compose on the exact path."""
    res = simulate(demo_bars(CFG), _src(), ABERR, chromatic=SPEC3,
                   polarization="unpolarized")
    img = np.asarray(res.image)
    assert np.isfinite(img).all() and img.max() > 0
    assert "E95=0.8pm" in res.report["chromatic"]


# --- SOCS path: polychromatic kernels -------------------------------------


def test_socs_chromatic_matches_exact_blend():
    """One polychromatic kernel set reproduces the exact chromatic image
    (same quadrature on both sides, so the only residual is SOCS rank
    truncation — driven to the floor at full rank)."""
    mask, src = demo_bars(CFG), _src()
    exact = np.asarray(simulate(mask, src, ABERR, chromatic=SPEC3).image)
    live = int((src > 0).sum())
    res = simulate(mask, src, ABERR, chromatic=SPEC3, solver="socs",
                   socs_rank=min(3 * live, 256))
    assert nrms(res.image, exact) < 5e-4
    assert res.report["socs_energy_captured"] > 0.999


def test_socs_chromatic_auto_rank():
    mask, src = demo_bars(CFG), _src()
    exact = np.asarray(simulate(mask, src, ABERR, chromatic=SPEC3).image)
    res = simulate(mask, src, ABERR, chromatic=SPEC3, solver="socs")
    assert nrms(res.image, exact) < 5e-3
    assert res.report["socs_rank"] >= 32


def test_socs_vector_chromatic_kernels_match_exact():
    """Polarized AND polychromatic: the outer-product component build
    reproduces the exact vector focal blend."""
    mask, src = demo_bars(CFG), _src()
    exact = np.asarray(simulate(mask, src, ABERR, chromatic=SPEC3,
                                polarization="unpolarized").image)
    spec = spectrum_fft(mask.geometry, CFG)
    socs = randomized_socs_chromatic(
        ABERR, src, CFG, spectrum=SPEC3, polarization="unpolarized",
        rank=min(CFG.n ** 2, 320), power_iters=3)
    img = np.asarray(socs_image(spec, socs, CFG))
    assert nrms(img, exact) < 1e-3


# --- production paths: tiled full-chip, FEM, OPC ---------------------------


BIG_N = 64


def _lines_big():
    x = np.arange(BIG_N)
    cols = ((x // 4) % 4 == 0).astype(np.float32)
    return np.broadcast_to(cols, (BIG_N, BIG_N)).copy()


def test_tiled_chromatic_is_weighted_blend():
    """The polychromatic tiled full-chip image equals the spectrum-weighted
    blend of monochromatic tiled images at the sample defocus planes (same
    tiling machinery both sides, so stitching effects cancel; residual is
    kernel-rank truncation only)."""
    from lithographysimulator_tpu.metrology import tiled_focus_images

    spec = LaserSpectrum(bandwidth_pm=2.0, focus_nm_per_pm=-60.0, samples=3)
    mask, src = _lines_big(), _src()
    chrom = tiled_focus_images(mask, CFG, src, [0.0], rank=150, halo=8,
                               chromatic=spec)[0]
    planes = tiled_focus_images(mask, CFG, src, spec.defocus_offsets_nm(),
                                rank=64, halo=8)
    manual = np.tensordot(spec.weights(), planes, axes=1)
    assert nrms(chrom, manual) < 5e-3


def test_fem_chromatic_process_window():
    """Laser bandwidth SHRINKS the measured process window: dense 100 nm
    L/S at k1 = 0.36 survive the whole +-100 nm sweep monochromatically, but
    a strong-bandwidth source (spectral focus blur ~ +-190 nm) prints fat
    off-focus CDs and loses half the window — the effect a chromatic FEM
    exists to measure."""
    from lithographysimulator_tpu.metrology import tiled_fem
    from lithographysimulator_tpu.models.resist import ResistModel

    x = np.arange(BIG_N)
    mask = np.broadcast_to(((x // 4) % 2 == 0).astype(np.float32),
                           (BIG_N, BIG_N)).copy()
    src = _src()
    kwargs = dict(defocus_nm=[-100.0, 0.0, 100.0], doses=[0.95, 1.0, 1.05],
                  target_cd_nm=None, resist=ResistModel(threshold=0.25),
                  tolerance=0.10, rank=48, halo=8)
    mono = tiled_fem(mask, CFG, src, **kwargs)
    spec = LaserSpectrum(bandwidth_pm=2.0, focus_nm_per_pm=-200.0, samples=3)
    chrom = tiled_fem(mask, CFG, src, chromatic=spec, **kwargs)
    assert chrom["cd_nm"].shape == mono["cd_nm"].shape
    # nominal (best-focus, unit-dose) cell still prints the same CD...
    assert abs(chrom["target_cd_nm"] - mono["target_cd_nm"]) < 1.0
    # ...but off-focus CDs fatten and the window shrinks
    assert np.abs(chrom["cd_nm"] - mono["cd_nm"]).max() > 10.0
    assert chrom["depth_of_focus_nm"] < mono["depth_of_focus_nm"]
    assert chrom["in_spec_fraction"] < mono["in_spec_fraction"]


def test_opc_tiled_chromatic_smoke():
    """Full-chip OPC against the polychromatic forward model runs and
    returns a valid continuous mask."""
    from lithographysimulator_tpu.optimize import opc_correct_tiled

    spec = LaserSpectrum(bandwidth_pm=1.0, focus_nm_per_pm=-150.0, samples=3)
    target = _lines_big()[:32, :32]
    corrected = np.asarray(opc_correct_tiled(
        target, CFG, _src(), steps=6, rank=32, chromatic=spec))
    assert corrected.shape == target.shape
    assert np.isfinite(corrected).all()
    assert 0.0 <= corrected.min() and corrected.max() <= 1.0


def test_batch_chromatic_matches_single():
    mask, src = demo_bars(CFG), _src()
    single = np.asarray(simulate(mask, src, ABERR, chromatic=SPEC3).image)
    batch = np.asarray(simulate_batch(
        np.stack([np.asarray(mask.geometry)] * 2), CFG, src, ABERR,
        chromatic=SPEC3))
    assert batch.shape[0] == 2
    assert nrms(batch[0], single) < 1e-6
    assert nrms(batch[1], single) < 1e-6
