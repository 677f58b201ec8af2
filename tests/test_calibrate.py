"""Resist calibration: round-trip parameter recovery on synthetic gauges.

Oracle: CDs "measured" with a known ground-truth model must be reproduced
by the fitted model, and the hidden parameters recovered — the identical
workflow a fab runs against CD-SEM data, with the SEM replaced by the
model itself.
"""

import numpy as np
import pytest

from lithographysimulator_tpu import OpticsConfig, ResistModel
from lithographysimulator_tpu.models.calibrate import (
    calibrate_resist,
    gauge_cd,
)
from lithographysimulator_tpu.models.resist import MackResist

CFG = OpticsConfig(pixel_number=96)  # 25 nm px


def _gauges():
    """Smooth aerial images of line gratings at three pitches (px): the
    diffusion length attenuates each pitch differently, so (threshold,
    diffusion) are jointly identifiable from the CD set."""
    n = CFG.n
    x = np.arange(n)
    images = []
    for pitch_px, contrast in ((8, 0.9), (12, 0.8), (24, 0.7)):
        profile = 0.5 + 0.5 * contrast * np.cos(2 * np.pi * x / pitch_px)
        images.append(np.tile(profile**2, (n, 1)))
    return images


TRUE = ResistModel(threshold=0.42, diffusion_nm=12.0)


def test_round_trip_recovers_threshold_and_diffusion():
    images = _gauges()
    measured = [gauge_cd(TRUE, im, CFG) for im in images]
    assert all(cd > 0 for cd in measured)
    out = calibrate_resist(images, measured, CFG,
                           model=ResistModel(threshold=0.30, diffusion_nm=0.0))
    assert out["rms_nm"] < 0.05
    assert out["params"]["threshold"] == pytest.approx(0.42, abs=0.01)
    assert out["params"]["diffusion_nm"] == pytest.approx(12.0, abs=1.5)
    np.testing.assert_allclose(out["cd_nm"], measured, atol=0.1)


def test_threshold_only_fit_keeps_diffusion_frozen():
    images = _gauges()
    measured = [gauge_cd(ResistModel(threshold=0.5, diffusion_nm=0.0),
                         im, CFG) for im in images]
    out = calibrate_resist(images, measured, CFG, fit=("threshold",),
                           model=ResistModel(threshold=0.25))
    assert out["params"]["threshold"] == pytest.approx(0.5, abs=0.005)
    assert out["model"].diffusion_nm == 0.0  # untouched
    assert out["rms_nm"] < 0.05


def test_mack_model_fields_fit():
    images = _gauges()[:2]
    true = MackResist(m_threshold=0.55, develop_s=40.0)
    measured = [gauge_cd(true, im, CFG) for im in images]
    out = calibrate_resist(
        images, measured, CFG, model=MackResist(m_threshold=0.7,
                                                develop_s=25.0),
        fit=("m_threshold", "develop_s"), iters=250)
    # Mack CDs are weakly sensitive to develop_s near the knee: accept any
    # parameter combination that reproduces the gauge CDs
    assert out["rms_nm"] < 0.2


def test_bounds_respected():
    images = _gauges()
    measured = [gauge_cd(TRUE, im, CFG) for im in images]
    out = calibrate_resist(images, measured, CFG,
                           bounds={"diffusion_nm": (0.0, 5.0)})
    assert 0.0 <= out["params"]["diffusion_nm"] <= 5.0


def test_input_validation():
    images = _gauges()
    with pytest.raises(ValueError, match="measured"):
        calibrate_resist(images, [50.0], CFG)
    with pytest.raises(ValueError, match="unknown model field"):
        calibrate_resist(images, [50.0, 60.0, 70.0], CFG,
                         fit=("not_a_field",))
    with pytest.raises(ValueError, match="at least one"):
        calibrate_resist(images, [50.0, 60.0, 70.0], CFG, fit=())


def test_numpy_mirrors_match_jax_models():
    """gauge_cd's host-side numpy math must equal the jnp model code it
    mirrors (ResistModel.blur transfer; MackResist.develop chain)."""
    from lithographysimulator_tpu.models.calibrate import _blur_np

    rng = np.random.default_rng(7)
    img = rng.random((32, 32))
    cfg = OpticsConfig(pixel_number=32)
    model = ResistModel(threshold=0.4, diffusion_nm=9.0)
    np.testing.assert_allclose(
        _blur_np(img, 9.0, cfg.pixel_size),
        np.asarray(model.blur(img.astype(np.float32), cfg)),
        rtol=0, atol=1e-5)
    mack = MackResist(m_threshold=0.55, develop_s=40.0)
    inorm = img / img.max()
    m = np.exp(-mack.dill_c * 100.0 * inorm)
    nn = mack.mack_n
    a = (nn + 1.0) / (nn - 1.0) * (1.0 - mack.m_threshold) ** nn
    one_minus = np.clip(1.0 - m, 0.0, 1.0)
    rate = (mack.r_max_nm_s * (a + 1.0) * one_minus**nn
            / (a + one_minus**nn) + mack.r_min_nm_s)
    field = 1.0 / (1.0 + np.exp(-0.2 * (rate * mack.develop_s
                                        - mack.thickness_nm)))
    np.testing.assert_allclose(
        field, np.asarray(mack.develop(img.astype(np.float32))),
        rtol=0, atol=1e-5)


def test_cli_calibrate(tmp_path, capsys):
    import json

    from lithographysimulator_tpu.cli import main

    images = _gauges()
    paths = []
    for i, im in enumerate(images):
        p = tmp_path / f"g{i}.npy"
        np.save(p, im)
        paths.append(str(p))
    measured = [gauge_cd(TRUE, im, CFG) for im in images]
    rc = main(["calibrate", "--pixel-number", "96", "--images", *paths,
               "--cds", *[f"{cd:.4f}" for cd in measured]])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rms_nm"] < 0.05
    assert report["params"]["threshold"] == pytest.approx(0.42, abs=0.01)
