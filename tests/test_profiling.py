"""Stage timing + trace utilities."""

import numpy as np

from lithographysimulator_tpu import OpticsConfig, demo_bars, mask_spectrum
from lithographysimulator_tpu.utils import StageTimer


def test_stage_timer_collects():
    cfg = OpticsConfig(pixel_number=32)
    timer = StageTimer()
    with timer.stage("spectrum"):
        spec = mask_spectrum(demo_bars(cfg).geometry, cfg)
    with timer.stage("abs"):
        _ = np.abs(np.asarray(spec))
    rep = timer.report()
    assert set(rep) == {"spectrum", "abs"}
    assert all(v >= 0 for v in rep.values())


def test_stage_timer_accumulates():
    timer = StageTimer(sync=False)
    for _ in range(3):
        with timer.stage("x"):
            pass
    assert len(timer.report()) == 1
