"""Benchmark: 1024^2 Abbe aerial image (Gau'23 solver) on one TPU chip.

Workload: 1024^2 line/space mask, 25 nm pixels, lambda=193 nm, NA=0.7,
quadrupole source sigma 0.4/0.8 (~49.5k source points), aberration-free
pupil — the BASELINE.md tracked metric ("1024^2 aerial-image wall-clock",
"source-points/sec/chip").

Baseline: the PyTorch reference's Abbe loop is linear in source points;
tools/bench_reference.py timed its per-point cost on this container's CPU at
the same grid size and extrapolated the full run (11765 s at 1024^2; see
tools/reference_baseline.json). vs_baseline = reference_s / ours_s.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REFERENCE_BASELINE_S = 11764.6  # tools/reference_baseline.json, 1024^2 extrapolated
N = 1024
CHUNK = 4


def main() -> None:
    import jax
    import jax.numpy as jnp

    import lithographysimulator_tpu as lt
    from lithographysimulator_tpu.models.pupil import pupil_function
    from lithographysimulator_tpu.ops.abbe import abbe_image_points
    from lithographysimulator_tpu.ops.fraunhofer import mask_spectrum
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg = lt.OpticsConfig(pixel_number=N)
    mask = lt.lines_and_spaces(cfg, line_width_px=N // 16, pitch_px=N // 8)
    src = np.asarray(
        lt.LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8)
    )
    points = int(src.sum())
    shifts, weights, _ = padded_source_arrays(src, CHUNK)
    aberrations = jnp.zeros(1, jnp.float32)

    @jax.jit
    def run(geometry, ab, sh, w):
        spectrum = mask_spectrum(geometry, cfg)
        pupil = pupil_function(ab, cfg)
        return abbe_image_points(spectrum, pupil, sh, w, cfg, chunk=CHUNK)

    args = (mask.geometry, aberrations, shifts, weights)
    jax.block_until_ready(run(*args))  # compile + warmup

    t0 = time.perf_counter()
    image = jax.block_until_ready(run(*args))
    elapsed = time.perf_counter() - t0

    result = {
        "metric": "1024^2 Abbe aerial image wall-clock (quadrupole, %d src pts)" % points,
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(REFERENCE_BASELINE_S / elapsed, 1),
        "source_points_per_s": round(points / elapsed, 1),
        "device": str(jax.devices()[0]),
        "image_peak": float(np.asarray(image).max()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
