"""Measure the PyTorch reference's per-source-point cost at benchmark scale.

The reference's Abbe loop (``imageformation.py:62-67``) is linear in source
points: one roll + pad + centered ifft2 + |.|^2 accumulate per point. Running
the full 1024^2 quadrupole config (~49k points) takes hours on CPU, so we
time ``k`` loop iterations directly and extrapolate — the loop body is
identical for every point. Results land in tools/reference_baseline.json and
feed bench.py's vs_baseline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import torch


def measure(n: int, points_to_time: int = 24) -> dict:
    sys.path.insert(0, "/root/reference")
    import imageformation
    import lightsource
    import mask as ref_mask

    device = torch.device("cpu")
    wavelength = 193.0

    geom = torch.zeros((n, n), dtype=torch.int16)
    # line/space pattern comparable to bench.py's
    lw, pitch = n // 16, n // 8
    for i in range(n // pitch):
        geom[:, i * pitch : i * pitch + lw] = 1

    m = ref_mask.Mask(geometry=geom, pixelSize=25, device=device)
    t0 = time.perf_counter()
    mask_ft = m.fraunhofer(wavelength, True)
    spectrum_s = time.perf_counter() - t0

    ls = lightsource.LightSource(sigmaIn=0.4, sigmaOut=0.8, pixelNumber=n,
                                 device=device)
    src = ls.generateQuasar(4, -torch.pi / 8)
    total_points = int(src.sum().item())

    _, big_n = ref_mask.Mask.calculateEpsilonN(m, m.deltaK, m.pixelSize, wavelength)
    pupil = torch.ones((n, n), dtype=torch.complex64)

    shifts = (torch.argwhere(src) - n // 2).to(torch.int)[:points_to_time]
    image = torch.zeros((n, n), dtype=torch.complex64)
    # warmup one iteration (fft plan setup)
    p = torch.roll(pupil, shifts=(int(shifts[0, 0]), int(shifts[0, 1])), dims=(0, 1))
    imageformation.calculateFFTAerial(p, mask_ft, n, big_n)

    t0 = time.perf_counter()
    for i in range(points_to_time):
        p = torch.roll(pupil, shifts=(int(shifts[i, 0]), int(shifts[i, 1])),
                       dims=(0, 1))
        image += torch.abs(imageformation.calculateFFTAerial(p, mask_ft, n, big_n)) ** 2
    per_point_s = (time.perf_counter() - t0) / points_to_time

    return {
        "pixel_number": n,
        "fft_size": big_n,
        "total_source_points": total_points,
        "timed_points": points_to_time,
        "per_point_s": per_point_s,
        "spectrum_s": spectrum_s,
        "extrapolated_total_s": spectrum_s + per_point_s * total_points,
        "hardware": "container CPU, torch " + torch.__version__,
    }


if __name__ == "__main__":
    out = {}
    for n in (512, 1024):
        out[str(n)] = measure(n)
        print(n, out[str(n)])
    path = Path(__file__).parent / "reference_baseline.json"
    path.write_text(json.dumps(out, indent=2))
    print("wrote", path)
