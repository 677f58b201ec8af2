"""Generate golden .npy fixtures by executing the PyTorch reference.

Runs quarterwave0/LithographySimulator (mounted read-only at /root/reference)
as an oracle and dumps every pipeline intermediate for the configs the test
suite checks parity against. The reference itself never enters this repo —
only its outputs do.

Notes on reference quirks handled here (SURVEY §2.2):
* ``abbeImage`` NameErrors on import because ``Mask`` is only imported inside
  ``__main__`` (``imageformation.py:50,84``) — we inject it into the module
  namespace.
* ``generateWavefrontError`` mutates its aberration input in place
  (``pupil.py:92``) — we always pass a fresh tensor.

Usage: python tools/gen_golden.py [--reference /root/reference] [--out tests/golden]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import torch


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "tests/golden"))
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import imageformation  # noqa: E402
    import lightsource  # noqa: E402
    import mask as ref_mask  # noqa: E402
    import pupil as ref_pupil  # noqa: E402

    # Fix the reference's NameError on the main API path (imageformation.py:50).
    imageformation.Mask = ref_mask.Mask

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    device = torch.device("cpu")
    meta: dict = {}

    def save(name: str, tensor):
        np.save(out / f"{name}.npy", np.asarray(tensor.detach().cpu().numpy()))

    # ------------------------------------------------------------------
    # 1. Demo config: 64^2 demo mask, quadrupole 0.4/0.8, 10 OSA terms,
    #    lambda=193, NA=0.7, pixel 25 nm, Gau'23 FFT solver
    #    (reference imageformation.py:99-119).
    # ------------------------------------------------------------------
    wavelength = 193.0
    m = ref_mask.Mask(device=device, pixelSize=25)
    save("demo_mask_geometry", m.geometry)

    mask_ft_fft = m.fraunhofer(wavelength, True)
    save("demo_mask_spectrum_fft", mask_ft_fft)

    ls = lightsource.LightSource(sigmaIn=0.4, sigmaOut=0.8, device=device)
    quasar = ls.generateQuasar(4, -torch.pi / (4 * 2))
    save("demo_source_quasar", quasar)
    annular = ls.generateAnnular()
    save("demo_source_annular", annular)
    classical = lightsource.LightSource(sigmaIn=0.0, sigmaOut=0.6, device=device).generateAnnular()
    save("demo_source_classical", classical)
    shifted = lightsource.LightSource(
        sigmaIn=0.2, sigmaOut=0.7, shiftX=0.25, shiftY=-0.5, device=device
    ).generateAnnular()
    save("demo_source_shifted", shifted)

    aberr = torch.tensor([0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01],
                         dtype=torch.float16, device=device)
    p = ref_pupil.Pupil(m.pixelNumber, wavelength, ls.NA, aberr.clone(), device=device)
    pupil_f = p.generatePupilFunction()
    save("demo_pupil_function", pupil_f)
    we = ref_pupil.generateWavefrontError(aberr.clone(), m.pixelNumber, ls.NA,
                                          wavelength, device)
    save("demo_wavefront_error", we)

    img = imageformation.abbeImage(m, mask_ft_fft, pupil_f, quasar, m.pixelSize,
                                   m.deltaK, wavelength, True, device)
    save("demo_aerial_image_fft", img)
    meta["demo"] = {
        "pixel_number": 64, "pixel_size": 25, "wavelength": 193.0, "na": 0.7,
        "aberrations": [0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01],
        "sigma_in": 0.4, "sigma_out": 0.8, "quasar": [4, -np.pi / 8],
        "source_points": int(quasar.sum().item()),
    }

    # Aberration-free image on the same mask/source (isolates engine parity
    # from fp16 Zernike rounding).
    p0 = ref_pupil.Pupil(m.pixelNumber, wavelength, ls.NA,
                         torch.tensor([0], dtype=torch.float16), device=device)
    pupil0 = p0.generatePupilFunction()
    save("demo_pupil_perfect", pupil0)
    img0 = imageformation.abbeImage(m, mask_ft_fft, pupil0, quasar, m.pixelSize,
                                    m.deltaK, wavelength, True, device)
    save("demo_aerial_image_fft_perfect", img0)
    img_ann = imageformation.abbeImage(m, mask_ft_fft, pupil0, annular, m.pixelSize,
                                       m.deltaK, wavelength, True, device)
    save("demo_aerial_image_fft_annular_perfect", img_ann)

    # off-axis shifted source + dipole, imaged end to end
    shifted_src = lightsource.LightSource(
        sigmaIn=0.2, sigmaOut=0.6, shiftX=0.3, shiftY=-0.2, device=device
    ).generateAnnular()
    save("demo_source_shifted_small", shifted_src)
    img_shift = imageformation.abbeImage(m, mask_ft_fft, pupil0, shifted_src,
                                         m.pixelSize, m.deltaK, wavelength,
                                         True, device)
    save("demo_aerial_image_fft_shifted_perfect", img_shift)

    dipole = lightsource.LightSource(sigmaIn=0.5, sigmaOut=0.8, device=device
                                     ).generateQuasar(2, 0.0)
    save("demo_source_dipole", dipole)
    img_dip = imageformation.abbeImage(m, mask_ft_fft, pupil0, dipole,
                                       m.pixelSize, m.deltaK, wavelength,
                                       True, device)
    save("demo_aerial_image_fft_dipole_perfect", img_dip)

    # ------------------------------------------------------------------
    # 2. Direct (non-FFT) solver on a small grid: 32^2 random binary mask,
    #    classical source sigma=0.3, defocus-only pupil.
    # ------------------------------------------------------------------
    rng = np.random.default_rng(1234)
    n_small = 32
    geom_small = (rng.random((n_small, n_small)) < 0.3).astype(np.int16)
    np.save(out / "small_mask_geometry.npy", geom_small)
    m_small = ref_mask.Mask(geometry=torch.tensor(geom_small), pixelSize=25,
                            device=device)
    ft_direct = m_small.fraunhofer(wavelength, False)
    save("small_mask_spectrum_direct", ft_direct)
    ft_fft_small = m_small.fraunhofer(wavelength, True)
    save("small_mask_spectrum_fft", ft_fft_small)

    ls_small = lightsource.LightSource(sigmaIn=0.0, sigmaOut=0.3,
                                       pixelNumber=n_small, device=device)
    src_small = ls_small.generateAnnular()
    save("small_source_classical", src_small)

    aberr_small = torch.tensor([0, 0, 0, 0, 50], dtype=torch.float16, device=device)
    p_small = ref_pupil.Pupil(n_small, wavelength, 0.7, aberr_small.clone(),
                              device=device)
    pupil_small = p_small.generatePupilFunction()
    save("small_pupil_function", pupil_small)

    img_direct = imageformation.abbeImage(m_small, ft_direct, pupil_small,
                                          src_small, 25, m_small.deltaK,
                                          wavelength, False, device)
    save("small_aerial_image_direct", img_direct)
    img_fft_small = imageformation.abbeImage(m_small, ft_fft_small, pupil_small,
                                             src_small, 25, m_small.deltaK,
                                             wavelength, True, device)
    save("small_aerial_image_fft", img_fft_small)
    meta["small"] = {
        "pixel_number": n_small, "pixel_size": 25, "wavelength": 193.0,
        "na": 0.7, "aberrations": [0, 0, 0, 0, 50],
        "sigma_in": 0.0, "sigma_out": 0.3,
        "source_points": int(src_small.sum().item()),
    }

    # ------------------------------------------------------------------
    # 3. Pupil module demo config (pupil.py:113-124): NA=0.6 wavefront.
    # ------------------------------------------------------------------
    aberr_p = torch.tensor([0, 0, 0, 1, 3, 0, 0, 1, 0, 0], dtype=torch.float16,
                           device=device)
    we_p = ref_pupil.generateWavefrontError(aberr_p.clone(), 64, 0.6, 193.0, device)
    save("pupildemo_wavefront_error", we_p)

    # Individual Zernike terms (unit coefficient), j = 0..14.
    for j in range(15):
        mm, nn = ref_pupil.OSAindexToMN(j)
        z = ref_pupil.generateZ(mm, nn, 64, torch.tensor(1.0), device)
        save(f"zernike_term_{j}", z)

    (out / "meta.json").write_text(json.dumps(meta, indent=2))
    print(f"wrote goldens to {out}")


if __name__ == "__main__":
    main()
