"""Generate the docs/ image gallery (CPU-runnable, deterministic).

Each panel is simulation output rendered with imshow — evidence artifacts
for README/docs, regenerable with: python tools/make_gallery.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import lithographysimulator_tpu as lt

DOCS = Path(__file__).resolve().parent.parent / "docs"
DOCS.mkdir(exist_ok=True)


def save_panels(name, panels, ncols=None, cmap="viridis"):
    ncols = ncols or len(panels)
    nrows = (len(panels) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, dpi=170,
                             figsize=(3.2 * ncols, 3.4 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis("off")
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(np.asarray(img), cmap=cmap)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    out = DOCS / f"{name}.png"
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    print("wrote", out)


def main():
    cfg = lt.OpticsConfig(pixel_number=64)
    quasar = lt.LightSource(cfg, sigma_in=0.4, sigma_out=0.8).quasar(4, -np.pi / 8)
    ab = [0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01]

    # 1. SOCS eigenkernels
    pup = lt.pupil_function(np.asarray(ab, np.float32), cfg)
    socs = lt.randomized_socs(pup, np.asarray(quasar), cfg, rank=6)
    panels = [(f"kernel {j}  (λ={float(socs.eigenvalues[j]):.3g})",
               np.abs(np.asarray(socs.kernels)[j]))
              for j in range(6)]
    save_panels("socs_kernels", panels, ncols=3, cmap="magma")

    # 2. PSM resolution doubling at pitch 6 px (150 nm)
    src03 = lt.LightSource(cfg, sigma_out=0.3).classical()
    binary = lt.lines_and_spaces(cfg, line_width_px=3, pitch_px=6)
    alt = lt.alternating_psm(cfg, line_width_px=3, pitch_px=6)

    def image(geom):
        spec = lt.spectrum_fft(geom, cfg)
        p0 = lt.pupil_function(np.zeros(1), cfg)
        return lt.abbe_image(spec, p0, np.asarray(src03), cfg, normalize=True)

    save_panels("psm_resolution", [
        ("binary mask (150 nm pitch)", np.abs(np.asarray(binary.geometry))),
        ("binary image: unresolved", image(binary.geometry)),
        ("alternating-PSM mask (±1)", np.real(np.asarray(alt.geometry))),
        ("alt-PSM image: resolved", image(alt.geometry)),
    ], ncols=2)

    # 3. Inverse lithography: target / init / optimized mask / its image
    from lithographysimulator_tpu.optimize import (
        SMOProblem, forward, init_params, mask_from_latent, optimize)
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg32 = lt.OpticsConfig(pixel_number=32)
    src = np.asarray(lt.LightSource(cfg32, sigma_out=0.4).classical())
    shifts, weights, _ = padded_source_arrays(src, 32)
    prob = SMOProblem(config=cfg32, chunk=8)
    target_geom = lt.demo_bars(cfg32).geometry
    target = forward(init_params(prob, target_geom), np.zeros(1, np.float32),
                     shifts, weights, prob)
    start = np.full((32, 32), 0.4, np.float32)
    params, hist = optimize(prob, target, start, np.zeros(1, np.float32),
                            shifts, weights, steps=120, learning_rate=0.25)
    recovered = mask_from_latent(params["mask_latent"], prob.mask_steepness)
    save_panels("inverse_litho", [
        ("target mask", target_geom),
        ("target aerial image", target),
        (f"optimized mask ({len(hist)} steps)", recovered),
        ("optimized image", forward(params, np.zeros(1, np.float32),
                                    shifts, weights, prob)),
    ], ncols=2)

    # 4. Through-focus montage
    from lithographysimulator_tpu.ops.focus import (
        focus_stack_aberrations, through_focus_images)
    spec = lt.mask_spectrum(lt.demo_bars(cfg).geometry, cfg)
    sh, w, _ = padded_source_arrays(np.asarray(quasar), 8)
    defocus = np.array([-150, -75, 0, 75, 150], np.float32)
    stack = through_focus_images(
        spec, focus_stack_aberrations(np.zeros(5, np.float32), defocus),
        sh, w, cfg, chunk=8, normalize=True)
    save_panels("through_focus", [
        (f"defocus {int(d)} nm", np.asarray(stack)[i])
        for i, d in enumerate(defocus)
    ], ncols=5)

    # 5. Resist: aerial image -> developed profile
    from lithographysimulator_tpu import ResistModel
    res = lt.simulate(lt.demo_bars(cfg), quasar, ab, normalize=True)
    model = lt.ResistModel(threshold=0.35, diffusion_nm=20.0)
    save_panels("resist", [
        ("aerial image", res.image),
        ("resist profile (sigmoid)", model.develop(res.image, cfg)),
        ("developed pattern", model.develop_binary(res.image, cfg)),
    ])

    gallery = DOCS / "GALLERY.md"
    gallery.write_text("""# Gallery

Regenerate with `python tools/make_gallery.py` (CPU, deterministic).

| | |
|---|---|
| ![demo](demo.png) | End-to-end demo (reference parity config): aerial image, diffraction orders, quadrupole source, aberrated pupil |
| ![socs](socs_kernels.png) | Top SOCS eigenkernels of the quadrupole TCC (matrix-free randomized build) |
| ![psm](psm_resolution.png) | Alternating-PSM resolution doubling at 150 nm pitch |
| ![ilt](inverse_litho.png) | Inverse lithography: gradient-optimized mask recovers the target image |
| ![focus](through_focus.png) | Through-focus stack (vmap over defocus) |
| ![resist](resist.png) | Photoresist develop + CD extraction inputs |
""")
    print("wrote", gallery)

    # regenerate the demo 6-panel via the CLI path
    from lithographysimulator_tpu.cli import main as cli_main
    cli_main(["demo", "--out", str(DOCS / "demo.png")])


if __name__ == "__main__":
    main()
