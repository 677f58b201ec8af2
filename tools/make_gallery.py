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
import jax.numpy as jnp
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

    # 6. Vector / immersion imaging at hyper-NA (water, NA 1.35)
    from lithographysimulator_tpu.ops.vector import vector_abbe_image

    cfg_i = lt.OpticsConfig(pixel_number=64, na=1.35, immersion_index=1.437)
    geom_i = np.zeros((64, 64), np.float32)
    geom_i[26:38, 26:38] = 1.0  # isolated contact: strongest vector effects
    spec_i = lt.spectrum_fft(geom_i, cfg_i)
    pup_i = lt.pupil_function(np.zeros(1), cfg_i)
    src_i = np.asarray(lt.LightSource(cfg_i, sigma_out=0.5).classical())
    sh_i, w_i, _ = padded_source_arrays(src_i, 4)
    img_x = vector_abbe_image(spec_i, pup_i, sh_i, w_i, cfg_i,
                              polarization="x", normalize=True)
    img_y = vector_abbe_image(spec_i, pup_i, sh_i, w_i, cfg_i,
                              polarization="y", normalize=True)
    img_u = vector_abbe_image(spec_i, pup_i, sh_i, w_i, cfg_i,
                              polarization="unpolarized", normalize=True)
    save_panels("vector_immersion", [
        ("contact mask", geom_i),
        ("x-polarized (NA 1.35, water)", img_x),
        ("y-polarized", img_y),
        ("unpolarized", img_u),
    ], ncols=4)

    # 7. Full-chip tiled OPC: print fidelity before/after
    from lithographysimulator_tpu.metrology import tiled_focus_images
    from lithographysimulator_tpu.optimize import opc_correct_tiled

    tile_cfg = lt.OpticsConfig(pixel_number=64)
    layout = np.zeros((128, 128), np.float32)
    for y in range(16, 112, 40):
        for x in range(16, 98, 44):
            layout[y:y + 12, x:x + 20] = 1.0
    src_t = np.asarray(lt.LightSource(tile_cfg, sigma_out=0.6).annular())
    resist = lt.ResistModel(threshold=0.3, steepness=30.0)

    def full_print(mask_big):
        img = tiled_focus_images(mask_big, tile_cfg, src_t, [0.0],
                                 rank=48, halo=16)[0]
        return (img / img.max()) > resist.threshold

    corrected = opc_correct_tiled(layout, tile_cfg, src_t, resist=resist,
                                  halo=16, steps=25, rank=48,
                                  learning_rate=0.2)
    save_panels("opc_full_chip", [
        ("target layout (128²)", layout),
        ("print, uncorrected", full_print(layout)),
        ("OPC-corrected mask", corrected),
        ("print, corrected", full_print(corrected)),
    ], ncols=4)

    # 8. Depth-resolved resist: through-film stack -> height map
    from lithographysimulator_tpu import DepthResist, MackResist

    dr = DepthResist(mack=MackResist(thickness_nm=400.0), nz=4,
                     absorbance_per_um=1.5)
    stack_ab8 = focus_stack_aberrations(np.zeros(5), dr.film_defocus_nm())
    film_stack = through_focus_images(spec, stack_ab8, sh, w, cfg, chunk=8)
    save_panels("depth_resist", [
        ("aerial @ resist top", np.asarray(film_stack)[0]),
        ("aerial @ resist bottom", np.asarray(film_stack)[-1]),
        ("remaining height (nm)", dr.height_map_nm(film_stack)),
        ("cleared to substrate", dr.develop_binary(film_stack)),
    ], ncols=4, cmap="cividis")

    # 8b. 3-D eikonal development: standing waves + lateral etch cross-section
    # (wide lines so the depth modulation is visible across a feature)
    dr3 = DepthResist(mack=MackResist(thickness_nm=300.0, develop_s=12.0),
                      nz=24, absorbance_per_um=0.8,
                      substrate_reflectivity=0.25, peb_diffusion_nm=0.0)
    wide = lt.lines_and_spaces(cfg, line_width_px=16, pitch_px=32)
    spec3 = lt.mask_spectrum(wide.geometry, cfg)
    stack_ab3 = focus_stack_aberrations(np.zeros(5), dr3.film_defocus_nm())
    film3 = through_focus_images(spec3, stack_ab3, sh, w, cfg, chunk=8,
                                 normalize=True)
    # latent at LOW dose for display: the exponential stays unsaturated, so
    # the standing-wave bands are visible as depth modulation
    latent_lo = np.asarray(dr3.latent(film3, dose=0.25))
    profile = np.asarray(dr3.develop_profile_binary(
        film3, pixel_size_nm=cfg.pixel_size))
    dr3_peb = lt.DepthResist(mack=dr3.mack, nz=24, absorbance_per_um=0.8,
                             substrate_reflectivity=0.25, peb_diffusion_nm=25.0)
    profile_peb = np.asarray(dr3_peb.develop_profile_binary(
        film3, pixel_size_nm=cfg.pixel_size))
    row = 32
    save_panels("resist3d", [
        ("latent image x-z, low dose (standing waves)",
         1.0 - latent_lo[:, row, :]),
        ("3-D profile x-z (eikonal: scalloped sidewalls)",
         1.0 - profile[:, row, :]),
        ("same + 25 nm PEB (waves smoothed)", 1.0 - profile_peb[:, row, :]),
    ], ncols=3, cmap="copper")

    # 8c. Field-dependent aberrations across the chip
    from lithographysimulator_tpu.ops.tiled import tiled_socs_image_field

    fd_cfg = lt.OpticsConfig(pixel_number=64)
    fd_src = np.asarray(lt.LightSource(fd_cfg, sigma_out=0.6).annular())
    fd_layout = np.broadcast_to(
        ((np.arange(128) // 4) % 2 == 0).astype(np.float32), (128, 128)).copy()
    uni = tiled_socs_image_field(
        fd_layout, fd_cfg, fd_src, lambda fx, fy: np.zeros(5, np.float32),
        field_points=1, rank=32, halo=16)
    fd = tiled_socs_image_field(
        fd_layout, fd_cfg, fd_src,
        lambda fx, fy: np.array([0, 0, 0, 0, 140.0 * (fx**2 + fy**2)],
                                np.float32),
        field_points=3, rank=32, halo=16)
    save_panels("field_aberrations", [
        ("uniform optics", np.asarray(uni)),
        ("field-dependent defocus (scanner slit)", np.asarray(fd)),
        ("|difference| (contrast loss at field edge)",
         np.abs(np.asarray(fd) - np.asarray(uni))),
    ], ncols=3, cmap="inferno")

    # 9. Full-chip process window (CD through focus x dose)
    from lithographysimulator_tpu.metrology import tiled_fem

    lines = np.broadcast_to(
        ((np.arange(128) // 8) % 4 == 0).astype(np.float32), (128, 128)).copy()
    fem = tiled_fem(lines, tile_cfg, src_t,
                    defocus_nm=np.linspace(-150, 150, 7),
                    doses=np.linspace(0.7, 1.3, 7),
                    resist=lt.ResistModel(threshold=0.25), rank=48, halo=16)
    fig, ax = plt.subplots(dpi=170, figsize=(4.6, 3.8))
    im = ax.imshow(fem["cd_nm"], cmap="viridis", aspect="auto",
                   extent=(fem["doses"][0], fem["doses"][-1],
                           fem["defocus_nm"][-1], fem["defocus_nm"][0]))
    ax.set_xlabel("dose")
    ax.set_ylabel("defocus (nm)")
    ax.set_title(
        f"full-chip CD (nm) — DoF {fem['depth_of_focus_nm']:.0f} nm, "
        f"EL {fem['exposure_latitude']:.2f}", fontsize=9)
    fig.colorbar(im, ax=ax, shrink=0.85)
    fig.tight_layout()
    fig.savefig(DOCS / "process_window.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "process_window.png")

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
| ![vector](vector_immersion.png) | Hyper-NA vector imaging in water immersion (NA 1.35): polarization-dependent contact images |
| ![opc](opc_full_chip.png) | Full-chip tile-streamed OPC: corrected mask prints the layout more faithfully |
| ![depth](depth_resist.png) | Depth-resolved resist: through-film aerial stack → development height map |
| ![resist3d](resist3d.png) | 3-D eikonal development: substrate standing waves in the latent image, lateral etch/undercut in the profile, PEB smoothing |
| ![field](field_aberrations.png) | Field-dependent aberrations: per-field-point SOCS kernels print the chip edge with scanner-slit defocus |
| ![pw](process_window.png) | Full-chip focus-exposure matrix → process window (tiled SOCS path) |
| ![polsocs](polarized_socs.png) | Polarized SOCS (round 3): one summed-TCC kernel set carries hyper-NA vector physics on the fast path — matches the exact vector Abbe engine |
| ![cdu](cd_metrology.png) | Full-chip CD metrology (round 3): developed chip, per-region CD-uniformity map, subpixel CD distribution |
| ![chromatic](chromatic.png) | Chromatic imaging (round 3): finite laser bandwidth (E95) blurs focus through the lens's longitudinal chromatic aberration — dense-line contrast erodes with spectral width |
| ![stochastic](stochastic.png) | Stochastic resist (round 3): photon/acid counting trials — photon-starved dose roughens edges (LER ~ 1/sqrt(dose)) and breaks features; print-probability bands over 32 trials |
| ![dp](double_patterning.png) | Double patterning (round 3): 150 nm-pitch grating collapses in a single exposure, prints at full feature count after LELE conflict-graph decomposition |
| ![inspection](inspection.png) | Inspection (round 3): NILS hotspot detection localizes the weak isolated contact; MRC flags sub-width slivers and tiny islands on a mask |
| ![m3d](mask3d_rcwa.png) | Thick-mask M3D (round 4): the in-repo rigorous RCWA near field vs the thin mask, and the first-principles boundary-layer calibration closing the image residual ~10× |
| ![euv](euv_m3d.png) | EUV M3D (round 4): TaBN / 40× Mo-Si reticle at the 6° chief ray — rigorous shadowing (pattern shift) captured by the multi-tap edge-kernel model |
| ![m3dtf](m3d_through_focus.png) | Through-focus M3D calibration (round 4): an in-focus-only fit leaves Im β loose; ±defocus targets pin it and the thick-mask best-focus shift |
""")
    print("wrote", gallery)

    # 13. Polarized SOCS: vector physics on the fast path (round 3)
    cfg_v = lt.OpticsConfig(pixel_number=64, na=1.35, immersion_index=1.437)
    geom_v = np.zeros((64, 64), np.float32)
    for y in range(10, 54, 16):
        for x in range(10, 54, 16):
            geom_v[y:y + 6, x:x + 6] = 1.0
    spec_v = lt.spectrum_fft(geom_v, cfg_v)
    pup_v = lt.pupil_function(np.zeros(1), cfg_v)
    src_v = np.asarray(lt.LightSource(cfg_v, sigma_out=0.5).classical())
    from lithographysimulator_tpu.parallel import padded_source_arrays

    sh_v, w_v, _ = padded_source_arrays(src_v, 4)
    exact = np.asarray(lt.vector_abbe_image(
        spec_v, pup_v, sh_v, w_v, cfg_v, polarization="unpolarized",
        max_abs_shift=int(np.abs(np.asarray(sh_v)).max())))
    socs_s = lt.randomized_socs(pup_v, src_v, cfg_v, rank=96, oversample=32,
                                power_iters=3, lean=False)
    socs_v = lt.randomized_socs_vector(pup_v, src_v, cfg_v, rank=96,
                                       oversample=32, power_iters=3,
                                       polarization="unpolarized")
    img_s = np.asarray(lt.socs_image(spec_v, socs_s, cfg_v))
    img_v = np.asarray(lt.socs_image(spec_v, socs_v, cfg_v))
    save_panels("polarized_socs", [
        ("scalar SOCS (no vector physics)", img_s / img_s.max()),
        ("polarized SOCS (summed-TCC kernels)", img_v / img_v.max()),
        ("exact vector Abbe (oracle)", exact / exact.max()),
        ("|polarized SOCS − exact| ×100", np.abs(img_v / img_v.max()
                                                 - exact / exact.max()) * 100),
    ], ncols=4, cmap="inferno")

    # 14. Full-chip CD metrology: CDU map + width distribution (round 3)
    chip = np.zeros((256, 256), np.float32)
    for x in range(8, 248, 24):
        chip[:, x:x + 8] = 1.0
    chip[140:, 8:15] = 0.0
    chip[140:, 8:14] = 1.0  # one bar narrows in the lower-left region
    tile_cfg = lt.OpticsConfig(pixel_number=128)
    src_c = np.asarray(lt.LightSource(tile_cfg, sigma_out=0.6).classical())
    socs_c = lt.randomized_socs(lt.pupil_function(np.zeros(1), tile_cfg),
                                src_c, tile_cfg, rank=48, power_iters=2,
                                lean=False)
    chip_img = np.asarray(lt.tiled_socs_image(chip, socs_c, tile_cfg,
                                              halo=32))
    profile = (chip_img / chip_img.max() > 0.4).astype(np.float32)
    cdu = lt.cd_uniformity(profile, tile_cfg, map_blocks=8, row_step=1,
                           min_width_nm=50.0)
    widths = lt.feature_table(profile, tile_cfg)["width_nm"]
    fig, axes = plt.subplots(1, 3, dpi=170, figsize=(10.5, 3.4))
    axes[0].imshow(profile, cmap="gray")
    axes[0].set_title("developed full-chip pattern", fontsize=9)
    im = axes[1].imshow(cdu["cd_map_nm"], cmap="viridis")
    axes[1].set_title(
        f"CD map (mean {cdu['mean_cd_nm']:.0f} nm, "
        f"3σ {cdu['cdu_3sigma_nm']:.1f} nm)", fontsize=9)
    fig.colorbar(im, ax=axes[1], shrink=0.8)
    axes[2].hist(widths[widths > 50], bins=24, color="#4477aa")
    axes[2].set_title(f"{cdu['count']} features (subpixel CDs)", fontsize=9)
    axes[2].set_xlabel("CD (nm)")
    for ax in axes[:2]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(DOCS / "cd_metrology.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "cd_metrology.png")

    # 13. Chromatic: laser bandwidth blurs focus and erodes contrast
    cfg_ch = lt.OpticsConfig(pixel_number=32)
    dense = lt.lines_and_spaces(cfg_ch, line_width_px=4, pitch_px=8)
    src_ch = np.asarray(lt.LightSource(cfg_ch, sigma_in=0.2,
                                       sigma_out=0.6).annular())
    fig, axes = plt.subplots(1, 4, dpi=170, figsize=(13.0, 3.4))
    cuts = []
    for ax, bw in zip(axes[:3], (0.0, 1.5, 3.0)):
        spec_l = (lt.LaserSpectrum(bandwidth_pm=bw, focus_nm_per_pm=-400.0,
                                   samples=5) if bw else None)
        img = np.asarray(lt.simulate(dense, src_ch, normalize=True,
                                     chromatic=spec_l).image)
        row = img[cfg_ch.n // 2, 6:-6]
        contrast = (row.max() - row.min()) / (row.max() + row.min())
        cuts.append((bw, img[cfg_ch.n // 2]))
        ax.imshow(img, cmap="viridis")
        ax.set_title(f"E95 = {bw:g} pm  (contrast {contrast:.2f})",
                     fontsize=9)
        ax.axis("off")
    x_nm = (np.arange(cfg_ch.n) - cfg_ch.n / 2) * cfg_ch.pixel_size
    for bw, cut in cuts:
        axes[3].plot(x_nm, cut / cuts[0][1].max(), label=f"{bw:g} pm")
    axes[3].set_title("center cut: spaces fill in", fontsize=9)
    axes[3].set_xlabel("x (nm)")
    axes[3].legend(fontsize=8, title="E95")
    fig.tight_layout()
    fig.savefig(DOCS / "chromatic.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "chromatic.png")

    # 14. Stochastic resist: dose-dependent LER and the print-probability band
    from lithographysimulator_tpu.models.resist import ResistModel
    from lithographysimulator_tpu.models.stochastic import (
        StochasticResist, stochastic_ensemble)

    cfg_st = lt.OpticsConfig(pixel_number=128, pixel_size=5.0)
    geom = np.abs(np.asarray(lt.lines_and_spaces(
        cfg_st, line_width_px=16, pitch_px=32).geometry, np.float32))
    soft = np.asarray(ResistModel(diffusion_nm=30.0).blur(
        jnp.asarray(geom), cfg_st))
    fig, axes = plt.subplots(1, 4, dpi=170, figsize=(13.0, 3.4))
    axes[0].imshow(soft, cmap="inferno")
    axes[0].set_title("aerial image", fontsize=9)
    doses = (3.0, 12.0, 60.0)
    lers = []
    for ax, dose in zip(axes[1:], doses):
        out = stochastic_ensemble(
            soft, cfg_st,
            StochasticResist(dose_photons_per_nm2=dose, diffusion_nm=5.0,
                             threshold=0.4),
            trials=32, seed=0)
        lers.append(out["ler_nm"])
        ax.imshow(out["print_probability"], cmap="RdBu_r", vmin=0, vmax=1)
        ax.set_title(f"{dose:g} ph/nm$^2$: LER {out['ler_nm']:.1f} nm, "
                     f"break {out['break_rate']:.1%}", fontsize=8)
    for ax in axes:
        ax.axis("off")
    fig.suptitle("stochastic printing: photon-starved dose roughens and "
                 "breaks features (print probability over 32 trials)",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(DOCS / "stochastic.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "stochastic.png")

    # 15. Double patterning: the dense grating only prints decomposed
    from lithographysimulator_tpu.models.multipatterning import lele_print

    cfg_dp = lt.OpticsConfig(pixel_number=64)
    m_dp = np.zeros((64, 64), np.float32)
    for x in range(4, 60, 6):
        m_dp[8:-8, x:x + 3] = 1.0  # 150 nm pitch
    src_dp = np.asarray(lt.LightSource(cfg_dp, sigma_out=0.3).classical())
    dp = lele_print(m_dp, cfg_dp, src_dp, min_pitch_nm=200.0,
                    resist=lt.ResistModel(threshold=0.45), rank=48, halo=16)
    save_panels("double_patterning", [
        ("target: 150 nm pitch", m_dp),
        ("mask A (300 nm pitch)", dp["mask_a"]),
        ("mask B", dp["mask_b"]),
        ("single exposure: collapsed", dp["profile_single"]),
        ("LELE union: resolved", dp["profile"]),
    ], ncols=5)

    # 16. Inspection: NILS hotspots + MRC violations
    from lithographysimulator_tpu.models.mrc import MaskRules, mrc_check
    from lithographysimulator_tpu.models.resist import hotspots

    cfg_in = lt.OpticsConfig(pixel_number=128, pixel_size=12.5)
    m_in = np.zeros((128, 128), np.float32)
    for x in range(8, 120, 12):
        m_in[8:72, x:x + 5] = 1.0          # dense upper grating
    m_in[88:94, 20:26] = 1.0               # small isolated contact: weak
    m_in[88:118, 60:66] = 1.0              # isolated line
    src_in = np.asarray(lt.LightSource(cfg_in, sigma_out=0.6).annular())
    img_in = np.asarray(lt.simulate(
        lt.from_array(m_in, cfg_in), src_in, solver="socs",
        socs_rank=64).image)
    spots = hotspots(img_in, cfg_in, threshold=0.3, nils_limit=2.2,
                     row_step=1, top=400)
    mrc_mask = m_in.copy()
    mrc_mask[100:102, 90:112] = 1.0        # 25 nm sliver
    mrc_mask[30:32, 122:124] = 1.0         # tiny island
    check = mrc_check(mrc_mask, cfg_in,
                      MaskRules(min_width_nm=50.0, min_area_nm2=3000.0))
    fig, axes = plt.subplots(1, 3, dpi=170, figsize=(10.2, 3.6))
    axes[0].imshow(img_in, cmap="inferno")
    axes[0].set_title("aerial image", fontsize=9)
    axes[1].imshow(img_in, cmap="gray")
    if len(spots["locations"]):
        loc = np.asarray(spots["locations"])
        axes[1].scatter(loc[:, 1] / cfg_in.pixel_size,
                        loc[:, 0] / cfg_in.pixel_size, s=6, c="red",
                        alpha=0.6)
    axes[1].set_title(
        f"hotspots: NILS < {spots['nils_limit']:g} "
        f"({spots['count']} edges)", fontsize=9)
    viol = (check.get("width_violations", 0).astype(int)
            + 2 * check.get("area_violations", np.zeros_like(m_in)).astype(int))
    axes[2].imshow(mrc_mask + 2.0 * (viol > 0), cmap="magma", vmax=3)
    axes[2].set_title(
        f"MRC: {check['width_violation_px']}px sub-width, "
        f"{check['area_violation_components']} small islands", fontsize=9)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(DOCS / "inspection.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "inspection.png")

    # 17. Thick-mask (M3D): RCWA rigorous field vs thin mask vs calibrated BL
    from lithographysimulator_tpu.ops.mask3d import (boundary_layer_from_rcwa,
                                                     grating_geometry)
    from lithographysimulator_tpu.ops.rcwa import rcwa_effective_mask

    cfg_m = lt.OpticsConfig(pixel_number=64)
    pitch, duty = 16, 7 / 16
    bl_m, rep_m = boundary_layer_from_rcwa(
        cfg_m, stack="binary_cr", pitch_px=pitch, duty=duty,
        illumination_pol="unpolarized", steps=120)
    geom_m = grating_geometry(cfg_m, pitch_px=pitch, duty=duty)
    rig_te = rcwa_effective_mask(cfg_m, pitch_px=pitch, duty=duty, pol="te")
    rig_tm = rcwa_effective_mask(cfg_m, pitch_px=pitch, duty=duty, pol="tm")
    src_m = np.asarray(lt.LightSource(cfg_m, sigma_out=0.5).classical())

    def img_of(g):
        out = np.asarray(lt.simulate(lt.from_array(g, cfg_m), src_m,
                                     normalize=True).image)
        return out / out.max()

    img_rig = 0.5 * (img_of(rig_te) + img_of(rig_tm))
    img_thin = img_of(np.asarray(geom_m))
    img_corr = img_of(np.asarray(
        jax.jit(bl_m.apply, static_argnums=1)(geom_m, cfg_m)))
    row_m = cfg_m.n // 2
    x_px = np.arange(2 * pitch)
    fig, axes = plt.subplots(1, 3, dpi=170, figsize=(11.4, 3.4))
    axes[0].step(x_px, np.abs(np.asarray(geom_m))[row_m, :2 * pitch],
                 where="mid", label="thin (drawn)", color="#888888")
    axes[0].plot(x_px, np.abs(rig_te)[row_m, :2 * pitch], label="RCWA TE")
    axes[0].plot(x_px, np.abs(rig_tm)[row_m, :2 * pitch], label="RCWA TM")
    axes[0].set_title("mask near field |t(x)| (68 nm Cr topography)",
                      fontsize=9)
    axes[0].set_xlabel("x (px)")
    axes[0].legend(fontsize=7)
    axes[1].plot(img_rig[row_m], label="rigorous (RCWA)", color="black")
    axes[1].plot(img_thin[row_m], "--", label="thin mask")
    axes[1].plot(img_corr[row_m], ":", label="thin + calibrated BL",
                 color="#cc3311", lw=2)
    axes[1].set_title("aerial image center cut", fontsize=9)
    axes[1].legend(fontsize=7)
    axes[2].plot((img_thin - img_rig)[row_m] * 100, label="thin − rigorous")
    axes[2].plot((img_corr - img_rig)[row_m] * 100, label="BL − rigorous",
                 color="#cc3311")
    axes[2].set_title(
        f"image residual ×100 (NRMS {rep_m['thin_nrms']['avg']:.2%} → "
        f"{rep_m['fit_nrms']['avg']:.2%})", fontsize=9)
    axes[2].set_xlabel("x (px)")
    axes[2].legend(fontsize=7)
    fig.suptitle("first-principles M3D: in-repo RCWA → boundary-layer "
                 "calibration (no external EMF tool)", fontsize=10)
    fig.tight_layout()
    fig.savefig(DOCS / "mask3d_rcwa.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "mask3d_rcwa.png")

    # 18. EUV: chief-ray shadowing + the multi-tap edge-kernel model
    from lithographysimulator_tpu.ops.rcwa import thin_mask_transmission

    cfg_e = lt.OpticsConfig(pixel_number=32, wavelength=13.5, na=0.33,
                            pixel_size=4.0)
    ek, rep_e = boundary_layer_from_rcwa(
        cfg_e, stack="euv_ta", pitch_px=16, illumination_pol="unpolarized",
        steps=300, incidence_deg=6.0, taps=1)
    geom_e = grating_geometry(
        cfg_e, pitch_px=16, duty=7 / 16,
        transmission=thin_mask_transmission("euv_ta", 13.5, 6.0))
    src_e = np.asarray(lt.LightSource(cfg_e, sigma_out=0.5).classical())

    def img_e(g):
        out = np.asarray(lt.simulate(lt.from_array(np.asarray(g), cfg_e),
                                     src_e, normalize=True).image)
        return out / out.max()

    rig_imgs = [img_e(rcwa_effective_mask(cfg_e, pitch_px=16, duty=7 / 16,
                                          stack="euv_ta", pol=p,
                                          incidence_deg=6.0))
                for p in ("te", "tm")]
    rig_img = 0.5 * (rig_imgs[0] + rig_imgs[1])
    thin_img_e = img_e(np.asarray(geom_e))
    corr_img_e = img_e(np.asarray(
        jax.jit(ek.apply, static_argnums=1)(geom_e, cfg_e)))
    nf0 = np.abs(rcwa_effective_mask(cfg_e, pitch_px=16, duty=7 / 16,
                                     stack="euv_ta", pol="te",
                                     incidence_deg=0.0)[0, :32])
    nf6 = np.abs(rcwa_effective_mask(cfg_e, pitch_px=16, duty=7 / 16,
                                     stack="euv_ta", pol="te",
                                     incidence_deg=6.0)[0, :32])
    rr = cfg_e.n // 2
    fig, axes = plt.subplots(1, 3, dpi=170, figsize=(11.4, 3.4))
    axes[0].plot(nf0, label="normal incidence", color="#888888")
    axes[0].plot(nf6, label="6° chief ray", color="#cc3311")
    axes[0].set_title("EUV reflected near field |r(x)|: shadowing breaks "
                      "the mirror symmetry", fontsize=8.5)
    axes[0].set_xlabel("x (px)")
    axes[0].legend(fontsize=7)
    axes[1].plot(rig_img[rr], label="rigorous (RCWA @6°)", color="black")
    axes[1].plot(thin_img_e[rr], "--", label="thin mask")
    axes[1].plot(corr_img_e[rr], ":", label="edge kernel K=1",
                 color="#cc3311", lw=2)
    axes[1].set_title("aerial image cut: the line prints SHIFTED "
                      "(pattern shift)", fontsize=8.5)
    axes[1].legend(fontsize=7)
    axes[2].plot((thin_img_e - rig_img)[rr] * 100, label="thin − rigorous")
    axes[2].plot((corr_img_e - rig_img)[rr] * 100,
                 label="edge kernel − rigorous", color="#cc3311")
    axes[2].set_title(
        f"residual ×100 (NRMS {rep_e['thin_nrms']['avg']:.1%} → "
        f"{rep_e['fit_nrms']['avg']:.2%})", fontsize=8.5)
    axes[2].set_xlabel("x (px)")
    axes[2].legend(fontsize=7)
    fig.suptitle("EUV M3D: TaBN / 40× Mo-Si reticle at the 6° chief ray — "
                 "rigorous shadowing captured by the multi-tap edge kernel",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(DOCS / "euv_m3d.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "euv_m3d.png")

    # 19. Through-focus M3D calibration: pinning the best-focus shift
    from lithographysimulator_tpu.ops.focus import focus_stack_aberrations

    cfg_f = lt.OpticsConfig(pixel_number=32)
    sweep = np.linspace(-120.0, 120.0, 9)
    sweep_ab = np.asarray(focus_stack_aberrations(
        np.zeros(5, np.float32), sweep.astype(np.float32)))
    bl_if, _ = boundary_layer_from_rcwa(cfg_f, stack="binary_cr",
                                        pitch_px=16, steps=120)
    bl_tf, _ = boundary_layer_from_rcwa(cfg_f, stack="binary_cr",
                                        pitch_px=16, steps=120,
                                        defocus_nm=(-80.0, 0.0, 80.0))
    geom_f = grating_geometry(cfg_f, pitch_px=16, duty=9 / 16,
                              transmission=0.0)
    src_f = np.asarray(lt.LightSource(cfg_f, sigma_out=0.5).classical())

    def stack_of(g):
        imgs = np.stack([
            np.asarray(lt.simulate(lt.from_array(np.asarray(g), cfg_f),
                                   src_f, ab, normalize=True).image)
            for ab in sweep_ab])
        return imgs / imgs.max()

    rig_stack = 0.5 * sum(
        stack_of(rcwa_effective_mask(cfg_f, pitch_px=16, duty=9 / 16,
                                     stack="binary_cr", pol=p))
        for p in ("te", "tm"))
    rig_stack = rig_stack / rig_stack.max()
    thin_stack = stack_of(np.asarray(geom_f))
    if_stack = stack_of(np.asarray(
        jax.jit(bl_if.apply, static_argnums=1)(geom_f, cfg_f)))
    tf_stack = stack_of(np.asarray(
        jax.jit(bl_tf.apply, static_argnums=1)(geom_f, cfg_f)))

    def per_plane_nrms(s):
        return np.sqrt(np.mean((s - rig_stack) ** 2, axis=(1, 2)))

    def focus_asymmetry(s):
        # ||image(+d) - image(-d)|| per defocus magnitude: a thin mask is
        # exactly focus-symmetric (zero), a thick mask is not — this
        # first-order signal is what pins Im β in the through-focus fit
        half = len(sweep) // 2
        return 100 * np.asarray([
            np.sqrt(np.mean((s[half + i] - s[half - i]) ** 2))
            for i in range(1, half + 1)])

    fig, axes = plt.subplots(1, 2, dpi=170, figsize=(8.2, 3.4))
    axes[0].plot(sweep, 100 * per_plane_nrms(thin_stack), "--",
                 label="thin mask", color="#888888")
    axes[0].plot(sweep, 100 * per_plane_nrms(if_stack),
                 label=f"BL, in-focus fit (Im β={bl_if.beta_v.imag:+.2f})",
                 color="#4477aa")
    axes[0].plot(sweep, 100 * per_plane_nrms(tf_stack),
                 label=f"BL, through-focus fit (Im β={bl_tf.beta_v.imag:+.2f})",
                 color="#cc3311")
    axes[0].set_xlabel("defocus (nm)")
    axes[0].set_ylabel("image NRMS vs rigorous (%)")
    axes[0].set_title("an in-focus-only fit leaves Im β loose —\n"
                      "the error grows off focus", fontsize=8.5)
    axes[0].legend(fontsize=7)
    dmag = sweep[len(sweep) // 2 + 1:]
    axes[1].plot(dmag, focus_asymmetry(rig_stack), "k",
                 label="rigorous (RCWA)")
    axes[1].plot(dmag, focus_asymmetry(thin_stack), "--",
                 label="thin mask (exactly symmetric)", color="#888888")
    axes[1].plot(dmag, focus_asymmetry(tf_stack), ":", lw=2,
                 label="BL, through-focus fit", color="#cc3311")
    axes[1].set_xlabel("|defocus| (nm)")
    axes[1].set_ylabel("||img(+d) − img(−d)|| ×100")
    axes[1].set_title("the thick mask breaks focus symmetry —\n"
                      "the first-order signal that pins Im β",
                      fontsize=8.5)
    axes[1].legend(fontsize=7)
    fig.suptitle("Through-focus M3D calibration (m3dcal --defocus): "
                 "pinning Im β and the best-focus-shift direction",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(DOCS / "m3d_through_focus.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "m3d_through_focus.png")

    # 20. Line-end / corner M3D residual vs the 2-D rigorous oracle (round 5)
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa
    from lithographysimulator_tpu.ops.rcwa2d import (boxes_geometry,
                                                     rcwa2d_effective_mask)
    from lithographysimulator_tpu.xfer import to_device_complex

    cfg_le = lt.OpticsConfig(pixel_number=32)
    src_le = np.asarray(lt.LightSource(cfg_le, sigma_out=0.5).classical())
    bar = ((4.5 / 16, 3.5 / 16, 11.5 / 16, 12.5 / 16),)

    def img_le(field):
        if isinstance(field, np.ndarray):
            geom = to_device_complex(np.ascontiguousarray(
                field.astype(np.complex128))).astype(jnp.complex64)
        else:
            geom = field
        out = np.asarray(lt.simulate(
            lt.Mask(geometry=geom, config=cfg_le), src_le,
            normalize=True).image)
        return out / out.max()

    rig2d = 0.5 * sum(img_le(rcwa2d_effective_mask(
        cfg_le, boxes=bar, pitch_x_px=16, pitch_y_px=16, pol=p,
        mx_max=12, my_max=12)) for p in ("x", "y"))
    thin_le = boxes_geometry(cfg_le, bar, 16, 16)
    ek_le, _ = boundary_layer_from_rcwa(
        cfg_le, stack="binary_cr", pitch_px=16,
        illumination_pol="unpolarized", steps=150, taps=1)
    model_le = img_le(jax.jit(ek_le.apply, static_argnums=1)(thin_le,
                                                             cfg_le))
    thin_img_le = img_le(thin_le)

    def nrms_le(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    lim = max(np.abs(thin_img_le - rig2d).max(),
              np.abs(model_le - rig2d).max())
    save_panels("lineend_2d", [
        ("rigorous 2-D RCWA aerial image (line-end array)", rig2d),
        (f"thin-mask residual (NRMS {nrms_le(thin_img_le, rig2d):.2%})",
         np.abs(thin_img_le - rig2d) / lim),
        (f"1-D-calibrated kernel residual "
         f"(NRMS {nrms_le(model_le, rig2d):.2%})",
         np.abs(model_le - rig2d) / lim),
    ], ncols=3, cmap="magma")

    panel_stochastic_volume()
    panel_m3d_azimuth()

    # regenerate the demo 6-panel via the CLI path
    from lithographysimulator_tpu.cli import main as cli_main
    cli_main(["demo", "--out", str(DOCS / "demo.png")])


def panel_stochastic_volume():
    # 21. Volumetric stochastic resist on the rigorous in-film exposure
    # (round 5): depth-resolved LER + photon-starved bottom-slab defects
    cfg_v = lt.OpticsConfig(pixel_number=64)
    src_v = np.asarray(lt.LightSource(cfg_v, sigma_out=0.5).classical())
    mask_v = lt.lines_and_spaces(cfg_v, line_width_px=7, pitch_px=16)
    nz_v = 24
    dz_v = 300.0 / nz_v
    depths_v = [dz_v * (i + 0.5) for i in range(nz_v)]

    def exposure(wafer):
        st = np.asarray(lt.film_stack_images(
            mask_v, src_v, config=cfg_v, wafer_stack=wafer,
            depths_nm=depths_v, normalize=True))
        return st / st.max()

    stack_bare = exposure(lt.WaferStack(n_resist=1.71 + 0.02j,
                                        thickness_nm=300.0))
    stack_v = exposure(lt.WaferStack(
        n_resist=1.71 + 0.04j, thickness_nm=300.0,
        under_layers=((37.0, 1.82 + 0.39j),)))
    vol = lt.stochastic_volume_ensemble(
        stack_v, cfg_v,
        lt.StochasticResist(dose_photons_per_nm2=6.0, diffusion_nm=4.0,
                            threshold=0.2),
        dz_nm=dz_v, trials=24, seed=3)
    band_v = vol["print_probability"]
    fig, axes = plt.subplots(1, 5, dpi=170, figsize=(16.5, 3.4))
    row_v = cfg_v.n // 2
    for ax, st, ttl in [
            (axes[0], stack_bare, "in-film exposure x-z, bare Si\n"
             "(substrate standing waves)"),
            (axes[1], stack_v, "with BARC + absorption\n"
             "(swing suppressed, Beer-Lambert decay)")]:
        ax.imshow(st[:, row_v, :], cmap="inferno", aspect="auto",
                  extent=[0, cfg_v.n, 300.0, 0.0], vmin=0, vmax=1)
        ax.set_title(ttl, fontsize=9)
        ax.set_ylabel("depth (nm)", fontsize=8)
    ds = [s["depth_nm"] for s in vol["slabs"]]
    axes[2].plot(ds, [s["ler_nm"] for s in vol["slabs"]], "o-",
                 color="#b5453c")
    axes[2].set_title("z-resolved LER (3$\\sigma$)\ngrows toward the "
                      "photon-starved bottom", fontsize=9)
    axes[2].set_xlabel("depth (nm)", fontsize=8)
    axes[2].set_ylabel("LER (nm)", fontsize=8)
    axes[2].grid(alpha=0.3)
    for ax, (slab, ttl) in zip(
            axes[3:], [(0, "print probability, top slab"),
                       (nz_v - 1, "print probability, bottom slab\n"
                        "(stochastic footing/bridging)")]):
        ax.imshow(band_v[slab], cmap="viridis", vmin=0, vmax=1)
        ax.set_title(ttl, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(DOCS / "stochastic_volume.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "stochastic_volume.png")


def panel_m3d_azimuth():
    # 22. Azimuth-resolved EUV M3D (round 5): across-slit chief-ray
    # rotation moves the shadowing asymmetry from V edges onto H edges
    from lithographysimulator_tpu.ops.mask3d import boundary_layer_from_rcwa

    cfg_az = lt.OpticsConfig(pixel_number=32, wavelength=13.5, na=0.33,
                             pixel_size=4.0)

    def tap_asym(rise, fall):
        return max(abs(a - b) for a, b in zip(rise, fall[::-1]))

    azimuths = [0.0, 20.0, 40.0, 60.0]
    fits = {}
    for az in azimuths:
        ek_az, _ = boundary_layer_from_rcwa(
            cfg_az, stack="euv_ta", pitch_px=16,
            illumination_pol="unpolarized", steps=200, incidence_deg=6.0,
            taps=1, azimuth_deg=az)
        fits[az] = ek_az
    v_asym = [tap_asym(fits[a].taps_v_rise, fits[a].taps_v_fall)
              for a in azimuths]
    h_asym = [tap_asym(fits[a].taps_h_rise, fits[a].taps_h_fall)
              for a in azimuths]
    fig, axes = plt.subplots(1, 3, dpi=170, figsize=(10.5, 3.4))
    axes[0].plot(azimuths, v_asym, "o-", color="#2d5f8a",
                 label="vertical edges")
    axes[0].plot(azimuths, h_asym, "s-", color="#b5453c",
                 label="horizontal edges")
    axes[0].set_title("EUV shadowing asymmetry vs chief-ray azimuth\n"
                      "(6° tilt, TaBN reticle, taps=1)", fontsize=9)
    axes[0].set_xlabel("azimuth from +x (deg)", fontsize=8)
    axes[0].set_ylabel("max |rise − mirrored fall| tap gap", fontsize=8)
    axes[0].legend(fontsize=8)
    axes[0].grid(alpha=0.3)
    offs = np.arange(-1, 2)
    for ax, az in zip(axes[1:], (0.0, 60.0)):
        ek_az = fits[az]
        ax.plot(offs, np.abs(np.asarray(ek_az.taps_v_rise)), "o-",
                color="#2d5f8a", label="V rise")
        ax.plot(offs, np.abs(np.asarray(ek_az.taps_v_fall))[::-1], "o--",
                color="#7aa6c9", label="V fall (mirrored)")
        ax.plot(offs, np.abs(np.asarray(ek_az.taps_h_rise)), "s-",
                color="#b5453c", label="H rise")
        ax.plot(offs, np.abs(np.asarray(ek_az.taps_h_fall))[::-1], "s--",
                color="#d99a94", label="H fall (mirrored)")
        ax.set_title(f"|edge taps| at azimuth {az:.0f}°", fontsize=9)
        ax.set_xlabel("tap offset (px)", fontsize=8)
        ax.set_xticks(offs)
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(DOCS / "m3d_azimuth.png", bbox_inches="tight")
    plt.close(fig)
    print("wrote", DOCS / "m3d_azimuth.png")


if __name__ == "__main__":
    # `python tools/make_gallery.py panel_a panel_b` regenerates only the
    # named panel_* functions; no args regenerates everything.
    if len(sys.argv) > 1:
        for name in sys.argv[1:]:
            globals()[f"panel_{name}"]()
    else:
        main()
