"""Command-line interface: simulate, demo figure, SOCS kernel builds.

The reference's only entry points are hard-coded ``__main__`` demo blocks
(``imageformation.py:79-149`` and the per-module plot demos); this CLI
exposes the same workflows with every parameter switchable, plus artifact
output (.npy/.png) suitable for batch runs.

Usage:
    python -m lithographysimulator_tpu demo --out demo.png
    python -m lithographysimulator_tpu simulate --pixel-number 512 \
        --source quasar --sigma-in 0.4 --sigma-out 0.8 --poles 4 \
        --aberrations 0 0 0.01 0 100 --solver gau23 --out aerial.npy
    python -m lithographysimulator_tpu socs --pixel-number 1024 --rank 256 \
        --source annular --out kernels.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _build_config(args):
    from .config import OpticsConfig

    return OpticsConfig(
        pixel_number=args.pixel_number,
        pixel_size=args.pixel_size,
        wavelength=args.wavelength,
        na=args.na,
        immersion_index=args.immersion_index,
        channel_tol=args.channel_tol,
        obscuration=args.obscuration,
    )


def _build_source(args, config):
    from .models.source import LightSource

    ls = LightSource(config, sigma_in=args.sigma_in, sigma_out=args.sigma_out,
                     shift_x=args.shift_x, shift_y=args.shift_y)
    if args.source == "annular":
        return ls.annular()
    if args.source == "classical":
        return ls.classical()
    if args.source == "quasar":
        return ls.quasar(args.poles, args.rotation)
    if args.source == "dipole":
        return ls.dipole(args.rotation)
    if args.source == "monopole":
        return ls.monopole()
    raise SystemExit(f"unknown source kind {args.source!r}")


def _build_mask(args, config):
    from .models import mask as mask_mod

    if args.mask_file:
        if str(args.mask_file).lower().endswith((".gds", ".gdsii")):
            from .io.layout import mask_from_gds

            return mask_from_gds(args.mask_file, config, layer=args.gds_layer)
        return mask_mod.from_array(np.load(args.mask_file), config)
    if args.mask == "demo":
        return mask_mod.demo_bars(config)
    if args.mask == "lines":
        n = config.n
        return mask_mod.lines_and_spaces(
            config, line_width_px=max(1, n // 16), pitch_px=max(2, n // 8))
    if args.mask == "contacts":
        n = config.n
        return mask_mod.contact_holes(config, hole_px=max(1, n // 16),
                                      pitch_px=max(2, n // 8))
    raise SystemExit(f"unknown mask kind {args.mask!r}")


def _resolve_aberrations(args):
    """--aberrations reordered from the chosen indexing scheme into the
    OSA-ordered vector the pipeline consumes (in place on args)."""
    if (getattr(args, "aberrations", None)
            and getattr(args, "zernike_indexing", "osa") != "osa"):
        from .ops.zernike import to_osa_coefficients

        args.aberrations = [
            float(c) for c in to_osa_coefficients(
                args.aberrations, scheme=args.zernike_indexing)]
    return args


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--pixel-number", type=int, default=64)
    p.add_argument("--pixel-size", type=float, default=25.0)
    p.add_argument("--wavelength", type=float, default=193.0)
    p.add_argument("--na", type=float, default=0.7)
    p.add_argument("--immersion-index", type=float, default=1.0,
                   help="image-side medium index (1.437 = water at 193 nm; "
                        "enables hyper-NA vector imaging)")
    p.add_argument("--obscuration", type=float, default=0.0,
                   help="central pupil obscuration as a fraction of NA "
                        "(high-NA EUV optics, e.g. 0.2)")
    p.add_argument("--channel-tol", type=float, default=1e-6,
                   help="principal-channel compression trace tolerance for "
                        "polarized/chromatic kernel builds (raise to trade "
                        "accuracy for build speed; exact error bound)")
    p.add_argument("--mask", default="demo", choices=["demo", "lines", "contacts"])
    p.add_argument("--mask-file", default=None,
                   help=".npy array or .gds layout for the mask (overrides --mask)")
    p.add_argument("--gds-layer", type=int, default=None,
                   help="layer to keep when --mask-file is GDSII")
    p.add_argument("--source", default="quasar",
                   choices=["annular", "classical", "quasar", "dipole", "monopole"])
    p.add_argument("--sigma-in", type=float, default=0.4)
    p.add_argument("--sigma-out", type=float, default=0.8)
    p.add_argument("--shift-x", type=float, default=0.0)
    p.add_argument("--shift-y", type=float, default=0.0)
    p.add_argument("--poles", type=int, default=4)
    p.add_argument("--rotation", type=float, default=-np.pi / 8)
    p.add_argument("--aberrations", type=float, nargs="*", default=None,
                   help="Zernike coefficients in --zernike-indexing order "
                        "(OSA entry 4 / Noll term 4 is defocus in nm)")
    p.add_argument("--zernike-indexing", default="osa",
                   choices=["osa", "noll", "fringe"],
                   help="single-index convention of --aberrations "
                        "(reordered to OSA internally)")
    p.add_argument("--mask3d-width", type=float, default=0.0,
                   help="thick-mask boundary-layer strip width in nm "
                        "(0 = thin/Kirchhoff mask)")
    p.add_argument("--mask3d-beta-h", type=complex, default=0j,
                   help="complex strip transmission on horizontal edges, "
                        "e.g. '-0.2+0.1j'")
    p.add_argument("--mask3d-beta-v", type=complex, default=0j,
                   help="complex strip transmission on vertical edges")
    p.add_argument("--m3d", metavar="FILE", default=None,
                   help="calibrated M3D model JSON from 'm3dcal --out' "
                        "(boundary layer incl. asymmetry, or multi-tap edge "
                        "kernel); overrides the scalar --mask3d-* flags")


def _build_mask3d(args):
    """M3D model from CLI flags, or None when the model is off: a full
    calibrated model file (--m3d, from m3dcal) wins over the scalar
    BoundaryLayer flags."""
    m3d_file = getattr(args, "m3d", None)
    if m3d_file:
        from .ops.mask3d import model_from_json

        return model_from_json(m3d_file)
    width = getattr(args, "mask3d_width", 0.0)
    bh = getattr(args, "mask3d_beta_h", 0j)
    bv = getattr(args, "mask3d_beta_v", 0j)
    if width == 0.0 or (bh == 0 and bv == 0):
        return None
    from .ops.mask3d import BoundaryLayer

    return BoundaryLayer(width_nm=width, beta_h=bh, beta_v=bv)


def _add_perturb(p):
    p.add_argument("--msd-x", type=float, default=0.0,
                   help="scanner stage-blur MSD along x (nm, 1-sigma)")
    p.add_argument("--msd-y", type=float, default=0.0,
                   help="scanner stage-blur MSD along y (nm, 1-sigma)")
    p.add_argument("--flare-tis", type=float, default=0.0,
                   help="flare: total integrated scatter in [0, 1)")
    p.add_argument("--flare-kernel", type=float, default=0.0,
                   help="flare spread sigma in nm (0 = uniform background)")


def _build_perturb(args):
    """ImagePerturbation from CLI flags, or None when all off."""
    vals = (getattr(args, "msd_x", 0.0), getattr(args, "msd_y", 0.0),
            getattr(args, "flare_tis", 0.0),
            getattr(args, "flare_kernel", 0.0))
    if not any(vals):
        return None
    from .ops.perturb import ImagePerturbation

    return ImagePerturbation(msd_x_nm=vals[0], msd_y_nm=vals[1],
                             flare_tis=vals[2], flare_kernel_nm=vals[3])


def _add_chromatic(p):
    p.add_argument("--bandwidth-pm", type=float, default=0.0,
                   help="E95 laser bandwidth in pm (0 = monochromatic)")
    p.add_argument("--chromatic-focus", type=float, default=-250.0,
                   help="longitudinal chromatic aberration, nm defocus "
                        "per pm of wavelength")
    p.add_argument("--chromatic-samples", type=int, default=7)
    p.add_argument("--chromatic-shape", default="gaussian",
                   choices=["gaussian", "lorentzian", "tophat"])


def _build_chromatic(args):
    """LaserSpectrum from CLI flags, or None when monochromatic."""
    if getattr(args, "bandwidth_pm", 0.0) == 0.0:
        return None
    from .config import LaserSpectrum

    return LaserSpectrum(bandwidth_pm=args.bandwidth_pm,
                         focus_nm_per_pm=args.chromatic_focus,
                         samples=args.chromatic_samples,
                         shape=args.chromatic_shape)


def cmd_simulate(args) -> int:
    from .simulate import simulate
    from .utils.artifacts import save_image

    config = _build_config(args)
    mask = _build_mask(args, config)
    source = _build_source(args, config)
    polarization = None if args.polarization == "scalar" else args.polarization
    result = simulate(mask, source, args.aberrations, solver=args.solver,
                      chunk=args.chunk, normalize=args.normalize,
                      polarization=polarization, mask3d=_build_mask3d(args),
                      chromatic=_build_chromatic(args),
                      perturb=_build_perturb(args))
    print(json.dumps(result.report, default=repr))
    if args.out:
        save_image(args.out, result.image, result.report)
        print(f"wrote {args.out}")
    if args.plot:
        _plot_pipeline(result, mask, args.plot)
        print(f"wrote {args.plot}")
    return 0


def cmd_socs(args) -> int:
    import functools

    import jax
    import jax.numpy as jnp

    from .models.pupil import pupil_function
    from .ops.hopkins import (randomized_socs, randomized_socs_chromatic,
                              randomized_socs_vector, vector_pupil_power)
    from .utils.artifacts import save_socs

    config = _build_config(args)
    source = _build_source(args, config)
    aberr = jnp.asarray(args.aberrations if args.aberrations else [0.0], jnp.float32)
    polarization = (None if args.polarization == "scalar"
                    else args.polarization)
    chromatic = _build_chromatic(args)

    # Aberration-independent principal-channel rotation (chromatic/vector
    # stacks), shared with the simulate-layer build cache.
    from .simulate import _channel_rotation_cached

    rot = _channel_rotation_cached(config, polarization, True, chromatic)

    # complex math must stay under jit on the TPU tunnel (CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=())
    def build(a, s_map, channel_rotation=None):
        pupil = pupil_function(a, config)
        lean = {"auto": "auto", "on": True, "off": False}[args.lean]
        if chromatic is not None:
            socs = randomized_socs_chromatic(
                a, s_map, config, spectrum=chromatic, rank=args.rank,
                power_iters=args.power_iters, polarization=polarization,
                channel_rotation=channel_rotation)
        elif polarization is None:
            socs = randomized_socs(pupil, s_map, config, rank=args.rank,
                                   power_iters=args.power_iters, lean=lean)
        else:
            socs = randomized_socs_vector(
                pupil, s_map, config, rank=args.rank,
                power_iters=args.power_iters, polarization=polarization,
                channel_rotation=channel_rotation)
        if polarization is None:
            r0 = jnp.sum(jnp.abs(pupil) ** 2)
        else:
            r0 = vector_pupil_power(pupil, config, polarization=polarization)
        return socs, r0

    t0 = time.perf_counter()
    socs, r0 = jax.block_until_ready(
        build(aberr, jnp.asarray(np.asarray(source)), rot))
    elapsed = time.perf_counter() - t0
    ev = np.asarray(socs.eigenvalues)
    trace = float(np.asarray(source).sum()) * float(r0)
    print(json.dumps({
        "rank": int(socs.rank), "build_s": round(elapsed, 3),
        "eig_max": float(ev[0]), "eig_min_kept": float(ev[-1]),
        "energy_captured": round(float(ev.sum()) / trace, 6) if trace > 0 else 1.0,
        "channels": None if rot is None else int(rot.shape[2]),
    }))
    if args.out:
        save_socs(args.out, socs)
        print(f"wrote {args.out}")
    return 0


def _plot_pipeline(result, mask, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(3, 2, dpi=200, figsize=(8, 10))
    (ax1, ax2), (ax3, ax4), (ax5, ax6) = axes
    ax1.imshow(np.asarray(result.image))
    ax1.set_title("Simulated Aerial Image")
    import jax.numpy as jnp

    ax2.imshow(np.asarray(jnp.abs(result.spectrum)))
    ax2.set_title("Diffraction Pattern (Mag)")
    ax3.imshow(np.asarray(jnp.abs(mask.geometry)))
    ax3.set_title("Mask")
    ax4.imshow(result.source_map)
    ax4.set_title("Light Source")
    ax5.imshow(np.asarray(jnp.real(result.pupil)))
    ax5.set_title("Pupil Function (Re)")
    ax6.imshow(np.asarray(jnp.imag(result.pupil)))
    ax6.set_title("Pupil Function (Im)")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def cmd_focus(args) -> int:
    """Through-focus stack + focus-exposure matrix (CD vs defocus/dose)."""
    import jax.numpy as jnp

    from .models.resist import ResistModel, critical_dimension
    from .ops.focus import compiled_focus_stack, focus_stack_aberrations
    from .parallel import padded_source_arrays

    config = _build_config(args)
    mask = _build_mask(args, config)
    source = _build_source(args, config)
    shifts, weights, _ = padded_source_arrays(np.asarray(source), args.chunk)
    defocus = np.linspace(args.focus_min, args.focus_max, args.focus_steps)
    base = np.asarray(args.aberrations if args.aberrations else [0.0] * 5,
                      np.float32)
    stack_ab = focus_stack_aberrations(base, defocus.astype(np.float32))
    run = compiled_focus_stack(
        config, chunk=args.chunk, normalize=True,
        max_abs_shift=int(np.abs(np.asarray(shifts)).max()),
        mask3d=_build_mask3d(args))
    t0 = time.perf_counter()
    stack = np.asarray(run(mask.geometry, stack_ab, shifts, weights))
    elapsed = time.perf_counter() - t0

    model = ResistModel(threshold=args.threshold)
    cds = [critical_dimension(model.develop_binary(jnp.asarray(im), config),
                              config) for im in stack]
    print(json.dumps({
        "defocus_nm": [float(d) for d in defocus],
        "cd_nm": cds,
        "wall_clock_s": round(elapsed, 3),
    }))
    if args.out:
        np.save(args.out, stack)
        print(f"wrote {args.out}")
    return 0


def cmd_smo(args) -> int:
    """Inverse lithography: optimize the mask so its aerial image matches the
    target mask's image; reports pattern fidelity before/after."""
    import jax.numpy as jnp

    from .models.resist import ResistModel, pattern_fidelity
    from .optimize import (SMOProblem, forward, init_params, mask_from_latent,
                           optimize, optimize_socs)
    from .parallel import padded_source_arrays

    import jax

    config = _build_config(args)
    target_mask = _build_mask(args, config)
    source = _build_source(args, config)
    shifts, weights, _ = padded_source_arrays(np.asarray(source), args.chunk * 8)
    problem = SMOProblem(config=config, chunk=args.chunk,
                         mask_steepness=args.steepness,
                         mask3d=_build_mask3d(args))
    ab = np.asarray(args.aberrations if args.aberrations else [0.0], np.float32)

    # jitted: forward's complex math (spectrum/pupil) dies eagerly on the
    # TPU tunnel (see ops/focus.compiled_focus_stack)
    @jax.jit
    def fwd(params, aberr, sh, w):
        return forward(params, aberr, sh, w, problem)

    # With an M3D model the TARGET image is the thin-mask (design-intent)
    # print; the optimizer then pre-compensates the topography by running
    # its own forward THROUGH the model (M3D-aware ILT).
    thin_problem = (problem if problem.mask3d is None
                    else dataclasses.replace(problem, mask3d=None))

    @jax.jit
    def fwd_thin(params, aberr, sh, w):
        return forward(params, aberr, sh, w, thin_problem)

    target = fwd_thin(init_params(problem, target_mask.geometry), ab,
                      shifts, weights)
    start = np.full((config.n, config.n), 0.4, np.float32)
    t0 = time.perf_counter()
    if args.forward == "socs":
        params, history = optimize_socs(
            problem, target, start, ab, shifts, weights,
            steps=args.steps, learning_rate=args.lr, rank=args.rank)
    else:
        params, history = optimize(problem, target, start, ab, shifts,
                                   weights, steps=args.steps,
                                   learning_rate=args.lr)
    elapsed = time.perf_counter() - t0

    optimized = mask_from_latent(params["mask_latent"], problem.mask_steepness)
    final_img = fwd(params, ab, shifts, weights)
    model = ResistModel(threshold=args.threshold)
    fid = pattern_fidelity(model.develop_binary(final_img, config),
                           np.abs(np.asarray(target_mask.geometry)), config)
    print(json.dumps({
        "steps": args.steps,
        "loss_start": history[0], "loss_end": history[-1],
        "print_fidelity_vs_target_layout": fid,
        "wall_clock_s": round(elapsed, 3),
    }))
    if args.out:
        np.save(args.out, np.asarray(optimized))
        print(f"wrote {args.out}")
    return 0


def cmd_fem(args) -> int:
    """Full-chip focus-exposure matrix + process window on the tiled SOCS
    path: one call images an arbitrarily large mask (e.g. 8192^2) through a
    focus x dose grid and reports DoF / exposure latitude."""
    from .config import OpticsConfig
    from .metrology import tiled_fem
    from .models.resist import ResistModel

    tile_config = _build_config(args)  # optics of each tile
    big_n = args.big_n or tile_config.n
    window_fn = None
    mask_big = None
    if args.stream:
        if not args.mask_file:
            raise SystemExit("--stream requires --mask-file (GDSII/OASIS)")
        from .io.layout import layout_window_provider

        window_fn = layout_window_provider(args.mask_file, tile_config,
                                           big_n, layer=args.gds_layer)
    else:
        big_cfg = OpticsConfig(
            pixel_number=big_n, pixel_size=args.pixel_size,
            wavelength=args.wavelength, na=args.na,
            immersion_index=args.immersion_index,
            channel_tol=args.channel_tol)
        mask_big = np.abs(np.asarray(_build_mask(args, big_cfg).geometry,
                                     np.float32))
    source = _build_source(args, tile_config)
    defocus = np.linspace(args.focus_min, args.focus_max, args.focus_steps)
    polarization = (None if args.polarization == "scalar"
                    else args.polarization)

    t0 = time.perf_counter()
    result = tiled_fem(
        mask_big, tile_config, source,
        defocus_nm=defocus, doses=args.doses,
        target_cd_nm=args.target_cd,
        resist=ResistModel(threshold=args.threshold),
        tolerance=args.cd_tolerance,
        rank=args.rank, halo=args.halo,
        tiles_per_dispatch=args.tiles_per_dispatch,
        window_fn=window_fn, big_n=big_n if window_fn is not None else None,
        polarization=polarization, chromatic=_build_chromatic(args),
        warm_start=not args.no_warm_start,
        hotspot_nils=args.hotspot_nils,
        pv_bands=args.pv_bands is not None,
        mask3d=_build_mask3d(args),
    )
    elapsed = time.perf_counter() - t0
    report = {
        "big_n": big_n,
        "tile_n": tile_config.n,
        "defocus_nm": [float(d) for d in result["defocus_nm"]],
        "doses": [float(d) for d in result["doses"]],
        "cd_nm": np.asarray(result["cd_nm"]).tolist(),
        "target_cd_nm": result["target_cd_nm"],
        "depth_of_focus_nm": result["depth_of_focus_nm"],
        "exposure_latitude": result["exposure_latitude"],
        "in_spec_fraction": result["in_spec_fraction"],
        "wall_clock_s": round(elapsed, 3),
    }
    cdu = result.get("cdu")
    if cdu is not None:
        report["cdu"] = {k: v for k, v in cdu.items() if k != "cd_map_nm"}
    epe = result.get("epe")
    if epe is not None:
        report["epe"] = {k: v for k, v in epe.items()
                         if not k.startswith("epe_")}
    if result.get("nils") is not None:
        report["nils"] = result["nils"]
    if result.get("hotspots") is not None:
        spots = dict(result["hotspots"])
        spots["locations"] = spots["locations"][:10]  # top-10 in the JSON
        report["hotspots"] = spots
    pv = result.get("pv")
    if pv is not None:
        report["pv"] = {k: v for k, v in pv.items()
                        if k not in ("outer", "inner", "band")}
    print(json.dumps(report))
    if args.pv_bands and pv is not None:
        np.savez(args.pv_bands, outer=pv["outer"], inner=pv["inner"],
                 band=pv["band"])
        print(f"wrote {args.pv_bands}")
    if args.cdu_map and cdu is not None:
        cd_map = np.asarray(cdu["cd_map_nm"])
        if args.cdu_map.endswith(".npy"):
            np.save(args.cdu_map, cd_map)
        else:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            fig, ax = plt.subplots(dpi=200)
            im = ax.imshow(cd_map, cmap="viridis")
            ax.set_title(
                f"CD uniformity map (mean {cdu['mean_cd_nm']:.1f} nm, "
                f"3$\\sigma$ {cdu['cdu_3sigma_nm']:.2f} nm)")
            fig.colorbar(im, ax=ax, label="mean CD (nm)")
            fig.savefig(args.cdu_map)
            plt.close(fig)
        print(f"wrote {args.cdu_map}")
    return 0


def cmd_opc(args) -> int:
    """Full-chip resist-aware OPC on the tiled SOCS path; reports printed-
    pattern fidelity (IoU / XOR area / mean EPE) before and after."""
    from .config import OpticsConfig
    from .metrology import tiled_focus_images
    from .models.resist import ResistModel, pattern_fidelity
    from .optimize import opc_correct_tiled

    tile_config = _build_config(args)
    big_n = args.big_n or tile_config.n
    big_cfg = OpticsConfig(
        pixel_number=big_n, pixel_size=args.pixel_size,
        wavelength=args.wavelength, na=args.na,
        immersion_index=args.immersion_index,
        channel_tol=args.channel_tol)
    target = np.abs(np.asarray(_build_mask(args, big_cfg).geometry, np.float32))
    source = _build_source(args, tile_config)
    resist = ResistModel(threshold=args.threshold, steepness=30.0)
    polarization = (None if args.polarization == "scalar"
                    else args.polarization)

    def fidelity(mask_big):
        from .models.resist import edge_placement_errors

        img = tiled_focus_images(mask_big, tile_config, source, [0.0],
                                 rank=args.rank, halo=args.halo,
                                 polarization=polarization,
                                 mask3d=_build_mask3d(args))[0]
        profile = (img / img.max()) > resist.threshold
        out = pattern_fidelity(profile.astype(np.float32), target,
                               tile_config)
        epe = edge_placement_errors(profile.astype(np.float32), target,
                                    tile_config)
        out.update({k: epe[k] for k in ("mean_abs_epe_nm", "max_abs_epe_nm",
                                        "matched", "missing")})
        return out

    t0 = time.perf_counter()
    corrected = opc_correct_tiled(
        target, tile_config, source, resist=resist, halo=args.halo,
        steps=args.steps, learning_rate=args.lr, rank=args.rank,
        sweeps=args.sweeps, polarization=polarization,
        chromatic=_build_chromatic(args), mask3d=_build_mask3d(args))
    elapsed = time.perf_counter() - t0
    report = {
        "big_n": big_n, "tile_n": tile_config.n, "steps": args.steps,
        "sweeps": args.sweeps,
        "fidelity_before": fidelity(target),
        "fidelity_after": fidelity(corrected),
        "wall_clock_s": round(elapsed, 3),
    }
    if args.mrc_min_width or args.mrc_min_space or args.mrc_min_area:
        from .models.mrc import MaskRules, mrc_check, mrc_clean

        rules = MaskRules(min_width_nm=args.mrc_min_width,
                          min_space_nm=args.mrc_min_space,
                          min_area_nm2=args.mrc_min_area)
        check = mrc_check(corrected, tile_config, rules)
        report["mrc"] = {k: v for k, v in check.items()
                         if not isinstance(v, np.ndarray)}
        if args.mrc_repair and not check["clean"]:
            corrected = mrc_clean(corrected, tile_config, rules)
            recheck = mrc_check(corrected, tile_config, rules)
            report["mrc_after_repair"] = {
                k: v for k, v in recheck.items()
                if not isinstance(v, np.ndarray)}
            report["fidelity_after_repair"] = fidelity(corrected)
    print(json.dumps(report))
    if args.out:
        np.save(args.out, corrected)
        print(f"wrote {args.out}")
    return 0


def cmd_lele(args) -> int:
    """Multiple patterning: decompose the layout into N masks (2 = LELE,
    3 = LELELE, ...), print each + the single exposure, report feature
    recovery."""
    from .models.multipatterning import multipatterning_print
    from .models.resist import ResistModel, feature_table

    config = _build_config(args)
    mask = np.abs(np.asarray(_build_mask(args, config).geometry, np.float32))
    source = _build_source(args, config)
    polarization = None if args.polarization == "scalar" else args.polarization
    t0 = time.perf_counter()
    overlay = None
    if args.overlay:
        if len(args.overlay) != 2 * args.masks:
            raise SystemExit(f"--overlay needs dy dx per mask "
                             f"({2 * args.masks} numbers for "
                             f"--masks {args.masks})")
        overlay = [(args.overlay[2 * i], args.overlay[2 * i + 1])
                   for i in range(args.masks)]
    out = multipatterning_print(
        mask, config, np.asarray(source), min_pitch_nm=args.min_pitch,
        masks=args.masks, overlay_nm=overlay,
        resist=ResistModel(threshold=args.threshold), rank=args.rank,
        halo=args.halo, polarization=polarization,
        chromatic=_build_chromatic(args))
    elapsed = time.perf_counter() - t0
    feats = lambda m: int(feature_table(m, config, axis=1)["row"].size)
    print(json.dumps({
        "masks": args.masks,
        "features": out["features"],
        "conflict_edges": out["conflict_edges"],
        "violations": out["violations"],
        "cuts_target": feats(mask),
        "cuts_lele": feats(out["profile"]),
        "cuts_single": feats(out["profile_single"]),
        "wall_clock_s": round(elapsed, 3),
    }))
    if args.out:
        np.savez(args.out, profile=out["profile"],
                 profile_single=out["profile_single"],
                 **{f"mask_{chr(ord('a') + i)}": m
                    for i, m in enumerate(out["masks"])})
        print(f"wrote {args.out}")
    if args.gds:
        from .io.contours import trace_contours
        from .io.gdsii import write_gds

        px = config.pixel_size
        cells = {"LELE": [
            (layer, xy)
            for layer, m in enumerate(out["masks"], start=1)
            for xy in trace_contours(m, pixel_size=px)
        ]}
        write_gds(args.gds, cells, unit_nm=1.0)
        print(f"wrote {args.gds} (mask i on layer i, "
              f"{args.masks} masks)")
    return 0


def cmd_fitaberr(args) -> int:
    """Scanner aberration retrieval: fit OSA Zernike coefficients to
    measured through-focus aerial images of a known test structure."""
    import jax

    from .optimize import fit_aberrations
    from .ops.fraunhofer import mask_spectrum
    from .parallel import padded_source_arrays

    config = _build_config(args)
    mask = _build_mask(args, config)
    source = _build_source(args, config)
    shifts, weights, _ = padded_source_arrays(np.asarray(source),
                                              args.chunk * 8)
    images = np.stack([np.load(p).astype(np.float32) for p in args.images])
    if args.defocus is not None and len(args.defocus) != len(images):
        raise SystemExit(f"{len(images)} --images vs "
                         f"{len(args.defocus)} --defocus planes")
    # spectrum stays a DEVICE array: built under jit (eager complex math
    # dies on the TPU tunnel) and consumed only inside the jitted fit step
    spectrum = jax.jit(
        lambda g: mask_spectrum(g, config))(np.asarray(mask.geometry))
    target = images if args.defocus is not None else images[0]
    t0 = time.perf_counter()
    coeffs, history = fit_aberrations(
        target, spectrum, shifts, weights, config,
        n_coeffs=args.n_coeffs, steps=args.steps, learning_rate=args.lr,
        chunk=args.chunk, defocus_nm=args.defocus)
    print(json.dumps({
        "coefficients": [round(float(c), 6) for c in np.asarray(coeffs)],
        "loss_initial": history[0],
        "loss_final": history[-1],
        "planes": len(images),
        "wall_clock_s": round(time.perf_counter() - t0, 3),
    }))
    return 0


def cmd_calibrate(args) -> int:
    """Resist model calibration: fit model parameters to measured gauge
    CDs (aerial images from .npy files + CD-SEM numbers)."""
    from .models.calibrate import calibrate_resist
    from .models.resist import MackResist, ResistModel

    config = _build_config(args)
    images = [np.load(p) for p in args.images]
    if len(args.cds) != len(images):
        raise SystemExit(f"{len(images)} --images vs {len(args.cds)} --cds")
    model = MackResist() if args.model == "mack" else ResistModel(
        threshold=args.threshold, diffusion_nm=args.diffusion)
    t0 = time.perf_counter()
    out = calibrate_resist(images, args.cds, config, model=model,
                           fit=tuple(args.fit), iters=args.iters)
    print(json.dumps({
        "params": out["params"],
        "rms_nm": round(out["rms_nm"], 4),
        "cd_nm": [round(float(c), 3) for c in out["cd_nm"]],
        "residual_nm": [round(float(r), 3) for r in out["residual_nm"]],
        "evals": out["evals"],
        "wall_clock_s": round(time.perf_counter() - t0, 3),
    }))
    return 0


def cmd_m3dcal(args) -> int:
    """First-principles thick-mask (M3D) calibration: run the in-repo
    rigorous RCWA solver on a line/space topography of the named absorber
    stack and fit the boundary-layer model against the rigorously imaged
    near field. Prints the calibrated (width, beta_h, beta_v) plus the
    thin-vs-rigorous and corrected-vs-rigorous image residuals — feed the
    result back to the imaging commands with --m3d FILE (written by --out;
    the stdout line is the same JSON) or the scalar --mask3d-* flags."""
    from .ops.mask3d import boundary_layer_from_rcwa, model_to_json

    config = _build_config(args)
    if config.n % args.pitch:
        raise SystemExit(f"--pitch {args.pitch} must divide "
                         f"--pixel-number {config.n}")
    duty = args.duty if args.duty is not None else (
        # default: ~half-pitch absorber rounded to an odd pixel count
        # (exact rasterization; see ops.mask3d.grating_geometry)
        (2 * (args.pitch // 4) + 1) / args.pitch)
    t0 = time.perf_counter()
    try:
        bl, report = boundary_layer_from_rcwa(
            config, stack=args.stack, pitch_px=args.pitch, duty=duty,
            illumination_pol=args.pol, width_nm=args.width_nm,
            n_harmonics=args.harmonics, sigma_out=args.sigma_out,
            steps=args.steps, learning_rate=args.lr,
            incidence_deg=args.incidence, azimuth_deg=args.azimuth,
            taps=args.taps, defocus_nm=tuple(args.defocus or ()))
    except ValueError as exc:
        # e.g. the stack/wavelength mismatch guard (ops.rcwa.resolve_stack)
        raise SystemExit(f"m3dcal: {exc}") from None
    out = model_to_json(bl)
    out.update({
        "stack": args.stack,
        "illumination_pol": args.pol,
        "incidence_deg": args.incidence,
        "azimuth_deg": args.azimuth,
        "defocus_nm": report["defocus_nm"],
        "pitch_px": args.pitch,
        "duty": round(duty, 6),
        "thin_nrms": {k: round(v, 8) for k, v in report["thin_nrms"].items()},
        "fit_nrms": {k: round(v, 8) for k, v in report["fit_nrms"].items()},
        "wall_clock_s": round(time.perf_counter() - t0, 3),
    })
    line = json.dumps(out)
    if getattr(args, "out", None):
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    return 0


def cmd_stochastic(args) -> int:
    """Monte-Carlo stochastic printing: aerial image -> photon/acid counting
    trials -> LER/LWR/LCDU + bridge/break defect rates + print-probability
    band. The trials run as one jitted vmapped program per chunk."""
    from .models.stochastic import StochasticResist, stochastic_ensemble
    from .simulate import simulate

    config = _build_config(args)
    mask = _build_mask(args, config)
    source = _build_source(args, config)
    polarization = None if args.polarization == "scalar" else args.polarization
    result = simulate(mask, source, args.aberrations, solver=args.solver,
                      normalize=True, polarization=polarization,
                      chromatic=_build_chromatic(args))
    model = StochasticResist(
        dose_photons_per_nm2=args.dose_photons,
        quantum_efficiency=args.quantum_efficiency,
        pag_per_nm2=args.pag, diffusion_nm=args.diffusion,
        threshold=args.threshold, noise=args.noise)
    t0 = time.perf_counter()
    want_psd = args.psd or bool(args.psd_out)  # --psd-out implies --psd
    out = stochastic_ensemble(np.asarray(result.image), config, model,
                              trials=args.trials, seed=args.seed,
                              psd=want_psd)
    # the PSD accumulates from the SAME streamed trials as the summary —
    # one ensemble pass, not two (ADVICE r3)
    psd = out.pop("psd", None)
    if psd is not None:
        for k in ("ler_3s_nm", "acf_corr_length_nm", "corr_length_nm",
                  "alpha", "psd0_nm3", "n_edges"):
            if k in psd:
                out[f"psd_{k}"] = psd[k]
        if args.psd_out:
            np.savez(args.psd_out, freq_per_nm=psd["freq_per_nm"],
                     psd_nm3=psd["psd_nm3"])
    elapsed = time.perf_counter() - t0
    band = out.pop("print_probability")
    out["wall_s"] = round(elapsed, 3)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    if args.out:
        np.save(args.out, band)
        print(f"wrote {args.out}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n_panels = 3 if psd is not None and psd["n_edges"] else 2
        fig, axes = plt.subplots(1, n_panels, figsize=(4.5 * n_panels, 4.2))
        axes[0].imshow(np.asarray(result.image), cmap="inferno")
        axes[0].set_title("aerial image")
        im = axes[1].imshow(band, cmap="RdBu_r", vmin=0, vmax=1)
        axes[1].set_title(
            f"print probability ({args.trials} trials)\n"
            f"LER {out['ler_nm']:.2f} nm  LWR {out['lwr_nm']:.2f} nm")
        fig.colorbar(im, ax=axes[1], fraction=0.046)
        for ax in axes[:2]:
            ax.set_xticks([]), ax.set_yticks([])
        if n_panels == 3:
            f_ax, p_ax = psd["freq_per_nm"], psd["psd_nm3"]
            axes[2].loglog(f_ax, p_ax, lw=1.2, label="measured")
            model_psd = psd["psd0_nm3"] / (
                1.0 + (2 * np.pi * f_ax * psd["corr_length_nm"]) ** 2
            ) ** (psd["alpha"] + 0.5)
            axes[2].loglog(f_ax, model_psd, "--", lw=1.0,
                           label=(f"Palasantzas fit\n"
                                  f"$\\xi$={psd['corr_length_nm']:.1f} nm  "
                                  f"$\\alpha$={psd['alpha']:.2f}"))
            axes[2].set_xlabel("frequency (1/nm)")
            axes[2].set_ylabel("PSD (nm$^3$)")
            axes[2].set_title(
                f"LER PSD ({psd['n_edges']} edges)\n"
                f"ACF corr. length {psd['acf_corr_length_nm']:.1f} nm")
            axes[2].legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")
    return 0


def cmd_resist3d(args) -> int:
    """3-D resist development: through-film exposure -> latent image ->
    eikonal front propagation (lateral etch / undercut) -> 3-D profile +
    summary stats. Two exposure fidelities: the default separable model
    (focal stack x analytic absorption/standing-wave profile) and, with
    ``--film``, the rigorous electromagnetic image IN the resist
    (:mod:`.ops.filmstack`: per-angle TE/TM thin-film interference over an
    actual substrate/BARC stack — exact through-depth defocus included)."""
    from .models.resist import DepthResist, MackResist
    from .ops.focus import compiled_focus_stack, focus_stack_aberrations
    from .parallel import padded_source_arrays

    config = _build_config(args)
    mask = _build_mask(args, config)
    source = _build_source(args, config)
    if args.film and args.reflectivity:
        print("error: --reflectivity is the separable model's knob; with "
              "--film the actual substrate/BARC stack sets the reflected "
              "wave (use --substrate/--barc)", file=sys.stderr)
        return 2
    dr = DepthResist(
        mack=MackResist(thickness_nm=args.thickness, develop_s=args.develop_s),
        nz=args.nz,
        absorbance_per_um=args.absorbance,
        substrate_reflectivity=args.reflectivity,
        peb_diffusion_nm=args.peb,
        n_resist=args.n_resist,
        wavelength_nm=config.wavelength,
        surface_rate_factor=args.surface_rate_factor,
        inhibition_depth_nm=args.inhibition_depth,
        lateral_rate_factor=args.lateral_rate_factor,
        lateral_surface_factor=args.lateral_surface_factor,
    )
    base = np.asarray(args.aberrations if args.aberrations else [0.0] * 5,
                      np.float32)
    t0 = time.perf_counter()
    if args.film:
        from .ops.filmstack import MATERIALS_193, WaferStack
        from .simulate import film_stack_images

        under = (((float(args.barc), complex(*args.barc_n)),)
                 if args.barc > 0 else ())
        wafer = WaferStack.from_resist(
            dr, under_layers=under,
            n_substrate=MATERIALS_193[args.substrate])
        polarization = None if args.polarization == "scalar" else args.polarization
        big_n = getattr(args, "big_n", None)
        if big_n and big_n > config.n:
            # full-chip: per-slab film-SOCS kernels once, tiles stream
            # through the fixed-size optics (ops/tiled.tiled_film_stack)
            from .ops.tiled import tiled_film_stack
            from .simulate import film_socs_kernels

            big_cfg = dataclasses.replace(config, pixel_number=big_n)
            mask_big = np.abs(np.asarray(
                _build_mask(args, big_cfg).geometry, np.float32))
            kernels = film_socs_kernels(
                np.asarray(source), base, config=config, wafer_stack=wafer,
                resist=dr, polarization=polarization, rank=args.rank)
            stack = tiled_film_stack(
                mask_big, kernels, config,
                source_total=float(np.asarray(source).sum()),
                halo=args.halo, chunk=args.chunk,
                mask3d=_build_mask3d(args))
        else:
            stack = film_stack_images(
                mask, np.asarray(source), base, config=config,
                wafer_stack=wafer, resist=dr, polarization=polarization,
                chunk=args.chunk, normalize=True, mask3d=_build_mask3d(args))
        dr = dr.rigorous()  # exposure stack already carries absorption
    else:
        shifts, weights, _ = padded_source_arrays(
            np.asarray(source), args.chunk)
        # Entry 4 of --aberrations is the user's focus setting (nm); the
        # film's per-slab defocus offsets ride on top of it
        # (focus_stack_aberrations REPLACES entry 4, so it must be folded
        # in here, not left in `base`).
        best_focus = float(base[4]) if base.shape[0] > 4 else 0.0
        film_defocus = dr.film_defocus_nm(best_focus_nm=best_focus)
        stack_ab = focus_stack_aberrations(base,
                                           film_defocus.astype(np.float32))
        run = compiled_focus_stack(
            config, chunk=args.chunk, normalize=True,
            max_abs_shift=int(np.abs(np.asarray(shifts)).max()),
            mask3d=_build_mask3d(args))
        stack = run(mask.geometry, stack_ab, shifts, weights)
    profile = np.asarray(dr.develop_profile_binary(
        stack, args.dose, pixel_size_nm=config.pixel_size))  # 1 = removed
    stochastic = None
    if getattr(args, "trials", 0):
        # volumetric stochastic resist on the (nz, n, n) exposure: per-slab
        # counting statistics -> z-resolved LER/CD + defect rates
        from .models.stochastic import (StochasticResist,
                                        stochastic_volume_ensemble)

        model = StochasticResist(
            dose_photons_per_nm2=args.dose_photons,
            diffusion_nm=args.peb, threshold=args.sto_threshold)
        vol = stochastic_volume_ensemble(
            np.asarray(stack), config, model,
            dz_nm=dr.mack.thickness_nm / dr.nz, trials=args.trials,
            seed=args.seed)
        stochastic = {
            "trials": vol["trials"],
            "ler_top_nm": round(vol["ler_top_nm"], 4),
            "ler_bottom_nm": round(vol["ler_bottom_nm"], 4),
            "slabs": [{k: (round(v, 5) if isinstance(v, float) else v)
                       for k, v in s.items()} for s in vol["slabs"]],
        }
    elapsed = time.perf_counter() - t0

    # Undercut voxels: removed, but with intact resist somewhere STRICTLY
    # above them in the same column — unreachable by any purely-vertical
    # develop model. (min over slabs above == 0 <=> some intact voxel above.)
    above_min = np.concatenate(
        [np.ones_like(profile[:1]),
         np.minimum.accumulate(profile, axis=0)[:-1]])
    undercut = int(np.logical_and(profile > 0.5, above_min < 0.5).sum())
    report = {
        "nz": dr.nz,
        "thickness_nm": dr.mack.thickness_nm,
        "exposure": "film" if args.film else "separable",
        "cleared_fraction": float(profile.mean()),
        "through_print_fraction": float(profile.min(axis=0).mean()),
        "undercut_voxels": undercut,
        "wall_clock_s": round(elapsed, 3),
    }
    if stochastic is not None:
        report["stochastic"] = stochastic
    print(json.dumps(report))
    if args.out:
        np.savez_compressed(args.out, profile=profile,
                            depths_nm=dr.depths_nm)
        print(f"wrote {args.out}")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        row = config.n // 2
        fig, axes = plt.subplots(2, 1, figsize=(8, 5), layout="constrained")
        axes[0].imshow(np.asarray(stack[dr.nz // 2]), cmap="inferno")
        axes[0].set_title("aerial image (mid-film plane)")
        axes[1].imshow(1.0 - profile[:, row, :], cmap="copper",
                       aspect="auto", interpolation="nearest")
        axes[1].set_title(f"resist x-z cross-section (row {row}; "
                          "dark = cleared)")
        axes[1].set_ylabel("depth slab")
        fig.savefig(args.plot, dpi=130)
        print(f"wrote {args.plot}")
    return 0


def cmd_demo(args) -> int:
    """The reference's end-to-end demo (imageformation.py:99-149): 64^2 demo
    mask, quadrupole 0.4/0.8, 10 OSA terms with 100 nm defocus, 6-panel
    figure — with per-stage wall-clock prints."""
    from .models.mask import demo_bars
    from .models.source import LightSource
    from .simulate import simulate

    config = _build_config(args)
    aberr = args.aberrations or [0, 0, 0.01, 0, 100, 0.01, 0, 0.01, 0.01, 0.01]
    mask = demo_bars(config)
    source = LightSource(config, sigma_in=args.sigma_in, sigma_out=args.sigma_out
                         ).quasar(args.poles, args.rotation)
    from .utils.profiling import device_info

    print(f"Using {device_info()['platform']} "
          f"({device_info()['device_count']} device(s))")
    print("Beginning simulation")
    result = simulate(mask, source, aberr, solver=args.solver)
    print(f"Aerial image computed in {result.report['wall_clock_s']:.3f} s "
          f"({result.report['source_points']} source points, "
          f"solver={result.report['solver']})")
    out = args.out or "demo.png"
    _plot_pipeline(result, mask, out)
    print(f"wrote {out}")
    return 0


def _enable_compile_cache():
    """Persistent XLA compilation cache for CLI/serving processes (same
    cache bench.py uses): tunnel compiles cost 20-40 s per program and the
    auto-rank loop compiles several — repeat invocations of identical
    configs should pay none of it. Env JAX_COMPILATION_CACHE_DIR wins."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    from pathlib import Path

    cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


def main(argv=None) -> int:
    _enable_compile_cache()
    parser = argparse.ArgumentParser(prog="lithographysimulator_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_sim = sub.add_parser("simulate", help="compute an aerial image")
    _add_common(p_sim)
    _add_perturb(p_sim)
    p_sim.add_argument("--solver", default="gau23",
                       choices=["gau23", "direct", "socs"])
    p_sim.add_argument("--chunk", type=int, default=4)
    p_sim.add_argument("--normalize", action="store_true")
    p_sim.add_argument("--polarization", default="scalar",
                       choices=["scalar", "x", "y", "unpolarized"],
                       help="vector (Jones-pupil) imaging for hyper-NA; "
                            "'scalar' = reference-equivalent scalar path")
    _add_chromatic(p_sim)
    p_sim.add_argument("--out", default=None, help="output .npy path")
    p_sim.add_argument("--plot", default=None, help="output .png figure path")
    p_sim.set_defaults(func=cmd_simulate)

    p_demo = sub.add_parser("demo", help="reference demo pipeline + figure")
    _add_common(p_demo)
    p_demo.add_argument("--solver", default="gau23", choices=["gau23", "direct"])
    p_demo.add_argument("--out", default=None)
    p_demo.set_defaults(func=cmd_demo)

    p_focus = sub.add_parser("focus", help="through-focus stack + FEM CDs")
    _add_common(p_focus)
    p_focus.add_argument("--focus-min", type=float, default=-100.0)
    p_focus.add_argument("--focus-max", type=float, default=100.0)
    p_focus.add_argument("--focus-steps", type=int, default=5)
    p_focus.add_argument("--threshold", type=float, default=0.4)
    p_focus.add_argument("--chunk", type=int, default=4)
    p_focus.add_argument("--out", default=None, help="output .npy stack path")
    p_focus.set_defaults(func=cmd_focus)

    p_smo = sub.add_parser("smo", help="inverse lithography (mask optimization)")
    _add_common(p_smo)
    p_smo.add_argument("--steps", type=int, default=100)
    p_smo.add_argument("--lr", type=float, default=0.2)
    p_smo.add_argument("--steepness", type=float, default=4.0)
    p_smo.add_argument("--threshold", type=float, default=0.4)
    p_smo.add_argument("--chunk", type=int, default=4)
    p_smo.add_argument("--forward", choices=("abbe", "socs"), default="abbe",
                       help="mask-step forward model: exact per-point Abbe, "
                            "or SOCS kernels (O(rank) work per step)")
    p_smo.add_argument("--rank", type=int, default=64,
                       help="SOCS kernel rank for --forward socs")
    p_smo.add_argument("--out", default=None, help="optimized mask .npy path")
    p_smo.set_defaults(func=cmd_smo)

    p_fem = sub.add_parser(
        "fem", help="full-chip focus-exposure matrix (tiled SOCS path)")
    _add_common(p_fem)
    p_fem.add_argument("--big-n", type=int, default=None,
                       help="full-chip mask size in px (default: one tile; "
                            "--pixel-number sets the tile size)")
    p_fem.add_argument("--focus-min", type=float, default=-100.0)
    p_fem.add_argument("--focus-max", type=float, default=100.0)
    p_fem.add_argument("--focus-steps", type=int, default=5)
    p_fem.add_argument("--doses", type=float, nargs="+",
                       default=[0.8, 0.9, 1.0, 1.1, 1.2])
    p_fem.add_argument("--target-cd", type=float, default=None,
                       help="target CD in nm (default: self-calibrate to the "
                            "center-of-window CD)")
    p_fem.add_argument("--cd-tolerance", type=float, default=0.10)
    p_fem.add_argument("--threshold", type=float, default=0.4)
    p_fem.add_argument("--rank", type=int, default=128)
    p_fem.add_argument("--halo", type=int, default=None,
                       help="tile halo px (default: optics-derived)")
    p_fem.add_argument("--tiles-per-dispatch", type=int, default=8)
    p_fem.add_argument("--polarization", default="scalar",
                       choices=["scalar", "x", "y", "unpolarized"],
                       help="build every plane's SOCS kernels with the "
                            "vector (Jones-pupil) physics")
    p_fem.add_argument("--no-warm-start", action="store_true",
                       help="disable the warm-started per-plane kernel "
                            "builds (each plane then builds cold)")
    p_fem.add_argument("--hotspot-nils", type=float, default=None,
                       help="report feature locations with NILS below this "
                            "printability floor (e.g. 1.5)")
    p_fem.add_argument("--pv-bands", default=None,
                       help="accumulate process-variability bands over the "
                            "focus x dose corners and write outer/inner/"
                            "band contour maps to this .npz (per-edge band "
                            "stats land in the JSON report)")
    p_fem.add_argument("--cdu-map", default=None,
                       help="write the nominal-condition CD-uniformity map "
                            "(.npy, or any image extension for a rendered "
                            "figure)")
    p_fem.add_argument("--stream", action="store_true",
                       help="stream tile windows straight from --mask-file "
                            "(no full-chip raster; any layout size)")
    _add_chromatic(p_fem)
    p_fem.set_defaults(func=cmd_fem)

    p_opc = sub.add_parser(
        "opc", help="full-chip resist-aware OPC (tiled SOCS path)")
    _add_common(p_opc)
    p_opc.add_argument("--big-n", type=int, default=None,
                       help="full-chip layout size in px (default: one tile)")
    p_opc.add_argument("--steps", type=int, default=60)
    p_opc.add_argument("--sweeps", type=int, default=1)
    p_opc.add_argument("--lr", type=float, default=0.15)
    p_opc.add_argument("--threshold", type=float, default=0.35)
    p_opc.add_argument("--rank", type=int, default=64)
    p_opc.add_argument("--halo", type=int, default=None)
    p_opc.add_argument("--polarization", default="scalar",
                       choices=["scalar", "x", "y", "unpolarized"],
                       help="vector (Jones-pupil) forward model for the "
                            "correction and the fidelity report")
    p_opc.add_argument("--mrc-min-width", type=float, default=0.0,
                       help="mask-rule check: min feature width (nm)")
    p_opc.add_argument("--mrc-min-space", type=float, default=0.0,
                       help="mask-rule check: min space/gap (nm)")
    p_opc.add_argument("--mrc-min-area", type=float, default=0.0,
                       help="mask-rule check: min feature area (nm^2)")
    p_opc.add_argument("--mrc-repair", action="store_true",
                       help="morphologically repair MRC violations and "
                            "re-report fidelity")
    p_opc.add_argument("--out", default=None, help="corrected mask .npy path")
    _add_chromatic(p_opc)
    p_opc.set_defaults(func=cmd_opc)

    p_r3d = sub.add_parser(
        "resist3d", help="3-D resist develop (eikonal lateral etch)")
    _add_common(p_r3d)
    p_r3d.add_argument("--nz", type=int, default=8)
    p_r3d.add_argument("--trials", type=int, default=0,
                       help="volumetric stochastic trials on the (nz, n, n) "
                            "exposure (0 = off): per-slab photon/acid "
                            "counting -> z-resolved LER/CD + defect rates "
                            "in the report's 'stochastic' field")
    p_r3d.add_argument("--dose-photons", type=float, default=20.0,
                       help="absorbed photons/nm^2 at relative intensity 1 "
                            "for --trials (split across the nz slabs)")
    p_r3d.add_argument("--sto-threshold", type=float, default=0.3,
                       help="develop threshold of the stochastic model "
                            "(--trials)")
    p_r3d.add_argument("--seed", type=int, default=0)
    p_r3d.add_argument("--thickness", type=float, default=100.0,
                       help="resist film thickness (nm)")
    p_r3d.add_argument("--develop-s", type=float, default=30.0)
    p_r3d.add_argument("--dose", type=float, default=1.0)
    p_r3d.add_argument("--absorbance", type=float, default=0.5,
                       help="lumped Dill absorbance (1/um)")
    p_r3d.add_argument("--reflectivity", type=float, default=0.0,
                       help="substrate intensity reflectance (standing waves)")
    p_r3d.add_argument("--lateral-rate-factor", type=float, default=1.0,
                       help="anisotropic develop: lateral etch rate as a "
                            "fraction of the vertical rate (1 = isotropic)")
    p_r3d.add_argument("--lateral-surface-factor", type=float, default=1.0,
                       help="extra lateral-rate suppression at the resist "
                            "top, relaxing over --inhibition-depth")
    p_r3d.add_argument("--inhibition-depth", type=float, default=0.0,
                       help="depth constant (nm) of the surface inhibition "
                            "terms")
    p_r3d.add_argument("--surface-rate-factor", type=float, default=1.0,
                       help="isotropic surface inhibition: develop rate at "
                            "the resist top as a fraction of bulk")
    p_r3d.add_argument("--peb", type=float, default=0.0,
                       help="post-exposure-bake diffusion length (nm)")
    p_r3d.add_argument("--film", action="store_true",
                       help="rigorous electromagnetic image IN the resist: "
                            "per-angle TE/TM thin-film interference over "
                            "the --substrate/--barc stack (replaces the "
                            "separable absorption x standing-wave model "
                            "and the --reflectivity knob)")
    p_r3d.add_argument("--n-resist", type=float, default=1.71,
                       help="resist refractive index (real part)")
    p_r3d.add_argument("--substrate", default="si",
                       choices=["si", "sio2", "air"],
                       help="substrate material under the film stack "
                            "(--film only)")
    p_r3d.add_argument("--barc", type=float, default=0.0,
                       help="bottom antireflective coating thickness in nm "
                            "(0 = none; --film only)")
    p_r3d.add_argument("--barc-n", type=float, nargs=2,
                       default=(1.82, 0.39), metavar=("RE", "IM"),
                       help="BARC complex refractive index")
    p_r3d.add_argument("--polarization", default="scalar",
                       choices=["scalar", "x", "y", "unpolarized"],
                       help="illumination polarization for the --film "
                            "imager (scalar = TE-Airy image in resist)")
    p_r3d.add_argument("--chunk", type=int, default=4)
    p_r3d.add_argument("--big-n", type=int, default=None,
                       help="full-chip size in px (with --film: tiled "
                            "per-slab film-SOCS imaging, develop at chip "
                            "scale; mask kinds rasterize at this size)")
    p_r3d.add_argument("--rank", type=int, default=64,
                       help="film-SOCS rank for the tiled --big-n path")
    p_r3d.add_argument("--halo", type=int, default=None,
                       help="tile guard band (px) for the --big-n path")
    p_r3d.add_argument("--out", default=None, help="3-D profile .npz path")
    p_r3d.add_argument("--plot", default=None, help="cross-section .png path")
    p_r3d.set_defaults(func=cmd_resist3d)

    p_lele = sub.add_parser(
        "lele", help="double patterning: decompose + composite print")
    _add_common(p_lele)
    _add_chromatic(p_lele)
    p_lele.add_argument("--masks", type=int, default=2,
                        help="number of patterning masks (2=LELE, 3=LELELE)")
    p_lele.add_argument("--overlay", type=float, nargs="+", default=None,
                        help="scanner overlay error: dy dx nm per mask "
                             "(2*masks numbers)")
    p_lele.add_argument("--min-pitch", type=float, default=200.0,
                        help="minimum same-mask pitch (nm) for decomposition")
    p_lele.add_argument("--threshold", type=float, default=0.35)
    p_lele.add_argument("--rank", type=int, default=48)
    p_lele.add_argument("--halo", type=int, default=None)
    p_lele.add_argument("--polarization", default="scalar",
                        choices=["scalar", "x", "y", "unpolarized"])
    p_lele.add_argument("--out", default=None,
                        help=".npz path for masks + profiles")
    p_lele.add_argument("--gds", default=None,
                        help="write the decomposed masks as a GDS cell "
                             "(mask A layer 1, mask B layer 2)")
    p_lele.set_defaults(func=cmd_lele)

    p_sto = sub.add_parser(
        "stochastic", help="Monte-Carlo stochastic printing (LER/defects)")
    _add_common(p_sto)
    _add_chromatic(p_sto)
    p_sto.add_argument("--solver", default="gau23",
                       choices=["gau23", "direct", "socs"])
    p_sto.add_argument("--polarization", default="scalar",
                       choices=["scalar", "x", "y", "unpolarized"])
    p_sto.add_argument("--trials", type=int, default=64)
    p_sto.add_argument("--seed", type=int, default=0)
    p_sto.add_argument("--dose-photons", type=float, default=20.0,
                       help="absorbed photons per nm^2 at relative "
                            "intensity 1 (~20 = 30 mJ/cm^2 EUV)")
    p_sto.add_argument("--quantum-efficiency", type=float, default=1.0)
    p_sto.add_argument("--pag", type=float, default=0.0,
                       help="photo-acid generators per nm^2 (depletion "
                            "saturation; 0 = linear)")
    p_sto.add_argument("--diffusion", type=float, default=5.0,
                       help="acid diffusion length (nm, 1-sigma)")
    p_sto.add_argument("--threshold", type=float, default=0.3)
    p_sto.add_argument("--noise", default="poisson",
                       choices=["poisson", "gaussian"])
    p_sto.add_argument("--out", default=None,
                       help="print-probability map .npy path")
    p_sto.add_argument("--psd", action="store_true",
                       help="add LER power-spectral-density analysis "
                            "(averaged edge PSD, Palasantzas fit, ACF "
                            "correlation length)")
    p_sto.add_argument("--psd-out", default=None,
                       help=".npz path for the PSD spectrum (implies --psd)")
    p_sto.add_argument("--plot", default=None, help="figure .png path")
    p_sto.set_defaults(func=cmd_stochastic)

    p_fit = sub.add_parser(
        "fitaberr", help="scanner aberration retrieval from measured "
                         "through-focus aerial images")
    _add_common(p_fit)
    p_fit.add_argument("--images", nargs="+", required=True,
                       help="measured aerial images (.npy), one per plane")
    p_fit.add_argument("--defocus", type=float, nargs="+", default=None,
                       help="stage defocus (nm) of each image; omit for a "
                            "single-image fit (even-aberration signs then "
                            "unresolvable)")
    p_fit.add_argument("--n-coeffs", type=int, default=10)
    p_fit.add_argument("--steps", type=int, default=300)
    p_fit.add_argument("--lr", type=float, default=0.05)
    p_fit.add_argument("--chunk", type=int, default=4)
    p_fit.set_defaults(func=cmd_fitaberr)

    p_cal = sub.add_parser(
        "calibrate", help="fit resist model parameters to measured gauge CDs")
    _add_common(p_cal)
    p_cal.add_argument("--images", nargs="+", required=True,
                       help="gauge aerial images (.npy), one per measurement")
    p_cal.add_argument("--cds", type=float, nargs="+", required=True,
                       help="measured CDs (nm), one per gauge image")
    p_cal.add_argument("--model", choices=["lumped", "mack"],
                       default="lumped")
    p_cal.add_argument("--fit", nargs="+",
                       default=["threshold", "diffusion_nm"],
                       help="model fields to fit (others stay frozen)")
    p_cal.add_argument("--threshold", type=float, default=0.3,
                       help="initial threshold (lumped model)")
    p_cal.add_argument("--diffusion", type=float, default=0.0,
                       help="initial diffusion length nm (lumped model)")
    p_cal.add_argument("--iters", type=int, default=150)
    p_cal.set_defaults(func=cmd_calibrate)

    p_m3d = sub.add_parser(
        "m3dcal", help="first-principles thick-mask (boundary-layer) "
                       "calibration against the in-repo rigorous RCWA solver")
    for name, kw in (
        ("--pixel-number", dict(type=int, default=64)),
        ("--pixel-size", dict(type=float, default=25.0)),
        ("--wavelength", dict(type=float, default=193.0)),
        ("--na", dict(type=float, default=0.7)),
        ("--immersion-index", dict(type=float, default=1.0)),
        ("--obscuration", dict(type=float, default=0.0)),
        ("--channel-tol", dict(type=float, default=1e-6)),
    ):
        p_m3d.add_argument(name, **kw)
    p_m3d.add_argument("--stack", default="binary_cr",
                       choices=["binary_cr", "att_psm_mosi", "euv_ta"],
                       help="absorber stack to solve rigorously (euv_ta is "
                            "reflective: TaBN on a 40x Mo/Si mirror)")
    p_m3d.add_argument("--incidence", type=float, default=0.0,
                       help="illumination tilt in degrees (EUV chief ray "
                            "~6); non-zero turns on the shadowing-asymmetry "
                            "fit and, with --taps, the direct conical-mount "
                            "horizontal-edge calibration")
    p_m3d.add_argument("--azimuth", type=float, default=0.0,
                       help="tilt direction in the layout plane, degrees "
                            "from +x (0 = across vertical lines; sweep for "
                            "across-slit chief-ray rotation models)")
    p_m3d.add_argument("--taps", type=int, default=0,
                       help="fit the multi-tap EdgeKernelM3D with offsets "
                            "-taps..+taps instead of the 1-px boundary "
                            "layer (use >=1 for EUV stacks)")
    p_m3d.add_argument("--pol", default="unpolarized",
                       choices=["x", "y", "unpolarized"],
                       help="illumination polarization (x/y give an H-V "
                            "split; unpolarized is isotropic by symmetry)")
    p_m3d.add_argument("--pitch", type=int, default=16,
                       help="line/space pitch in pixels (must divide "
                            "--pixel-number)")
    p_m3d.add_argument("--duty", type=float, default=None,
                       help="absorber cover fraction (default: ~half pitch "
                            "rounded to an odd pixel count)")
    p_m3d.add_argument("--width-nm", type=float, default=8.0,
                       help="boundary-layer strip width held fixed in the fit")
    p_m3d.add_argument("--harmonics", type=int, default=31,
                       help="RCWA retained order count (odd)")
    p_m3d.add_argument("--sigma-out", type=float, default=0.5,
                       help="classical calibration source radius")
    p_m3d.add_argument("--steps", type=int, default=150)
    p_m3d.add_argument("--lr", type=float, default=0.05)
    p_m3d.add_argument("--defocus", type=float, nargs="*", default=None,
                       metavar="NM",
                       help="through-focus calibration planes in nm (e.g. "
                            "-80 0 80); pins the sign of Im(beta) / the "
                            "best-focus-shift direction that an in-focus-"
                            "only target leaves weakly determined")
    p_m3d.add_argument("--out", default=None, metavar="FILE",
                       help="also write the result JSON to FILE — feed it "
                            "to the imaging commands' --m3d flag")
    p_m3d.set_defaults(func=cmd_m3dcal)

    p_socs = sub.add_parser("socs", help="build + cache SOCS kernels")
    _add_common(p_socs)
    p_socs.add_argument("--rank", type=int, default=64)
    p_socs.add_argument("--power-iters", type=int, default=2)
    p_socs.add_argument("--lean", default="auto", choices=["auto", "on", "off"],
                        help="single-probe-block in-place build (fits rank "
                             "256 at 2048^2 in 16 GB HBM; ~2x build time)")
    p_socs.add_argument("--polarization", default="scalar",
                        choices=["scalar", "x", "y", "unpolarized"],
                        help="build polarized (vector Jones-pupil) kernels "
                             "via the summed-TCC eigensolver")
    _add_chromatic(p_socs)
    p_socs.add_argument("--out", default=None, help="output .npz path")
    p_socs.set_defaults(func=cmd_socs)

    args = parser.parse_args(argv)
    return args.func(_resolve_aberrations(args))


if __name__ == "__main__":
    sys.exit(main())
