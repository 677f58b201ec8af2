"""Full-chip metrology: focus-exposure matrices and MEEF on the tiled path.

The per-field metrology helpers (:mod:`.models.resist`) measure CDs on one
optical field; production process-window work runs on full-chip layouts that
only fit through the tiled imager (:mod:`.ops.tiled`). This module drives
them together: one SOCS kernel build + one tiled full-chip image per focal
plane, then the dose axis and CD measurement on the stitched image — so an
8192^2 focus-exposure matrix is a single call (CLI: ``fem`` subcommand).

The reference has no resist or metrology at all (its README.md:19 roadmap);
this is the "beyond parity" production-deployment layer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import OpticsConfig
from .models.resist import (ResistModel, aligned_edge_positions,
                            cd_uniformity, critical_dimension,
                            edge_placement_errors, feature_table, meef,
                            hotspots, nils_table, process_window)
from .ops.focus import focus_stack_aberrations
from .ops.tiled import tiled_socs_image


def tiled_focus_images(
    mask_big,
    tile_config: OpticsConfig,
    source_map,
    defocus_nm,
    *,
    base_aberrations=None,
    rank: int = 128,
    halo: int | None = None,
    engine: str = "auto",
    tiles_per_dispatch: int = 8,
    socs_builder=None,
    window_fn=None,
    big_n: int | None = None,
    field_aberrations=None,
    field_points: int = 3,
    field_blend: str = "linear",
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    warm_start: bool = True,
    warm_power_iters: int = 0,
    perturb=None,
    progress_cb=None,
    mask3d=None,
) -> np.ndarray:
    """(F, M, M) full-chip aerial images through focus: per plane, one SOCS
    build for the defocused pupil and one tiled stitch. The host loop over
    planes keeps a single plane's kernel set + image live at a time.

    ``socs_builder`` (optional) maps an aberration vector to a SOCSKernels
    set; the default is the shared jitted build (complex math must stay
    under jit on the TPU tunnel).

    ``warm_start`` (default on): adjacent focal planes' TCC operators are
    tiny perturbations of each other, so each plane's kernel build reuses
    the previous plane's converged Ritz basis as its probe block and runs
    only ``warm_power_iters`` power iterations — the F-plane sweep pays one
    cold build plus F-1 cheap warm builds (>= 2x total build time saved at
    F = 7) at unchanged randomized-vs-dense agreement
    (tests/test_hopkins.py). Disabled automatically where the
    standard-memory build would not fit HBM (the lean build keeps no
    basis), or when a custom ``socs_builder`` is supplied.

    ``polarization``/``apodize`` run every plane's kernel build through the
    polarized vector build — full-chip vector FEM. ``chromatic`` (a
    :class:`..config.LaserSpectrum`) makes every plane polychromatic: the
    spectral focus blur rides ON TOP of each sweep plane's defocus, so the
    FEM measures the process window the finite-bandwidth laser actually
    prints (bandwidth shrinks DOF — the effect this knob exists to expose).

    ``field_aberrations(fx, fy) -> OSA coefficients`` makes the optics vary
    across the chip (scanner-slit aberration maps): each plane images
    through :func:`..ops.tiled.tiled_socs_image_field` with the plane's
    defocus ADDED to the field map's entry 4 — so field curvature and the
    focus sweep compose. Not available with the streaming ``window_fn``
    path, and ``base_aberrations``/``socs_builder`` are ignored (the field
    map IS the base).

    Pass ``window_fn`` + ``big_n`` instead of ``mask_big`` to STREAM the
    chip through :func:`..ops.tiled.tiled_socs_image_stream` (e.g. from
    :func:`..io.layout.layout_window_provider`) — metrology then runs on
    layouts that never exist as one raster."""
    from .ops.hopkins import lean_auto
    from .ops.tiled import tiled_socs_image_field, tiled_socs_image_stream
    from .simulate import (_socs_build_basis_with_channels,
                           _socs_build_with_channels)

    if (window_fn is None) == (mask_big is None):
        raise ValueError("pass exactly one of mask_big or (window_fn, big_n)")
    if window_fn is not None and big_n is None:
        raise ValueError("window_fn requires big_n")
    if field_aberrations is not None:
        if window_fn is not None:
            raise ValueError(
                "field_aberrations is not supported on the streaming path")
        out = []
        for defocus in np.asarray(defocus_nm, np.float64):
            def fn(fx, fy, _d=float(defocus)):
                c = np.array(field_aberrations(fx, fy), np.float32).copy()
                if c.shape[0] < 5:
                    c = np.pad(c, (0, 5 - c.shape[0]))
                c[4] += _d
                return c

            img = tiled_socs_image_field(
                mask_big, tile_config, source_map, fn,
                field_points=field_points, blend=field_blend, rank=rank,
                halo=halo, engine=engine,
                tiles_per_dispatch=tiles_per_dispatch,
                polarization=polarization, apodize=apodize,
                chromatic=chromatic, mask3d=mask3d)
            if perturb is not None and perturb.active:
                from .simulate import _compiled_perturb

                img = _compiled_perturb(perturb, tile_config.pixel_size)(
                    jnp.asarray(np.asarray(img)))
            out.append(np.asarray(img))
        return np.stack(out)
    if base_aberrations is None:
        base_aberrations = np.zeros((5,), np.float32)
    src_dev = np.asarray(source_map, np.float32)
    if socs_builder is not None:
        build = socs_builder
    elif warm_start and not lean_auto(rank + 16, tile_config.n):
        cold = _socs_build_basis_with_channels(tile_config, rank,
                                               polarization, apodize,
                                               chromatic=chromatic)
        warm = _socs_build_basis_with_channels(tile_config, rank,
                                               polarization, apodize,
                                               power_iters=warm_power_iters,
                                               warm=True, chromatic=chromatic)
        basis_box = [None]

        def build(aberr):
            if basis_box[0] is None:
                socs, basis_box[0], _, _ = cold(aberr, src_dev)
            else:
                socs, basis_box[0], _, _ = warm(aberr, src_dev, basis_box[0])
            return socs
    else:
        build = lambda aberr: _socs_build_with_channels(
            tile_config, rank, polarization, apodize,
            chromatic)(aberr, src_dev)[0]
    stack_ab = np.asarray(
        focus_stack_aberrations(base_aberrations, np.asarray(defocus_nm)))
    out = []
    for pi, aberr in enumerate(stack_ab):
        socs = build(aberr)
        if window_fn is not None:
            img = tiled_socs_image_stream(
                window_fn, big_n, socs, tile_config, halo=halo,
                engine=engine, tiles_per_dispatch=tiles_per_dispatch,
                mask3d=mask3d)
        else:
            img = tiled_socs_image(
                mask_big, socs, tile_config, halo=halo, engine=engine,
                tiles_per_dispatch=tiles_per_dispatch, mask3d=mask3d)
        if perturb is not None and perturb.active:
            from .simulate import _compiled_perturb

            img = _compiled_perturb(perturb, tile_config.pixel_size)(
                jnp.asarray(np.asarray(img)))
        out.append(np.asarray(img))
        if progress_cb is not None:
            progress_cb((pi + 1) / len(stack_ab))
    return np.stack(out)


def tiled_fem(
    mask_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    defocus_nm,
    doses,
    target_cd_nm: float | None = None,
    resist: ResistModel | None = None,
    tolerance: float = 0.10,
    base_aberrations=None,
    rank: int = 128,
    row: int | None = None,
    halo: int | None = None,
    engine: str = "auto",
    tiles_per_dispatch: int = 8,
    window_fn=None,
    big_n: int | None = None,
    field_aberrations=None,
    field_points: int = 3,
    field_blend: str = "linear",
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    warm_start: bool = True,
    cd_stat: str = "median",
    cd_axis: int = 1,
    cd_row_step: int | None = None,
    target_geometry=None,
    progress_cb=None,
    hotspot_nils: float | None = None,
    perturb=None,
    pv_bands: bool = False,
    mask3d=None,
) -> dict:
    """Full-chip focus-exposure matrix -> process window, in one call.
    Accepts a streaming ``window_fn`` + ``big_n`` in place of ``mask_big``,
    and ``field_aberrations`` for across-chip scanner-slit optics
    (see :func:`tiled_focus_images`).

    CD measurement (round 3): by default every (focus, dose) cell measures
    ALL printed features on the chip (:func:`..models.resist.feature_table`,
    subpixel edges, cut lines subsampled by ``cd_row_step``) and reports the
    ``cd_stat`` ('median'/'mean'/'min'/'max') of the width distribution —
    a full-chip process window, not one feature's. Pass an explicit ``row``
    to fall back to the legacy single-row cut (e.g. to probe the field
    edge). The nominal cell (middle focus, dose nearest 1) additionally
    gets a full CD-uniformity analysis (``result['cdu']``: mean / 3-sigma /
    range / count + a coarse CD map), and, when ``target_geometry`` (or the
    in-memory ``mask_big``) is available, per-edge placement errors
    (``result['epe']``, :func:`..models.resist.edge_placement_errors`).

    Returns ``{"cd_nm": (F, D) matrix, "defocus_nm": ..., "doses": ...,
    "depth_of_focus_nm": ..., "exposure_latitude": ..., "in_spec_fraction":
    ..., "cdu": ..., "epe": ...}``. All focal planes share one
    normalization scale (the stack max), so the dose axis means the same
    thing at every focus — per-image normalization would hide the
    through-focus contrast loss the FEM exists to measure.

    ``target_cd_nm=None`` self-calibrates: the window is centered on the CD
    printed at the middle focal plane and the dose nearest 1.0.

    ``pv_bands=True`` additionally accumulates process-variability bands
    over the (focus x dose) corners at zero extra imaging cost (each cell's
    developed profile is already in hand): ``result['pv']`` holds the outer
    (union) and inner (intersection) printed contours, the band map
    (``outer & ~inner`` — the region where the printed edge wanders across
    the process window), its area fraction, and per-edge band widths
    (printed edge positions aligned to the target's edge list per cell via
    :func:`..models.resist.aligned_edge_positions`; band = max - min over
    conditions). Edges whose feature fails to print in ANY condition are
    counted in ``edges_open`` instead — those are catastrophic (bridge /
    pinch) sites, not finite bands. The standard OPC sign-off artifact; no
    reference counterpart."""
    resist = resist or ResistModel()
    stack = tiled_focus_images(
        mask_big, tile_config, source_map, defocus_nm,
        base_aberrations=base_aberrations, rank=rank, halo=halo,
        engine=engine, tiles_per_dispatch=tiles_per_dispatch,
        window_fn=window_fn, big_n=big_n,
        field_aberrations=field_aberrations, field_points=field_points,
        field_blend=field_blend, polarization=polarization, apodize=apodize,
        chromatic=chromatic, warm_start=warm_start, perturb=perturb,
        mask3d=mask3d,
        progress_cb=(None if progress_cb is None
                     else lambda f: progress_cb(0.8 * f)))
    scale = max(float(stack.max()), 1e-30)
    doses = np.asarray(doses, np.float64)
    stat_fn = {"median": np.median, "mean": np.mean,
               "min": np.min, "max": np.max}.get(cd_stat)
    if stat_fn is None:
        raise ValueError(f"unknown cd_stat {cd_stat!r}")
    chip_n = stack.shape[-1]
    if cd_row_step is None:
        cd_row_step = max(1, chip_n // 256)  # cap per-cell cut lines at ~256

    def measure(profile_np):
        if row is not None:
            return critical_dimension(profile_np, tile_config, row=row)
        widths = feature_table(profile_np, tile_config, axis=cd_axis,
                               row_step=cd_row_step)["width_nm"]
        return float(stat_fn(widths)) if widths.size else 0.0

    i_mid = len(stack) // 2
    j_nom = int(np.argmin(np.abs(doses - 1.0)))
    cds = np.empty((len(stack), len(doses)))
    cdu = None
    epe = None
    nils = None
    spots = None
    pv_target_table = None
    pv_inner = pv_outer = None
    pv_rise: list = []
    pv_fall: list = []
    if pv_bands:
        pv_target = (target_geometry if target_geometry is not None
                     else mask_big)
        if pv_target is not None:
            pv_target_table = feature_table(
                np.asarray(pv_target, np.float32), tile_config, axis=cd_axis,
                row_step=cd_row_step)
    for i, image in enumerate(stack):
        norm = image / scale
        for j, dose in enumerate(doses):
            profile = np.asarray(resist.develop_binary(
                norm * dose, tile_config, normalize=False))
            cds[i, j] = measure(profile)
            if pv_bands:
                pb = profile > 0.5
                pv_inner = pb if pv_inner is None else (pv_inner & pb)
                pv_outer = pb if pv_outer is None else (pv_outer | pb)
                if pv_target_table is not None:
                    r, f = aligned_edge_positions(
                        profile, pv_target_table, tile_config, axis=cd_axis,
                        row_step=cd_row_step)
                    pv_rise.append(r)
                    pv_fall.append(f)
            if progress_cb is not None:
                done = i * len(doses) + j + 1
                progress_cb(0.8 + 0.2 * done / (len(stack) * len(doses)))
            if i == i_mid and j == j_nom:
                cdu = cd_uniformity(profile, tile_config, axis=cd_axis,
                                    row_step=cd_row_step)
                nils = nils_table(norm * dose, tile_config,
                                  threshold=resist.threshold, axis=cd_axis,
                                  row_step=cd_row_step, normalize=False)
                if hotspot_nils is not None:
                    spots = hotspots(norm * dose, tile_config,
                                     threshold=resist.threshold,
                                     nils_limit=hotspot_nils, axis=cd_axis,
                                     row_step=cd_row_step)
                    spots["locations"] = np.round(
                        spots["locations"], 2).tolist()
                else:
                    spots = None
                target = (target_geometry if target_geometry is not None
                          else mask_big)
                if target is not None:
                    epe = edge_placement_errors(
                        profile, np.asarray(target, np.float32), tile_config,
                        axis=cd_axis, row_step=cd_row_step)
    if target_cd_nm is None:
        target_cd_nm = float(cds[i_mid, j_nom])
    summary = process_window(cds, defocus_nm, doses,
                             target_cd_nm=target_cd_nm, tolerance=tolerance)
    pv = None
    if pv_bands:
        band_map = pv_outer & ~pv_inner
        if pv_rise:
            rise = np.stack(pv_rise)  # (conditions, target features)
            fall = np.stack(pv_fall)
            full = (~np.isnan(rise).any(0)) & (~np.isnan(fall).any(0))
            widths = np.concatenate([
                rise[:, full].max(0) - rise[:, full].min(0),
                fall[:, full].max(0) - fall[:, full].min(0),
            ]) if full.any() else np.zeros(0)
            open_edges = 2 * int((~full).sum())
        else:
            widths = np.zeros(0)
            open_edges = 0
        pv = {
            "outer": pv_outer.astype(np.uint8),
            "inner": pv_inner.astype(np.uint8),
            "band": band_map.astype(np.uint8),
            "band_area_frac": float(band_map.mean()),
            "edge_band_mean_nm": (float(widths.mean()) if widths.size
                                  else 0.0),
            "edge_band_max_nm": float(widths.max()) if widths.size else 0.0,
            "edge_band_sigma_nm": (float(widths.std()) if widths.size
                                   else 0.0),
            "edges_measured": int(widths.size),
            "edges_open": open_edges,
            "conditions": int(len(stack) * len(doses)),
        }
    return {
        "pv": pv,
        "cd_nm": cds,
        "defocus_nm": np.asarray(defocus_nm, np.float64),
        "doses": doses,
        "target_cd_nm": target_cd_nm,
        "cdu": cdu,
        "epe": epe,
        "nils": None if nils is None else {
            k: nils[k] for k in ("count", "mean_nils", "min_nils",
                                 "mean_ils_per_nm")},
        "hotspots": spots,
        **summary,
    }


def tiled_stochastic(
    mask_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    model=None,
    trials: int = 32,
    seed: int = 0,
    base_aberrations=None,
    rank: int = 64,
    halo: int | None = None,
    tiles_per_dispatch: int = 8,
    window_fn=None,
    big_n: int | None = None,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    axis: int = 1,
    trial_chunk: int = 8,
    psd: bool = False,
    psd_row_step: int | None = None,
    progress_cb=None,
    mask3d=None,
) -> dict:
    """Full-chip stochastic printing: one tiled aerial image, then the
    Monte-Carlo photon/acid ensemble over the WHOLE stitched raster.

    Stochastic failure is a tail statistic — a defect rate of 1e-3 per cut
    line only shows up with chip-scale edge counts, which is exactly what
    the tiled image provides (the per-field ensemble sees a few features;
    this sees thousands). Returns the
    :func:`..models.stochastic.stochastic_ensemble` summary (LER / LWR /
    LCDU, bridge/break rates, print-probability band) plus ``big_n``.

    The optical path carries every production option (polarization /
    chromatic kernel sets, window streaming); the noise trials run on the
    full image in ``trial_chunk``-sized device batches (the noise chain is
    elementwise + one FFT blur, so chip-sized batches are cheap relative to
    imaging). No reference counterpart."""
    from .models.stochastic import StochasticResist, stochastic_ensemble

    model = model or StochasticResist()
    image = tiled_focus_images(
        mask_big, tile_config, source_map, [0.0],
        base_aberrations=base_aberrations, rank=rank, halo=halo,
        tiles_per_dispatch=tiles_per_dispatch, window_fn=window_fn,
        big_n=big_n, polarization=polarization, apodize=apodize,
        chromatic=chromatic, mask3d=mask3d,
        progress_cb=(None if progress_cb is None
                     else lambda f: progress_cb(0.6 * f)))[0]
    out = stochastic_ensemble(np.asarray(image), tile_config, model,
                              trials=trials, seed=seed, axis=axis,
                              trial_chunk=trial_chunk,
                              psd=psd and psd_row_step is None)
    if psd:
        if psd_row_step is None:
            # default: the PSD accumulated from the SAME streamed ensemble
            # rows — zero extra trials (frequency ceiling follows the
            # ensemble's ~512-cut-line row_step)
            spec = out.pop("psd")
        else:
            # dedicated dense sampling: re-runs the trial ensemble at the
            # requested cut-line density (the PSD's frequency ceiling is
            # 1/(2*row_step*px)) — roughly doubles the trial cost
            from .models.stochastic import stochastic_psd

            spec = stochastic_psd(np.asarray(image), tile_config, model,
                                  trials=trials, seed=seed, axis=axis,
                                  row_step=psd_row_step,
                                  trial_chunk=trial_chunk)
        # Flattened to TOP-LEVEL keys: the serving layer's _finalize_result
        # inlines/streams only top-level arrays, so a nested dict's numpy
        # arrays would serialize as lossy repr strings (ADVICE r3).
        for k, v in spec.items():
            out[k if k.startswith("psd") else f"psd_{k}"] = v
    if progress_cb is not None:
        progress_cb(1.0)
    out["big_n"] = int(np.asarray(image).shape[0])
    return out


def orc_check(
    mask_big,
    target_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    resist: ResistModel | None = None,
    rank: int = 128,
    halo: int | None = None,
    tiles_per_dispatch: int = 8,
    polarization=None,
    chromatic=None,
    perturb=None,
    mrc_rules=None,
    hotspot_nils: float | None = 1.5,
    epe_spec_nm: float | None = None,
    axis: int = 1,
    process_corners: dict | None = None,
    mask3d=None,
) -> dict:
    """OPC verification (ORC): ONE full-chip deck over a candidate mask.

    Images ``mask_big`` once through the tiled path (all production
    options), develops it, and runs every verification the flow needs
    before committing a mask: printed-pattern fidelity + per-edge EPE vs
    ``target_big``, NILS + weakest-NILS hotspots on the aerial image, and
    (with ``mrc_rules``, a :class:`..models.mrc.MaskRules`) manufacturing
    rule checks on the MASK itself. ``pass_`` aggregates: no missing or
    spurious features, max |EPE| within ``epe_spec_nm`` (when given), MRC
    clean (when checked). The standard EDA sign-off bundled as one call —
    no reference counterpart.

    ``process_corners`` extends the deck across the process window (a mask
    that prints at nominal but collapses at the focus/dose corners must
    not sign off): a dict with ``defocus_nm`` / ``doses`` lists and
    optionally ``max_edge_band_nm`` (PV-band width spec per edge) and
    ``max_open_edges`` (default 0) — runs the FEM with PV bands
    (:func:`tiled_fem` ``pv_bands=True``) and gates ``pass_`` on
    catastrophic (unprinted-at-some-corner) edges and on the per-edge
    band width. Adds ``out['pv']`` stats and ``out['process_window']``."""
    from .models.mrc import mrc_check
    from .models.resist import pattern_fidelity

    resist = resist or ResistModel()
    image = tiled_focus_images(
        mask_big, tile_config, source_map, [0.0], rank=rank, halo=halo,
        tiles_per_dispatch=tiles_per_dispatch, polarization=polarization,
        chromatic=chromatic, perturb=perturb, mask3d=mask3d)[0]
    norm = image / max(float(image.max()), 1e-30)
    profile = np.asarray(resist.develop_binary(norm, tile_config,
                                               normalize=False))
    target = np.asarray(target_big, np.float32)
    out: dict = {"fidelity": pattern_fidelity(profile, target, tile_config)}
    epe = edge_placement_errors(profile, target, tile_config, axis=axis,
                                row_step=max(1, profile.shape[0] // 512))
    out["epe"] = {k: v for k, v in epe.items() if not k.startswith("epe_")}
    nt = nils_table(norm, tile_config, threshold=resist.threshold, axis=axis)
    out["nils"] = {k: nt[k] for k in ("count", "mean_nils", "min_nils",
                                      "mean_ils_per_nm")}
    if hotspot_nils is not None:
        spots = hotspots(norm, tile_config, threshold=resist.threshold,
                         nils_limit=hotspot_nils, axis=axis)
        spots["locations"] = np.round(
            np.asarray(spots["locations"]), 2).tolist()[:20]
        out["hotspots"] = spots
    if mrc_rules is not None:
        check = mrc_check(mask_big, tile_config, mrc_rules)
        out["mrc"] = {k: v for k, v in check.items()
                      if not isinstance(v, np.ndarray)}
    ok = (out["epe"]["missing"] == 0 and out["epe"]["spurious"] == 0)
    if epe_spec_nm is not None:
        ok = ok and out["epe"]["max_abs_epe_nm"] <= epe_spec_nm
    if mrc_rules is not None:
        ok = ok and out["mrc"]["clean"]
    if process_corners is not None:
        fem = tiled_fem(
            mask_big, tile_config, source_map,
            defocus_nm=process_corners.get("defocus_nm",
                                           [-60.0, 0.0, 60.0]),
            doses=process_corners.get("doses", [0.95, 1.0, 1.05]),
            resist=resist, rank=rank, halo=halo,
            tiles_per_dispatch=tiles_per_dispatch,
            polarization=polarization, chromatic=chromatic,
            perturb=perturb, target_geometry=target, cd_axis=axis,
            pv_bands=True, mask3d=mask3d)
        pv = fem["pv"]
        out["pv"] = {k: v for k, v in pv.items()
                     if k not in ("outer", "inner", "band")}
        out["process_window"] = {
            "depth_of_focus_nm": fem["depth_of_focus_nm"],
            "exposure_latitude": fem["exposure_latitude"],
        }
        ok = ok and pv["edges_open"] <= int(
            process_corners.get("max_open_edges", 0))
        max_band = process_corners.get("max_edge_band_nm")
        if max_band is not None:
            ok = ok and pv["edge_band_max_nm"] <= float(max_band)
    out["pass_"] = bool(ok)
    return out


def dose_correction_map(fem_result: dict, *,
                        target_cd_nm: float | None = None,
                        max_correction: float = 0.15) -> dict:
    """Per-region dose corrections that flatten CD uniformity.

    Process control closes the loop the FEM opens: the FEM's dose axis
    gives the chip-average CD-vs-dose sensitivity (nm per relative dose,
    least-squares slope over the dose axis at mid focus), and the CDU map
    gives each
    region's CD error; the corrective relative dose per region is
    ``1 - (CD_region - target) / sensitivity`` (clipped to
    ``+-max_correction`` — scanners bound dose modulation). Regions with
    no printed feature (NaN in the CDU map) get dose 1.0.

    Returns ``{"dose_map", "sensitivity_nm_per_dose", "target_cd_nm",
    "predicted_residual_nm"}``; apply the map by scaling the aerial image
    per region before develop (see the flattening regression in
    ``tests/test_metrology.py``)."""
    cds = np.asarray(fem_result["cd_nm"], np.float64)
    doses = np.asarray(fem_result["doses"], np.float64)
    if cds.shape[1] < 2:
        raise ValueError("dose_correction_map needs >= 2 dose columns")
    cdu = fem_result.get("cdu")
    if not cdu or cdu.get("cd_map_nm") is None:
        raise ValueError("fem_result carries no CDU map")
    i_mid = cds.shape[0] // 2
    # least-squares slope over the WHOLE dose axis: binary-profile CDs are
    # pixel-quantized, so a narrow central difference can alias to zero
    # where a wider fit still captures the sensitivity
    live = cds[i_mid] > 0
    if live.sum() < 2:
        raise ValueError("CD is dose-insensitive at the nominal point")
    sens = float(np.polyfit(doses[live], cds[i_mid, live], 1)[0])
    if abs(sens) < 1e-9:
        raise ValueError("CD is dose-insensitive at the nominal point")
    if target_cd_nm is None:
        target_cd_nm = float(fem_result.get("target_cd_nm")
                             or cdu["mean_cd_nm"])
    cd_map = np.asarray(cdu["cd_map_nm"], np.float64)
    with np.errstate(invalid="ignore"):
        corr = -(cd_map - target_cd_nm) / sens
    corr = np.clip(np.nan_to_num(corr, nan=0.0), -max_correction,
                   max_correction)
    residual = np.nan_to_num(cd_map - target_cd_nm + corr * sens, nan=0.0)
    return {
        "dose_map": (1.0 + corr).astype(np.float32),
        "sensitivity_nm_per_dose": float(sens),
        "target_cd_nm": float(target_cd_nm),
        "predicted_residual_nm": float(np.abs(residual).max()),
    }


def apply_dose_map(image, dose_map) -> np.ndarray:
    """Scale an aerial image by a coarse per-region dose map (nearest
    upsampling to the image grid) — the exposure-side application of
    :func:`dose_correction_map`."""
    img = np.asarray(image)
    dm = np.asarray(dose_map, np.float64)
    reps_y = -(-img.shape[0] // dm.shape[0])
    reps_x = -(-img.shape[1] // dm.shape[1])
    up = np.kron(dm, np.ones((reps_y, reps_x)))[:img.shape[0], :img.shape[1]]
    return (img * up).astype(img.dtype)


def tiled_meef(
    mask_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    resist: ResistModel | None = None,
    bias_px: int = 1,
    rank: int = 128,
    halo: int | None = None,
    engine: str = "auto",
    tiles_per_dispatch: int = 8,
    socs=None,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    mask3d=None,
) -> float:
    """Full-chip MEEF: d(printed CD)/d(mask CD) with the biased mask imaged
    through the tiled path (kernels built once, reused for both biases;
    ``polarization`` builds them with the vector physics, ``chromatic``
    with the finite-bandwidth spectrum)."""
    resist = resist or ResistModel()
    if socs is None:
        from .simulate import _socs_build_with_channels

        socs = _socs_build_with_channels(tile_config, rank, polarization,
                                         apodize, chromatic)(
            np.zeros((5,), np.float32), np.asarray(source_map, np.float32))[0]

    def image_fn(geometry):
        return tiled_socs_image(
            np.asarray(geometry, np.float32), socs, tile_config, halo=halo,
            engine=engine, tiles_per_dispatch=tiles_per_dispatch,
            mask3d=mask3d)

    return meef(mask_big, image_fn, tile_config, resist, bias_px=bias_px)


def tiled_meef_map(
    mask_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    resist: ResistModel | None = None,
    bias_px: int = 1,
    rank: int = 128,
    halo: int | None = None,
    engine: str = "auto",
    tiles_per_dispatch: int = 8,
    map_blocks: int | None = 16,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    mask3d=None,
) -> dict:
    """Per-feature full-chip MEEF + per-region map
    (:func:`..models.resist.meef_table` through the tiled imager — kernels
    built once, reused for both biased prints). The map shows where mask
    errors amplify most (iso-dense split, corner-heavy regions) instead of
    averaging the chip to one number like :func:`tiled_meef`."""
    from .models.resist import meef_table
    from .simulate import _socs_build_with_channels

    resist = resist or ResistModel()
    socs = _socs_build_with_channels(tile_config, rank, polarization,
                                     apodize, chromatic)(
        np.zeros((5,), np.float32), np.asarray(source_map, np.float32))[0]

    def image_fn(geometry):
        return tiled_socs_image(
            np.asarray(geometry, np.float32), socs, tile_config, halo=halo,
            engine=engine, tiles_per_dispatch=tiles_per_dispatch,
            mask3d=mask3d)

    return meef_table(mask_big, image_fn, tile_config, resist,
                      bias_px=bias_px, map_blocks=map_blocks)


def defect_printability(
    mask_big,
    defective_big,
    tile_config: OpticsConfig,
    source_map,
    *,
    resist: ResistModel | None = None,
    rank: int = 64,
    halo: int | None = None,
    engine: str = "auto",
    tiles_per_dispatch: int = 8,
    defocus_nm=(0.0,),
    cd_spec_nm: float | None = None,
    axis: int = 1,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
) -> dict:
    """Mask-defect printability: does a reticle defect print, and at what
    CD cost? The inspection disposition question a mask shop answers for
    every blank/patterned defect before (re)shipping a reticle.

    Images the nominal and defective masks through the tiled path with ONE
    shared kernel set per focal plane, then aligns the defective print's
    subpixel edges to the nominal print's feature table
    (:func:`..models.resist.aligned_edge_positions`) on the CONTINUOUS
    post-diffusion field — the binary develop quantizes edges to pixels,
    which would read a sub-nm disturbance near a threshold crossing as a
    full-pixel CD jump. Per focal plane it
    reports the peak aerial-intensity disturbance and its location, the
    per-feature CD deltas, and features that vanish (pinch) or appear
    (bridge / printing defect). ``prints`` is the worst-case-over-focus
    verdict: any |CD delta| beyond ``cd_spec_nm`` (default 5% of the
    nominal median CD) or any missing/new feature. No reference
    counterpart."""
    from .models.calibrate import _blur_np
    from .simulate import _socs_build_with_channels

    resist = resist or ResistModel()
    mask_big = np.asarray(mask_big, np.float32)
    defective_big = np.asarray(defective_big, np.float32)
    if mask_big.shape != defective_big.shape:
        raise ValueError(f"mask {mask_big.shape} vs defective "
                         f"{defective_big.shape} shapes differ")
    build = _socs_build_with_channels(tile_config, rank, polarization,
                                      apodize, chromatic)
    px = tile_config.pixel_size
    src = np.asarray(source_map, np.float32)
    per_focus = []
    worst_delta = 0.0
    missing_total = 0
    new_total = 0
    median_cd = 0.0
    for d in defocus_nm:
        ab = np.zeros(5, np.float32)
        ab[4] = float(d)
        socs = build(ab, src)[0]

        def image(m, _socs=socs):
            return np.asarray(tiled_socs_image(
                m, _socs, tile_config, halo=halo, engine=engine,
                tiles_per_dispatch=tiles_per_dispatch))

        nominal = image(mask_big)
        defective = image(defective_big)
        scale = max(float(nominal.max()), 1e-30)
        nominal = nominal / scale  # jax-backed buffers are read-only
        defective = defective / scale
        delta = defective - nominal
        iy, ix = np.unravel_index(int(np.argmax(np.abs(delta))), delta.shape)
        # edges measured on the CONTINUOUS post-diffusion field (host-numpy
        # blur — eager jnp FFTs die on the TPU tunnel): the binary develop
        # quantizes edges to pixels, so a 3%-intensity disturbance near a
        # threshold crossing reads as a full-pixel (25 nm) CD jump there
        # while the true edge motion is sub-nm
        p_nom = _blur_np(nominal, float(resist.diffusion_nm), px)
        p_def = _blur_np(defective, float(resist.diffusion_nm), px)
        row_step = max(1, p_nom.shape[0] // 256)
        ttab = feature_table(p_nom, tile_config, axis=axis,
                             threshold=resist.threshold, row_step=row_step)
        dtab = feature_table(p_def, tile_config, axis=axis,
                             threshold=resist.threshold, row_step=row_step)
        rise, fall = aligned_edge_positions(p_def, ttab, tile_config,
                                            threshold=resist.threshold,
                                            axis=axis, row_step=row_step)
        matched = ~np.isnan(rise) & ~np.isnan(fall)
        cd_delta = (fall - rise)[matched] - ttab["width_nm"][matched]
        missing = int((~matched).sum())
        new = max(0, int(dtab["row"].size) - int(matched.sum()))
        if ttab["width_nm"].size:
            median_cd = max(median_cd, float(np.median(ttab["width_nm"])))
        worst_here = float(np.max(np.abs(cd_delta))) if cd_delta.size else 0.0
        worst_delta = max(worst_delta, worst_here)
        missing_total += missing
        new_total += new
        # worst-CD-delta location (cut-line frame -> image frame, nm)
        if cd_delta.size:
            k = int(np.argmax(np.abs(cd_delta)))
            rows = ttab["row"][matched]
            centers = ttab["center_nm"][matched]
            along, across = float(centers[k]), float(rows[k]) * px
            cd_loc = ((across, along) if axis == 1 else (along, across))
        else:
            cd_loc = None
        per_focus.append({
            "defocus_nm": float(d),
            "max_delta_intensity": float(np.abs(delta).max()),
            "delta_location_nm": (float(iy) * px, float(ix) * px),
            "max_abs_cd_delta_nm": worst_here,
            "cd_delta_location_nm": cd_loc,
            "missing_features": missing,
            "new_features": new,
        })
    if cd_spec_nm is None:
        cd_spec_nm = 0.05 * median_cd if median_cd else 1.0
    prints = (worst_delta > cd_spec_nm or missing_total > 0
              or new_total > 0)
    return {
        "prints": bool(prints),
        "cd_spec_nm": float(cd_spec_nm),
        "max_abs_cd_delta_nm": worst_delta,
        "missing_features": missing_total,
        "new_features": new_total,
        "per_focus": per_focus,
    }
