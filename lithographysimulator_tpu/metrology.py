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

import numpy as np

from .config import OpticsConfig
from .models.resist import ResistModel, critical_dimension, meef, process_window
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
) -> np.ndarray:
    """(F, M, M) full-chip aerial images through focus: per plane, one SOCS
    build for the defocused pupil and one tiled stitch. The host loop over
    planes keeps a single plane's kernel set + image live at a time.

    ``socs_builder`` (optional) maps an aberration vector to a SOCSKernels
    set; the default is the shared jitted build (complex math must stay
    under jit on the TPU tunnel).

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
    from .ops.tiled import tiled_socs_image_field, tiled_socs_image_stream
    from .simulate import _compiled_socs_build

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

            out.append(np.asarray(tiled_socs_image_field(
                mask_big, tile_config, source_map, fn,
                field_points=field_points, rank=rank, halo=halo,
                engine=engine, tiles_per_dispatch=tiles_per_dispatch)))
        return np.stack(out)
    if base_aberrations is None:
        base_aberrations = np.zeros((5,), np.float32)
    src_dev = np.asarray(source_map, np.float32)
    build = socs_builder or (lambda aberr: _compiled_socs_build(
        tile_config, rank)(aberr, src_dev)[0])
    stack_ab = np.asarray(
        focus_stack_aberrations(base_aberrations, np.asarray(defocus_nm)))
    out = []
    for aberr in stack_ab:
        socs = build(aberr)
        if window_fn is not None:
            img = tiled_socs_image_stream(
                window_fn, big_n, socs, tile_config, halo=halo,
                engine=engine, tiles_per_dispatch=tiles_per_dispatch)
        else:
            img = tiled_socs_image(
                mask_big, socs, tile_config, halo=halo, engine=engine,
                tiles_per_dispatch=tiles_per_dispatch)
        out.append(np.asarray(img))
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
) -> dict:
    """Full-chip focus-exposure matrix -> process window, in one call.
    Accepts a streaming ``window_fn`` + ``big_n`` in place of ``mask_big``,
    and ``field_aberrations`` for across-chip scanner-slit optics
    (see :func:`tiled_focus_images`) — measure ``row`` cuts near the field
    edge to see the edge process window.

    Returns ``{"cd_nm": (F, D) matrix, "defocus_nm": ..., "doses": ...,
    "depth_of_focus_nm": ..., "exposure_latitude": ..., "in_spec_fraction":
    ...}``. All focal planes share one normalization scale (the stack max),
    so the dose axis means the same thing at every focus — per-image
    normalization would hide the through-focus contrast loss the FEM exists
    to measure.

    ``target_cd_nm=None`` self-calibrates: the window is centered on the CD
    printed at the middle focal plane and the dose nearest 1.0."""
    resist = resist or ResistModel()
    stack = tiled_focus_images(
        mask_big, tile_config, source_map, defocus_nm,
        base_aberrations=base_aberrations, rank=rank, halo=halo,
        engine=engine, tiles_per_dispatch=tiles_per_dispatch,
        window_fn=window_fn, big_n=big_n,
        field_aberrations=field_aberrations, field_points=field_points)
    scale = max(float(stack.max()), 1e-30)
    doses = np.asarray(doses, np.float64)
    cds = np.empty((len(stack), len(doses)))
    for i, image in enumerate(stack):
        norm = image / scale
        for j, dose in enumerate(doses):
            profile = resist.develop_binary(norm * dose, tile_config,
                                            normalize=False)
            cds[i, j] = critical_dimension(profile, tile_config, row=row)
    if target_cd_nm is None:
        target_cd_nm = float(cds[len(stack) // 2,
                                 int(np.argmin(np.abs(doses - 1.0)))])
    summary = process_window(cds, defocus_nm, doses,
                             target_cd_nm=target_cd_nm, tolerance=tolerance)
    return {
        "cd_nm": cds,
        "defocus_nm": np.asarray(defocus_nm, np.float64),
        "doses": doses,
        "target_cd_nm": target_cd_nm,
        **summary,
    }


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
) -> float:
    """Full-chip MEEF: d(printed CD)/d(mask CD) with the biased mask imaged
    through the tiled path (kernels built once, reused for both biases)."""
    resist = resist or ResistModel()
    if socs is None:
        from .simulate import _compiled_socs_build

        socs = _compiled_socs_build(tile_config, rank)(
            np.zeros((5,), np.float32), np.asarray(source_map, np.float32))[0]

    def image_fn(geometry):
        return tiled_socs_image(
            np.asarray(geometry, np.float32), socs, tile_config, halo=halo,
            engine=engine, tiles_per_dispatch=tiles_per_dispatch)

    return meef(mask_big, image_fn, tile_config, resist, bias_px=bias_px)
