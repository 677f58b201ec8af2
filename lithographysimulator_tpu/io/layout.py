"""Layout -> Mask: GDSII (or raw polygon lists) rasterized onto the grid.

Bridges :mod:`.gdsii` and the native rasterizer into the imaging pipeline:
``mask_from_gds`` loads a cell, selects a layer, and samples it onto an
(n, n) grid at the configured pixel pitch — binary or anti-aliased
(gray-level masks feed the imaging path unchanged; intermediate transmission
values are physically meaningful for sub-pixel edges).
"""

from __future__ import annotations

import numpy as np

from ..config import OpticsConfig
from ..models.mask import Mask, from_array
from .gdsii import read_gds
from .native import rasterize


def mask_from_polygons(
    polygons,
    config: OpticsConfig,
    *,
    origin=None,
    antialias: int = 0,
) -> Mask:
    """Rasterize (v, 2) nm-coordinate polygons onto ``config``'s grid.

    ``origin``: layout (x, y) mapped to the grid's low corner; default
    centers the polygons' bounding box in the field.
    """
    n = config.n
    if origin is None:
        if len(polygons):
            allv = np.concatenate([np.asarray(p, np.float64).reshape(-1, 2)
                                   for p in polygons])
            center = 0.5 * (allv.min(axis=0) + allv.max(axis=0))
        else:
            center = np.zeros(2)
        origin = (center[0] - config.field_nm / 2.0,
                  center[1] - config.field_nm / 2.0)
    grid = rasterize(polygons, origin=origin, pixel_size=config.pixel_size,
                     n=n, antialias=antialias)
    return from_array(grid, config)


def mask_from_layout(
    path,
    config: OpticsConfig,
    *,
    cell: str | None = None,
    layer: int | None = None,
    origin=None,
    antialias: int = 0,
) -> Mask:
    """Load a GDSII or OASIS file (dispatch on the OASIS magic bytes),
    flatten ``cell`` (default: the top cell), keep ``layer`` (default: all
    layers), and rasterize onto the config grid."""
    from pathlib import Path

    head = Path(path).open("rb").read(13)
    if head == b"%SEMI-OASIS\r\n":
        from .oasis import read_oasis

        lib = read_oasis(path)
    else:
        lib = read_gds(path)
    polys = lib.flatten(cell)
    if layer is not None:
        polys = [p for p in polys if p.layer == layer]
    return mask_from_polygons([p.xy_nm for p in polys], config,
                              origin=origin, antialias=antialias)


def window_provider(
    polygons,
    config: OpticsConfig,
    big_n: int,
    *,
    origin=None,
    antialias: int = 0,
):
    """``window_fn(row0, col0) -> (n, n)`` rasterizing only the polygons that
    intersect each tile window — the streaming front end for
    :func:`..ops.tiled.tiled_socs_image_stream`. No full-chip raster is ever
    built: memory is O(tile^2) + the polygon list, so layouts far larger
    than device (or host) memory stream through tile-sized optics.

    ``origin``: layout (x, y) of chip pixel (0, 0)'s low corner; default
    centers the polygons' bounding box in the ``big_n``-pixel chip. Window
    pixel (r, c) samples layout point
    ``origin + ((col0+c+0.5) px, (row0+r+0.5) px)`` — identical arithmetic
    to one big :func:`..io.native.rasterize` call, so streamed windows are
    bit-identical to slices of the full-chip raster."""
    px = config.pixel_size
    n = config.n
    polys = [np.asarray(p, np.float64).reshape(-1, 2) for p in polygons]
    polys = [p for p in polys if len(p) >= 3]
    if origin is None:
        if polys:
            allv = np.concatenate(polys)
            center = 0.5 * (allv.min(axis=0) + allv.max(axis=0))
        else:
            center = np.zeros(2)
        half = big_n * px / 2.0
        origin = (center[0] - half, center[1] - half)
    if polys:
        boxes = np.array([[p[:, 0].min(), p[:, 1].min(),
                           p[:, 0].max(), p[:, 1].max()] for p in polys])
    else:
        boxes = np.zeros((0, 4))

    def window_fn(row0: int, col0: int) -> np.ndarray:
        x_lo = origin[0] + col0 * px
        y_lo = origin[1] + row0 * px
        x_hi = x_lo + n * px
        y_hi = y_lo + n * px
        if len(boxes):
            hit = ((boxes[:, 0] < x_hi) & (boxes[:, 2] > x_lo)
                   & (boxes[:, 1] < y_hi) & (boxes[:, 3] > y_lo))
            selected = [p for p, h in zip(polys, hit) if h]
        else:
            selected = []
        return rasterize(selected, origin=(x_lo, y_lo), pixel_size=px,
                         n=n, antialias=antialias)

    return window_fn


def layout_window_provider(path, config: OpticsConfig, big_n: int, *,
                           cell: str | None = None, layer: int | None = None,
                           origin=None, antialias: int = 0):
    """:func:`window_provider` straight from a GDSII/OASIS file."""
    from pathlib import Path

    head = Path(path).open("rb").read(13)
    if head == b"%SEMI-OASIS\r\n":
        from .oasis import read_oasis

        lib = read_oasis(path)
    else:
        lib = read_gds(path)
    polys = lib.flatten(cell)
    if layer is not None:
        polys = [p for p in polys if p.layer == layer]
    return window_provider([p.xy_nm for p in polys], config, big_n,
                           origin=origin, antialias=antialias)


# Backwards-compatible aliases
mask_from_gds = mask_from_layout
mask_from_oasis = mask_from_layout
