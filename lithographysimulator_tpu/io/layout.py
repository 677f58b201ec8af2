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


# Backwards-compatible aliases
mask_from_gds = mask_from_layout
mask_from_oasis = mask_from_layout
