"""Printed-contour extraction and GDSII export — the fab-handoff round trip.

Simulation ends in rasters (aerial images, resist profiles, OPC masks);
mask shops and inspection flows consume polygons. This module traces the
boundary of a thresholded raster into closed rectilinear polygons along
pixel edges and writes them through the GDSII writer (:mod:`.gdsii`), so a
printed contour (or a corrected OPC mask) can go straight back into a
layout flow.

The stitching walk runs in native C++ when the shared library is
available (``native/rasterizer.cpp`` ``trace_loops`` — full-chip boundary
sets run to millions of edges, where the python dict walk costs tens of
seconds); the pure-python path below is the reference implementation and
fallback, and a parity test pins the two on every geometry class.

The tracing is EXACT with respect to the raster: every emitted loop runs on
pixel-cell boundaries, so re-rasterizing the polygons with the native
center-sampling rasterizer (:func:`.native.rasterize`) reproduces the
binary raster bit-for-bit — the round-trip regression in
``tests/test_contours.py``. Directed-edge stitching: each filled/empty
pixel adjacency contributes one directed boundary edge (interior kept on
the left, so outer boundaries come out counter-clockwise and holes
clockwise — emitted as separate polygons, per the usual GDS XOR
convention); edges are collected vectorized and stitched by following
start-points, with the ambiguous checkerboard corner resolved by preferring
the sharpest left turn (keeps loops simple). Collinear runs collapse, so a
w x h rectangle is 4 vertices, not 2(w+h).

No reference counterpart (the reference has no IO at all).
"""

from __future__ import annotations

import numpy as np

from ..config import OpticsConfig


def trace_contours(profile, *, threshold: float = 0.5,
                   pixel_size: float = 1.0,
                   origin=(0.0, 0.0)) -> list[np.ndarray]:
    """Closed rectilinear boundary loops of ``profile > threshold``.

    Returns a list of (v, 2) float64 arrays of (x, y) vertices in layout
    units (``origin`` + pixel-edge coordinates * ``pixel_size``); column j
    spans x in [j, j+1] pixels, row i spans y in [i, i+1] — matching
    :func:`.native.rasterize`'s center-sampling convention. Outer loops are
    CCW, hole loops CW."""
    arr = np.asarray(profile) > threshold
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D raster, got {arr.shape}")
    from .native import trace_loops_native

    native = trace_loops_native(arr)
    if native is not None:
        ox, oy = origin
        return [np.stack([ox + xy[:, 0].astype(np.float64) * pixel_size,
                          oy + xy[:, 1].astype(np.float64) * pixel_size],
                         axis=1) for xy in native]
    h, w = arr.shape
    pad = np.zeros((h + 2, w + 2), bool)
    pad[1:-1, 1:-1] = arr
    filled = pad[1:-1, 1:-1]

    # Directed boundary edges, interior on the LEFT (CCW outer loops):
    #   bottom (empty below):  (j, i)     -> (j+1, i)
    #   right  (empty right):  (j+1, i)   -> (j+1, i+1)
    #   top    (empty above):  (j+1, i+1) -> (j, i+1)
    #   left   (empty left):   (j, i+1)   -> (j, i)
    ii, jj = np.nonzero(filled)
    below = ~pad[:-2, 1:-1][filled]
    above = ~pad[2:, 1:-1][filled]
    left = ~pad[1:-1, :-2][filled]
    right = ~pad[1:-1, 2:][filled]
    # (x0, y0, x1, y1) per boundary edge, fully vectorized
    segs = []
    for mask_dir, (ax0, ay0, ax1, ay1) in (
        (below, (0, 0, 1, 0)),
        (right, (1, 0, 1, 1)),
        (above, (1, 1, 0, 1)),
        (left, (0, 1, 0, 0)),
    ):
        i, j = ii[mask_dir], jj[mask_dir]
        segs.append(np.stack([j + ax0, i + ay0, j + ax1, i + ay1], axis=1))
    edges = np.concatenate(segs) if segs else np.zeros((0, 4), np.int64)
    if edges.shape[0] == 0:
        return []

    # start-point -> outgoing edges (at most 2: the checkerboard corner)
    out_edges: dict = {}
    for x0, y0, x1, y1 in map(tuple, edges.tolist()):
        out_edges.setdefault((x0, y0), []).append((x1, y1))

    def pick_next(prev_dx, prev_dy, options):
        if len(options) == 1:
            return options[0]
        # checkerboard vertex: prefer the sharpest LEFT turn so the loop
        # hugs its own component instead of crossing to the diagonal one
        def turn(o):
            dx, dy = o[0] - cur[0], o[1] - cur[1]
            return prev_dx * dy - prev_dy * dx  # z of cross product
        return max(options, key=turn)

    loops = []
    while out_edges:
        # never START at a checkerboard (degree-2) vertex: with no incoming
        # direction the left-turn rule is ambiguous there and can stitch a
        # figure-eight across components; a degree-1 vertex always exists
        start = next((v for v, o in out_edges.items() if len(o) == 1),
                     next(iter(out_edges)))
        cur = start
        prev_d = (0, 0)
        loop = [start]
        while True:
            options = out_edges[cur]
            nxt = pick_next(prev_d[0], prev_d[1], options)
            options.remove(nxt)
            if not options:
                del out_edges[cur]
            prev_d = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            loop.append(cur)
        pts = np.asarray(loop, np.float64)
        # collapse collinear runs (all edges are axis-aligned unit steps)
        d = np.diff(np.vstack([pts, pts[:1]]), axis=0)
        keep = np.any(np.diff(np.vstack([d[-1:], d]), axis=0) != 0, axis=1)
        pts = pts[keep]
        ox, oy = origin
        loops.append(np.stack([ox + pts[:, 0] * pixel_size,
                               oy + pts[:, 1] * pixel_size], axis=1))
    return loops


def rasterize_loops(loops, *, pixel_size: float, n: int,
                    origin=(0.0, 0.0)) -> np.ndarray:
    """XOR-reconstruct a binary raster from traced loops: each loop's
    even-odd fill toggles membership, so hole loops carve their interior
    back out (the GDS XOR convention). The exact inverse of
    :func:`trace_contours` under center sampling — see the round-trip
    tests. (:func:`.native.rasterize` OR-combines polygons, which is right
    for layout input but loses holes.)"""
    from .native import rasterize

    grid = np.zeros((n, n), bool)
    for loop in loops:
        fill = rasterize([loop], origin=origin, pixel_size=pixel_size,
                         n=n) > 0.5
        grid ^= fill
    return grid.astype(np.float32)


def contours_to_gds(path, profile, config: OpticsConfig | float, *,
                    threshold: float = 0.5, layer: int = 1,
                    cell: str = "CONTOUR", origin=(0.0, 0.0)):
    """Trace ``profile > threshold`` and write the loops as one GDS cell
    (coordinates in nm; outer loops and holes as separate BOUNDARYs — XOR
    semantics downstream). ``config`` supplies the pixel size (or pass it
    directly). Returns the written path."""
    from .gdsii import write_gds

    px = (config.pixel_size if isinstance(config, OpticsConfig)
          else float(config))
    loops = trace_contours(profile, threshold=threshold, pixel_size=px,
                           origin=origin)
    return write_gds(path, {cell: [(layer, xy) for xy in loops]},
                     unit_nm=1.0)
