"""Double patterning (LELE): layout decomposition + composite printing.

Below the single-exposure resolution limit (half-pitch ~ k1 * lambda / NA),
fabs split one layer across two masks exposed and etched separately
(litho-etch-litho-etch): features closer than the minimum same-mask pitch
land on different masks, each mask sees a relaxed pitch, and the final
pattern is the union of the two transfers.

Decomposition is the classic conflict-graph 2-coloring: features are
connected components of the layout (:func:`.mrc.label_components`), an edge
joins any two features whose edge-to-edge (Chebyshev) distance is below
``min_pitch_nm`` — the minimum SAME-MASK spacing (detected by
bounding-box-local dilation — O(total area * k), no pairwise distance
matrix), and BFS 2-colors each connected conflict subgraph. Odd cycles
(three mutual neighbors etc.) are inherent LELE conflicts — reported, not
silently dropped; they need LELELE/SADP or a layout fix.

Printing: each mask images independently through any solver path (the
composite helper uses the tiled SOCS imager, so polarization / chromatic /
full-chip options apply) and the binary resists OR together — the etch
union. No reference counterpart (single-mask reference).
"""

from __future__ import annotations

import numpy as np

from ..config import OpticsConfig
from .mrc import _dilate, label_components


def decompose_lele(mask, config_or_pixel, *, min_pitch_nm: float) -> dict:
    """Split a layout into two LELE masks.

    Returns ``{"mask_a", "mask_b", "colors", "features", "conflict_edges",
    "violations"}`` — ``violations`` counts features whose conflict
    subgraph is not 2-colorable (odd cycle); they are still assigned the
    less-bad color so downstream imaging runs, but a nonzero count means
    this layout is not LELE-decomposable at this pitch."""
    px = (config_or_pixel.pixel_size
          if isinstance(config_or_pixel, OpticsConfig)
          else float(config_or_pixel))
    arr = (np.abs(np.asarray(mask)) > 0.5).astype(np.int8)
    labels, count = label_components(arr)
    if count == 0:
        z = np.zeros_like(arr, np.float32)
        return {"mask_a": z, "mask_b": z.copy(), "colors": {},
                "features": 0, "conflict_edges": 0, "violations": 0}
    # conflict edge <=> edge-to-edge (Chebyshev) distance below
    # ceil(min_pitch/px): dilate each component inside its padded bounding
    # box and read the other labels underneath. Bounding boxes come from
    # ONE pass over the nonzero pixels (minimum.at / maximum.at), not a
    # labels == lab scan per component.
    k = max(1, int(np.ceil(min_pitch_nm / px)))
    ys_all, xs_all = np.nonzero(labels)
    labs_all = labels[ys_all, xs_all]
    ymin = np.full(count + 1, arr.shape[0])
    ymax = np.zeros(count + 1, np.int64)
    xmin = np.full(count + 1, arr.shape[1])
    xmax = np.zeros(count + 1, np.int64)
    np.minimum.at(ymin, labs_all, ys_all)
    np.maximum.at(ymax, labs_all, ys_all)
    np.minimum.at(xmin, labs_all, xs_all)
    np.maximum.at(xmax, labs_all, xs_all)
    adj: dict[int, set[int]] = {i: set() for i in range(1, count + 1)}
    for lab in range(1, count + 1):
        pad = k + 1
        y0 = max(0, int(ymin[lab]) - pad)
        y1 = min(arr.shape[0], int(ymax[lab]) + pad + 1)
        x0 = max(0, int(xmin[lab]) - pad)
        x1 = min(arr.shape[1], int(xmax[lab]) + pad + 1)
        window = labels[y0:y1, x0:x1]
        grown = _dilate((window == lab).astype(np.int8), 2 * k + 1)
        near = np.unique(window[(grown == 1) & (window != 0)
                                & (window != lab)])
        for other in near:
            adj[lab].add(int(other))
            adj[int(other)].add(lab)
    edges = sum(len(v) for v in adj.values()) // 2

    colors: dict[int, int] = {}
    violations = 0
    for start in range(1, count + 1):
        if start in colors:
            continue
        colors[start] = 0
        queue = [start]
        while queue:
            node = queue.pop()
            for nb in adj[node]:
                if nb not in colors:
                    colors[nb] = 1 - colors[node]
                    queue.append(nb)
                elif colors[nb] == colors[node]:
                    violations += 1  # odd cycle: not 2-colorable
    mask_a = np.where(np.isin(labels, [l for l, c in colors.items()
                                       if c == 0]), arr, 0)
    mask_b = np.where(np.isin(labels, [l for l, c in colors.items()
                                       if c == 1]), arr, 0)
    return {"mask_a": mask_a.astype(np.float32),
            "mask_b": mask_b.astype(np.float32),
            "colors": colors, "features": count,
            "conflict_edges": edges, "violations": violations}


def lele_print(mask_big, tile_config: OpticsConfig, source_map, *,
               min_pitch_nm: float, resist=None, rank: int = 64,
               halo: int | None = None, polarization=None, chromatic=None,
               progress_cb=None) -> dict:
    """Decompose + image + develop + union: the full LELE flow on the tiled
    path. Returns the decomposition report plus ``profile`` (the union
    print, {0,1}), the per-mask profiles, and the single-exposure profile
    for comparison."""
    from ..metrology import tiled_focus_images
    from .resist import ResistModel

    resist = resist or ResistModel()
    parts = decompose_lele(mask_big, tile_config, min_pitch_nm=min_pitch_nm)

    def print_one(m, lo, hi):
        img = tiled_focus_images(
            m, tile_config, source_map, [0.0], rank=rank, halo=halo,
            polarization=polarization, chromatic=chromatic,
            progress_cb=(None if progress_cb is None else
                         lambda f: progress_cb(lo + (hi - lo) * f)))[0]
        return np.asarray(resist.develop_binary(img, tile_config))

    profile_a = print_one(parts["mask_a"], 0.0, 0.33)
    profile_b = print_one(parts["mask_b"], 0.33, 0.66)
    single = print_one(np.asarray(mask_big, np.float32), 0.66, 1.0)
    parts.update({
        "profile": np.maximum(profile_a, profile_b),
        "profile_a": profile_a,
        "profile_b": profile_b,
        "profile_single": single,
    })
    return parts
