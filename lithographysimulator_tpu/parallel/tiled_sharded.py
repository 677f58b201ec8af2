"""Tile-parallel full-chip imaging: tiles sharded across the chip mesh.

Tiles are optically independent (halo-isolated), so full-chip imaging is
embarrassingly parallel: shard the tile-coordinate list over the mesh's
'source' axis, run the per-tile SOCS pipeline locally on each chip, and
gather the stitched cores. Communication is one all-gather of the output
cores over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OpticsConfig
from ..ops.fraunhofer import mask_spectrum
from ..ops.hopkins import SOCSKernels, socs_image
from ..ops.tiled import default_halo, tile_layout
from .mesh import SOURCE_AXIS


def tiled_socs_image_sharded(
    mask_big: jnp.ndarray,
    socs: SOCSKernels,
    tile_config: OpticsConfig,
    mesh: Mesh,
    *,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    mask3d=None,
) -> jnp.ndarray:
    """(M, M) aerial image with tiles distributed over ``mesh``'s 'source'
    axis. The padded mask and SOCS kernels are replicated; each device images
    its shard of tiles with ``lax.map`` and the cores are all-gathered.
    ``mask3d`` (BoundaryLayer / EdgeKernelM3D) applies per window, exactly
    as on the single-chip tiled path (the stencil is local; wraparound
    lands in the cropped halo)."""
    big_n = mask_big.shape[-1]
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    pad_lo = halo
    pad_hi = tiles * step + halo - big_n + (n - step)
    padded = jnp.pad(mask_big, ((pad_lo, pad_hi), (pad_lo, pad_hi)))

    n_dev = mesh.shape[SOURCE_AXIS]
    coords = np.stack(np.meshgrid(np.arange(tiles), np.arange(tiles),
                                  indexing="ij"), -1).reshape(-1, 2)
    total = len(coords)
    pad_tiles = (-total) % n_dev
    if pad_tiles:
        # Dummy tiles re-image the (0, 0) window and are dropped after gather.
        coords = np.concatenate([coords, np.zeros((pad_tiles, 2), coords.dtype)])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(SOURCE_AXIS)),
        out_specs=P(SOURCE_AXIS),
    )
    def run(padded, socs, coord_shard):
        def one(c):
            window = jax.lax.dynamic_slice(
                padded, (c[0] * step, c[1] * step), (n, n))
            if mask3d is not None:
                window = mask3d.apply(window, tile_config)
            spectrum = mask_spectrum(window, tile_config)
            img = socs_image(spectrum, socs, tile_config,
                             solver=solver, chunk=chunk, engine=engine)
            return img[halo : halo + step, halo : halo + step]

        return jax.lax.map(one, coord_shard)

    cores = run(padded, socs, jnp.asarray(coords))[:total]
    grid = cores.reshape(tiles, tiles, step, step)
    stitched = jnp.concatenate(
        [jnp.concatenate(list(row), axis=1) for row in grid], axis=0)
    return stitched[:big_n, :big_n]
