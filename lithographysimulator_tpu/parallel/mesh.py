"""Device-mesh construction helpers.

The physics has two natural parallelism axes (SURVEY §5.8): the illumination
source grid (each chip images its shard of source points and the incoherent
intensity accumulation is one psum over ICI) and the through-focus /
batch axis (independent defocus settings). Meshes here are plain
``jax.sharding.Mesh`` objects over whatever devices are visible — real TPU
chips in production, virtual CPU host devices in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SOURCE_AXIS = "source"
FOCUS_AXIS = "focus"


def source_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the source-point axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SOURCE_AXIS,))


def focus_source_mesh(focus: int, source: int | None = None) -> Mesh:
    """2-D (focus, source) mesh: defocus settings across the first axis,
    source-point shards across the second."""
    devices = jax.devices()
    if source is None:
        source = len(devices) // focus
    n = focus * source
    if n > len(devices):
        raise ValueError(
            f"mesh {focus}x{source} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(focus, source)
    return Mesh(grid, (FOCUS_AXIS, SOURCE_AXIS))
