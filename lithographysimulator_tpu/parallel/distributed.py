"""Multi-host (pod) initialization helper.

Single-host multi-chip needs nothing: `jax.devices()` sees every local chip
and the meshes in :mod:`.mesh` just work. Across hosts (v5e pods over DCN),
call :func:`initialize` once per process before any jax use; afterwards
`jax.devices()` is global and the same mesh helpers span the pod. The
sharded imaging paths only psum (n, n) images and gather tile cores, so
cross-host traffic stays trivial; keep 'source'/'focus' axes within a host
where possible so collectives ride ICI (mesh axis order already does this
when built from jax.devices(), which enumerates local-first).

Untestable in this repo's single-chip container; parameters mirror
jax.distributed.initialize and are forwarded verbatim.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs) -> dict:
    """Initialize jax.distributed (no-op if already initialized) and report
    the resulting global device topology."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as err:
        if "already initialized" not in str(err).lower():
            raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
