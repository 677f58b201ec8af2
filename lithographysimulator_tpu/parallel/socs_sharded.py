"""Rank-sharded SOCS imaging: eigenkernels distributed over the chip mesh.

The SOCS sum I = sum_j lambda_j |F(phi_j M)|^2 is embarrassingly parallel
over the kernel index j — the third collective pattern of this framework
(after source-point psum in :mod:`.abbe_sharded` and tile all-gather in
:mod:`.tiled_sharded`): each chip transforms its SHARD of the kernel stack
against the replicated mask spectrum and the partial intensities meet in one
(n, n) float32 psum over ICI. Useful when one kernel set serves many masks
of the same optics and rank is large (vector/hyper-NA kernel sets run to
rank 512+, see ops/hopkins.randomized_socs_vector): build once, image with
rank/n_chips kernels per chip.

(Reference: no distributed code exists there at all — SURVEY §2; this
parallel axis is a property of the Hopkins decomposition, not of the
reference's serial loop.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OpticsConfig
from ..ops.hopkins import SOCSKernels, socs_image
from .mesh import SOURCE_AXIS


def pad_socs_rank(socs: SOCSKernels, multiple: int) -> SOCSKernels:
    """Zero-pad the kernel stack so rank divides ``multiple`` (zero kernels
    with zero eigenvalues contribute exactly nothing to the image)."""
    pad = (-socs.rank) % multiple
    if pad == 0:
        return socs
    n = socs.kernels.shape[-1]
    return SOCSKernels(
        kernels=jnp.concatenate(
            [socs.kernels, jnp.zeros((pad, n, n), socs.kernels.dtype)]),
        eigenvalues=jnp.concatenate(
            [socs.eigenvalues, jnp.zeros((pad,), socs.eigenvalues.dtype)]),
        total_rank=socs.total_rank,
    )


def socs_image_sharded(
    spectrum: jnp.ndarray,
    socs: SOCSKernels,
    config: OpticsConfig,
    mesh: Mesh,
    *,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
) -> jnp.ndarray:
    """(n, n) aerial image with the kernel stack sharded over ``mesh``'s
    'source' axis. The spectrum is replicated; each device images its
    kernels with the standard :func:`..ops.hopkins.socs_image` (whose
    Gau'23 post-processing is linear, so per-shard post + psum equals post
    of the total) and partial intensities psum over ICI.

    Kernels are zero-padded so rank divides ``devices * chunk``
    (:func:`pad_socs_rank`). Jit-compatible."""
    n_dev = mesh.shape[SOURCE_AXIS]
    socs = pad_socs_rank(socs, n_dev * chunk)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(SOURCE_AXIS)),
        out_specs=P(),
        # vma checking is off: the int8 engine's Pallas kernels run in
        # interpret mode off-TPU, and the HLO interpreter's internal
        # while_loop mixes varying/unvarying dynamic_slice operands — a
        # jax-internal limitation its own error message says to work
        # around this way. The psum contract is unchanged (pinned by
        # tests/test_sharding.py::test_socs_image_sharded_matches_local).
        check_vma=False,
    )
    def run(spec, socs_shard):
        local = socs_image(spec, socs_shard, config,
                           solver=solver, chunk=chunk, engine=engine)
        return jax.lax.psum(local, SOURCE_AXIS)

    return run(spectrum, socs)
