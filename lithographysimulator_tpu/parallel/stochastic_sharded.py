"""Trial-sharded stochastic ensembles: Monte-Carlo exposures over the mesh.

Stochastic printing statistics are embarrassingly parallel over TRIALS —
the fourth collective pattern of this framework (after source-point psum,
tile all-gather, and kernel-rank psum): each chip runs its own slice of
the PRNG key stream through the photon/acid chain
(:mod:`..models.stochastic`) against the replicated aerial image, and the
print-probability accumulator meets in one (n, n) float32 psum over ICI.
A 1024-trial tail-defect study on 8 chips costs the wall-clock of 128.

Key discipline: ONE global `jax.random.split` produces the full key array,
sharded over the mesh — so the sharded band is BIT-identical (up to f32
sum order) to the single-device :func:`..models.stochastic.exposure_trials`
mean over the same seed, which the 8-virtual-device CPU test pins.

(Reference: no distributed code and no stochastics — SURVEY §2.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OpticsConfig
from ..models.stochastic import StochasticResist
from .mesh import SOURCE_AXIS


def print_probability_sharded(
    image,
    config: OpticsConfig,
    model: StochasticResist,
    mesh: Mesh,
    *,
    trials_per_device: int,
    seed: int = 0,
) -> jnp.ndarray:
    """(n, n) print-probability band from ``devices x trials_per_device``
    stochastic exposures, trials sharded over ``mesh``'s 'source' axis.
    Jit-compatible; the image is replicated, keys are sharded."""
    n_dev = mesh.shape[SOURCE_AXIS]
    total = n_dev * trials_per_device
    keys = jax.random.split(jax.random.PRNGKey(seed), total)

    # check_vma=False: jax.random.poisson's internal rejection while_loop
    # mixes replicated init constants with device-varying carries (its
    # keys are sharded), which the varying-axes checker rejects; the
    # computation is correct with checking off (each device samples its
    # own key slice, one psum at the end).
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(SOURCE_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    def run(img, keys_shard):
        def one(carry, k):
            return carry + model.contour(k, img, config), None

        zero = jnp.zeros(img.shape, jnp.float32)
        local, _ = jax.lax.scan(one, zero, keys_shard)
        return jax.lax.psum(local, SOURCE_AXIS)

    band = run(jnp.asarray(image), keys)
    return band / total


def print_probability_volume_sharded(
    image_stack,
    config: OpticsConfig,
    model: StochasticResist,
    mesh: Mesh,
    *,
    dz_nm: float,
    trials_per_device: int,
    seed: int = 0,
) -> jnp.ndarray:
    """(nz, n, n) volumetric print-probability band from trial-sharded
    stochastic exposures of the rigorous in-film stack
    (:meth:`..models.stochastic.StochasticResist.deprotection_volume`) —
    the same one-psum collective pattern as
    :func:`print_probability_sharded`, with the per-voxel probability
    volume meeting over ICI. Bit-parity with the single-device
    :func:`..models.stochastic.stochastic_volume_ensemble` band over the
    same seed is pinned on the 8-virtual-device CPU mesh."""
    n_dev = mesh.shape[SOURCE_AXIS]
    total = n_dev * trials_per_device
    keys = jax.random.split(jax.random.PRNGKey(seed), total)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(SOURCE_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    def run(stack, keys_shard):
        def one(carry, k):
            depro = model.deprotection_volume(k, stack, config, dz_nm=dz_nm)
            return carry + (depro > model.threshold).astype(jnp.float32), None

        zero = jnp.zeros(stack.shape, jnp.float32)
        local, _ = jax.lax.scan(one, zero, keys_shard)
        return jax.lax.psum(local, SOURCE_AXIS)

    band = run(jnp.asarray(image_stack), keys)
    return band / total
