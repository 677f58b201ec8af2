"""ICI-sharded rigorous image-in-resist: the film stack over a chip mesh.

The exact in-film exposure (:func:`..simulate.film_stack_images`) is an
Abbe partial-coherence sum per resist slab and field component — the same
source-point data parallelism as :mod:`.abbe_sharded` applies unchanged:
shard the padded source-point list over the mesh's 'source' axis, let each
chip scan its shard through every (slab, component) of the film-modified
pupil stack, and meet in ONE (nz, n, n) float32 psum over ICI.

The per-slab component-pupil multipliers ride as re/im float32 jit
arguments (complex host->device transfers fail on the TPU tunnel — see
``..xfer``), exactly like the single-chip compiled film pipeline.

(Sharded analog of the reference's serial partial-coherence loop,
/root/reference/imageformation.py:47-77; the reference has neither resist/
film physics — README.md:19 roadmap — nor any distributed code.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OpticsConfig
from ..models.pupil import pupil_function
from ..ops.abbe import _postprocess_gau23, accumulate_intensity
from .mesh import SOURCE_AXIS


def film_images_sharded(
    geometry: jnp.ndarray,
    aberrations: jnp.ndarray,
    shifts: jnp.ndarray,
    weights: jnp.ndarray,
    mult_re: jnp.ndarray,
    mult_im: jnp.ndarray,
    config: OpticsConfig,
    mesh: Mesh,
    *,
    solver: str = "gau23",
    chunk: int = 4,
    normalize: bool = True,
    max_abs_shift: int | None = None,
    engine: str = "auto",
    mask3d=None,
) -> jnp.ndarray:
    """(nz, n, n) in-film exposure with source points sharded over
    ``mesh``'s 'source' axis. ``mult_re``/``mult_im`` are the (nz, C, n, n)
    re/im planes of :func:`..ops.filmstack.film_component_multipliers`;
    ``shifts``/``weights`` length must divide ``mesh.shape['source'] *
    chunk`` (see :func:`.abbe_sharded.padded_source_arrays`).

    Jit-compatible: the component scan runs inside ``shard_map`` with a
    vma seed derived from the sharded weights (scan carries under
    shard_map must share the inputs' varying-ness)."""
    from ..ops.fraunhofer import mask_spectrum

    n_dev = mesh.shape[SOURCE_AXIS]
    p = shifts.shape[0]
    if p % (n_dev * chunk):
        raise ValueError(
            f"point count {p} must divide devices*chunk = {n_dev * chunk}")

    if mask3d is not None:
        geometry = mask3d.apply(geometry, config)
    spectrum = mask_spectrum(geometry, config, solver=solver)
    pupil = pupil_function(aberrations, config, dtype=spectrum.dtype)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(SOURCE_AXIS), P(SOURCE_AXIS), P(), P()),
        out_specs=P(),
    )
    def run(spec, pup, s, w, m_re, m_im):
        mult = jax.lax.complex(m_re, m_im)  # (nz, C, n, n)
        vma_seed = (w[0] * 0).astype(jnp.float32)

        def slab(mult_z):
            def comp(total, mult_c):
                local = accumulate_intensity(
                    pup * mult_c, spec, s, w, config, solver=solver,
                    chunk=chunk, max_abs_shift=max_abs_shift, engine=engine)
                return total + local, None

            zero = jnp.zeros(spec.shape, jnp.float32) + vma_seed
            total, _ = jax.lax.scan(comp, zero, mult_z)
            return total

        stack = jax.lax.map(slab, mult)
        return jax.lax.psum(stack, SOURCE_AXIS)

    stack = run(spectrum, pupil, shifts, weights, mult_re, mult_im)
    if solver == "gau23":
        stack = jax.vmap(lambda im: _postprocess_gau23(im, config))(stack)
    if normalize:
        total = jnp.sum(weights)
        stack = jnp.where(total > 0, stack / jnp.maximum(total, 1e-30), 0.0)
    return stack


@functools.lru_cache(maxsize=8)
def _compiled_film_sharded(config, mesh, solver, chunk, normalize,
                           max_abs_shift, engine, mask3d):
    """Cached jit wrapper (a fresh closure per call would retrace and
    recompile every invocation — minutes each through the tunnel)."""

    @jax.jit
    def run(geom, aberr, s, w, m_re, m_im):
        return film_images_sharded(
            geom, aberr, s, w, m_re, m_im, config, mesh, solver=solver,
            chunk=chunk, normalize=normalize, max_abs_shift=max_abs_shift,
            engine=engine, mask3d=mask3d)

    return run


def film_stack_sharded(
    mask,
    source_map,
    aberrations=None,
    *,
    config: OpticsConfig | None = None,
    wafer_stack,
    mesh: Mesh,
    depths_nm=None,
    resist=None,
    polarization=None,
    apodize: bool = True,
    solver: str = "gau23",
    chunk: int = 4,
    normalize: bool = True,
    engine: str = "auto",
    mask3d=None,
    block: bool = True,
) -> jnp.ndarray:
    """Drop-in sharded :func:`..simulate.film_stack_images`: same arguments
    plus ``mesh``, same (nz, n, n) result — source points spread across the
    mesh, one psum per call. Host-side prep (Airy solve, source-point
    padding) mirrors the single-chip path so the two agree to float32
    accumulation order."""
    from ..ops.filmstack import film_component_multipliers

    if config is None:
        config = mask.config
    if depths_nm is None:
        if resist is None:
            raise ValueError("pass depths_nm or a DepthResist via resist=")
        depths_nm = resist.depths_nm
    depths = tuple(float(z) for z in np.atleast_1d(depths_nm))
    if aberrations is None:
        aberrations = np.zeros((1,), np.float32)
    if isinstance(polarization, (list, np.ndarray)):
        polarization = tuple(complex(v) for v in polarization)

    from .abbe_sharded import padded_source_arrays

    n_dev = mesh.shape[SOURCE_AXIS]
    shifts, weights, _ = padded_source_arrays(
        np.asarray(source_map), n_dev * chunk)
    max_abs_shift = int(np.abs(np.asarray(shifts)).max()) if shifts.size else 0

    mult = film_component_multipliers(
        config, wafer_stack, depths, polarization=polarization,
        apodize=apodize)
    geometry = mask.geometry if hasattr(mask, "geometry") else jnp.asarray(mask)

    run = _compiled_film_sharded(config, mesh, solver, chunk, normalize,
                                 max_abs_shift, engine, mask3d)
    stack = run(geometry, jnp.asarray(aberrations, jnp.float32),
                shifts, weights,
                jnp.asarray(mult.real, jnp.float32),
                jnp.asarray(mult.imag, jnp.float32))
    if block:
        stack = jax.block_until_ready(stack)
    return stack
