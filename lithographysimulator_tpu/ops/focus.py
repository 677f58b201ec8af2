"""Through-focus (focal stack) imaging: vmap over defocus settings.

The reference computes one image per run with a single scalar defocus folded
into the aberration vector (``pupil.py:91-92``); a focus-exposure matrix
requires rerunning the whole pipeline. Here the defocus axis is a ``vmap``
over the Zernike coefficient vector — the mask spectrum is computed once and
the batched pupil/imaging work compiles into one XLA program (and shards over
a mesh 'focus' axis in :mod:`..parallel.abbe_sharded`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import OpticsConfig
from ..models.pupil import pupil_function
from .abbe import Solver, abbe_image_points
from .zernike import DEFOCUS_OSA_INDEX


def focus_stack_aberrations(base_aberrations, defocus_nm_values) -> jnp.ndarray:
    """(F, A) coefficient stack: ``base_aberrations`` with entry 4 (defocus,
    nm) replaced by each value of ``defocus_nm_values``."""
    base = jnp.asarray(base_aberrations, jnp.float32)
    if base.shape[0] < DEFOCUS_OSA_INDEX + 1:
        base = jnp.pad(base, (0, DEFOCUS_OSA_INDEX + 1 - base.shape[0]))
    defocus = jnp.asarray(defocus_nm_values, jnp.float32)
    stack = jnp.broadcast_to(base, (defocus.shape[0], base.shape[0]))
    return stack.at[:, DEFOCUS_OSA_INDEX].set(defocus)


def chromatic_aberrations(base_aberrations, spectrum) -> tuple:
    """((C, A) aberration stack, (C,) weights) for a finite laser bandwidth.

    Each spectral sample of a :class:`..config.LaserSpectrum` lands at its
    chromatic defocus offset ADDED to the base entry-4 defocus (both in nm —
    the nm->waves map is linear, so offsets compose additively); the
    polychromatic image is the ``weights``-weighted incoherent sum of the
    per-plane images. Traceable in ``base_aberrations``; the offsets are
    host-side constants (the spectrum is static config)."""
    base = jnp.asarray(base_aberrations, jnp.float32)
    if base.shape[0] < DEFOCUS_OSA_INDEX + 1:
        base = jnp.pad(base, (0, DEFOCUS_OSA_INDEX + 1 - base.shape[0]))
    offsets = jnp.asarray(spectrum.defocus_offsets_nm(), jnp.float32)
    stack = jnp.broadcast_to(base, (offsets.shape[0], base.shape[0]))
    stack = stack.at[:, DEFOCUS_OSA_INDEX].add(offsets)
    return stack, jnp.asarray(spectrum.weights(), jnp.float32)


def through_focus_images(
    spectrum: jnp.ndarray,
    aberrations_stack: jnp.ndarray,
    shifts: jnp.ndarray,
    weights: jnp.ndarray,
    config: OpticsConfig,
    *,
    solver: Solver = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    max_abs_shift: int | None = None,
) -> jnp.ndarray:
    """(F, n, n) focal stack for an (F, A) aberration-coefficient stack over
    one shared mask spectrum and source-point list."""

    def one(aberr):
        pupil = pupil_function(aberr, config, dtype=spectrum.dtype)
        return abbe_image_points(
            spectrum, pupil, shifts, weights, config,
            solver=solver, chunk=chunk, normalize=normalize,
            max_abs_shift=max_abs_shift,
        )

    return jax.vmap(one)(jnp.asarray(aberrations_stack))


@functools.lru_cache(maxsize=8)
def compiled_focus_stack(config: OpticsConfig, chunk: int = 4,
                         normalize: bool = False, solver: Solver = "gau23",
                         max_abs_shift: int | None = None, mask3d=None):
    """Cached jitted (geometry, aberration-stack, shifts, weights) -> (F, n,
    n) focal-stack pipeline, spectrum included. CLI/host callers MUST go
    through this on the TPU tunnel: eager complex math (mask_spectrum's
    fft2, the pupil phases) dies with UNIMPLEMENTED outside jit there
    (CLAUDE.md)."""
    from .fraunhofer import mask_spectrum

    @jax.jit
    def run(geometry, aberrations_stack, shifts, weights):
        if mask3d is not None:
            geometry = mask3d.apply(geometry, config)
        spectrum = mask_spectrum(geometry, config)
        return through_focus_images(
            spectrum, aberrations_stack, shifts, weights, config,
            solver=solver, chunk=chunk, normalize=normalize,
            max_abs_shift=max_abs_shift)

    return run


def through_focus_socs(
    spectrum: jnp.ndarray,
    base_aberrations,
    defocus_nm_values,
    source_map,
    config: OpticsConfig,
    *,
    rank: int = 96,
    chunk: int = 4,
    engine: str = "auto",
) -> jnp.ndarray:
    """(F, n, n) focal stack on the Hopkins fast path: one SOCS build per
    defocus plane (the TCC depends on the pupil), mapped with ``lax.map`` so
    only one plane's kernel set is live at a time."""
    from .hopkins import randomized_socs, socs_image

    stack_ab = focus_stack_aberrations(base_aberrations, defocus_nm_values)
    source_map = jnp.asarray(source_map)

    def one(aberr):
        pupil = pupil_function(aberr, config, dtype=spectrum.dtype)
        socs = randomized_socs(pupil, source_map, config, rank=rank)
        return socs_image(spectrum, socs, config, chunk=chunk, engine=engine)

    return jax.lax.map(one, jnp.asarray(stack_ab))
