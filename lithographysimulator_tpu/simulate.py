"""High-level one-call simulation pipeline.

The TPU-native equivalent of the reference's end-to-end demo driver
(``imageformation.py:79-122``): build mask spectrum + pupil + source from
config, run the Abbe engine, return the aerial image and a structured run
report. Everything under the hood is jit-compiled; repeated calls with the
same static (config, solver, point-count) signature reuse the compiled
executable.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from .config import OpticsConfig
from .models.mask import Mask
from .models.pupil import pupil_function
from .ops.abbe import abbe_image_points, source_points
from .ops.fraunhofer import mask_spectrum
from .ops.hopkins import SOCSKernels, randomized_socs, socs_image


@dataclasses.dataclass(frozen=True)
class SimulationResult:
    image: jnp.ndarray
    spectrum: jnp.ndarray
    pupil: jnp.ndarray
    source_map: np.ndarray
    report: dict


def _exact_image(spectrum, aberrations, shifts, weights, config, *,
                 solver, chunk, normalize, max_abs_shift,
                 polarization=None, apodize=True, chromatic=None):
    """One exact-Abbe aerial image (scalar or vector), optionally the
    polychromatic spectrum-weighted sum over the chromatic focus planes of a
    :class:`..config.LaserSpectrum` (``lax.map`` keeps one plane's imaging
    state live at a time). Traceable; shared by the single and batch
    pipelines."""

    def one(ab):
        pupil = pupil_function(ab, config)
        if polarization is None:
            return abbe_image_points(
                spectrum, pupil, shifts, weights, config,
                solver=solver, chunk=chunk, normalize=normalize,
                max_abs_shift=max_abs_shift)
        from .ops.vector import vector_abbe_image

        return vector_abbe_image(
            spectrum, pupil, shifts, weights, config,
            polarization=polarization, apodize=apodize,
            solver=solver, chunk=chunk, normalize=normalize,
            max_abs_shift=max_abs_shift)

    if chromatic is None:
        return one(aberrations)
    from .ops.focus import chromatic_aberrations

    stack_ab, q_f = chromatic_aberrations(aberrations, chromatic)
    planes = jax.lax.map(one, stack_ab)  # (F, n, n)
    return jnp.tensordot(q_f, planes, axes=1)


@functools.lru_cache(maxsize=32)
def _compiled_pipeline(config: OpticsConfig, solver: str, chunk: int,
                       normalize: bool, max_abs_shift: int | None,
                       polarization=None, apodize: bool = True, mask3d=None,
                       chromatic=None):
    @functools.partial(jax.jit)
    def run(geometry, aberrations, shifts, weights):
        if mask3d is not None:
            geometry = mask3d.apply(geometry, config)
        spectrum = mask_spectrum(geometry, config, solver=solver)
        pupil = pupil_function(aberrations, config)
        image = _exact_image(
            spectrum, aberrations, shifts, weights, config,
            solver=solver, chunk=chunk, normalize=normalize,
            max_abs_shift=max_abs_shift, polarization=polarization,
            apodize=apodize, chromatic=chromatic)
        return image, spectrum, pupil

    return run


@functools.lru_cache(maxsize=8)
def _compiled_socs_apply(config: OpticsConfig, chunk: int, normalize: bool,
                         mask3d=None):
    """Imaging-only SOCS pipeline: kernels are a jit *argument* (pytree), so
    one compiled executable serves every kernel set of the same rank/grid —
    used by the auto-rank path, whose rank is chosen at runtime."""

    @functools.partial(jax.jit)
    def run(geometry, socs, source_total):
        if mask3d is not None:
            geometry = mask3d.apply(geometry, config)
        spectrum = mask_spectrum(geometry, config, solver="gau23")
        image = socs_image(spectrum, socs, config, chunk=chunk)
        if normalize:
            image = jnp.where(source_total > 0,
                              image / jnp.maximum(source_total, 1e-30), 0.0)
        return image, spectrum

    return run


@functools.lru_cache(maxsize=32)
def _channel_rotation_cached(config: OpticsConfig, polarization=None,
                             apodize: bool = True, chromatic=None):
    """Principal-channel rotation for the (config, polarization, spectrum)
    summed-TCC component stack, or None when compression would not shrink
    it — computed ONCE per optics setup: the channel Gram is independent of
    the (phase-only) aberration vector (see
    :func:`..ops.hopkins.vector_component_stack` /
    :func:`..ops.hopkins.chromatic_component_stack`), so the rotation at
    zero aberrations serves every build, focus plane and field point. The
    Gram runs under jit (no eager complex math on the tunnel); the
    eigendecomposition runs on the host in float64. Narrow laser spectra
    compress 5+ focus samples to 2-3 channels (a ~2x kernel-build matvec
    saving); vector stacks compress only where channels are redundant or
    sub-tolerance (hyper-NA keeps all — accuracy is never silently
    traded)."""
    if polarization is None and chromatic is None:
        return None
    from .ops.hopkins import (channel_gram, chromatic_component_stack,
                              rotation_from_gram, vector_component_stack)

    @jax.jit
    def gram(aberrations):
        if chromatic is not None:
            comps, q = chromatic_component_stack(
                aberrations, config, spectrum=chromatic,
                polarization=polarization, apodize=apodize)
        else:
            comps, q = vector_component_stack(
                pupil_function(aberrations, config), config,
                polarization=polarization, apodize=apodize)
        return channel_gram(comps, q)

    s_pair = np.asarray(gram(jnp.zeros((5,), jnp.float32)))
    rot, _captured = rotation_from_gram(s_pair, tol=config.channel_tol)
    if rot.shape[2] >= s_pair.shape[1]:
        return None
    return rot


@functools.lru_cache(maxsize=16)
def _compiled_socs_build(config: OpticsConfig, rank: int,
                         polarization=None, apodize: bool = True,
                         chromatic=None, channel_k: int | None = None):
    """Jitted SOCS build. Everything complex-valued must run under jit on
    the TPU tunnel (complex constants/arrays cannot cross the host<->device
    boundary eagerly — see CLAUDE.md); r0 (sum|P|^2, or the vector
    component-pupil power) is returned real so the auto-rank loop can
    compute captured energy host-side as sum(eig) / (w_sum * r0).

    ``polarization`` switches to the vector kernel build
    (:func:`..ops.hopkins.randomized_socs_vector`): the returned kernel set
    then carries the full Jones-pupil physics through every downstream
    consumer (socs_image / tiled / metrology / OPC / serving) unchanged.
    ``chromatic`` (a :class:`..config.LaserSpectrum`) switches to the
    polychromatic summed-TCC build — composable with ``polarization``. Both
    leave r0 unchanged: spectral weights sum to 1 and the chromatic defocus
    phases are unit modulus on the disk, so trace(T) is bandwidth-blind."""
    from .ops.hopkins import (randomized_socs_chromatic,
                              randomized_socs_vector, vector_pupil_power)

    @functools.partial(jax.jit)
    def build(aberrations, source_map, channel_rotation=None):
        pupil = pupil_function(aberrations, config)
        if chromatic is not None:
            socs = randomized_socs_chromatic(
                aberrations, source_map, config, spectrum=chromatic,
                rank=rank, polarization=polarization, apodize=apodize,
                channel_rotation=channel_rotation)
        elif polarization is None:
            socs = randomized_socs(pupil, source_map, config, rank=rank)
        else:
            socs = randomized_socs_vector(
                pupil, source_map, config, rank=rank,
                polarization=polarization, apodize=apodize,
                channel_rotation=channel_rotation)
        if polarization is None:
            r0 = jnp.sum(jnp.abs(pupil) ** 2)
        else:
            r0 = vector_pupil_power(pupil, config, polarization=polarization,
                                    apodize=apodize)
        return socs, pupil, r0

    return build


@functools.lru_cache(maxsize=32)
def _compiled_socs_build_basis(config: OpticsConfig, rank: int,
                               polarization=None, apodize: bool = True,
                               power_iters: int = 2, warm: bool = False,
                               chromatic=None, channel_k: int | None = None):
    """Jitted SOCS build that also returns the Ritz basis for warm restarts
    (``warm=True`` additionally TAKES a basis argument). Used by the
    focus-sweep metrology loop and the auto-rank doubling loop, where
    successive builds differ by a tiny operator perturbation — the previous
    basis makes ``power_iters=0-1`` converge as well as a cold default
    build. Standard (non-lean) memory discipline only."""
    from .ops.hopkins import (randomized_socs_chromatic,
                              randomized_socs_vector, vector_pupil_power)

    def _build(aberrations, source_map, init_basis=None,
               channel_rotation=None):
        pupil = pupil_function(aberrations, config)
        kwargs = dict(rank=rank, power_iters=power_iters,
                      init_basis=init_basis, return_basis=True)
        if chromatic is not None:
            socs, basis = randomized_socs_chromatic(
                aberrations, source_map, config, spectrum=chromatic,
                polarization=polarization, apodize=apodize,
                channel_rotation=channel_rotation, **kwargs)
        elif polarization is None:
            socs, basis = randomized_socs(pupil, source_map, config,
                                          lean=False, **kwargs)
        else:
            socs, basis = randomized_socs_vector(
                pupil, source_map, config, polarization=polarization,
                apodize=apodize, channel_rotation=channel_rotation, **kwargs)
        if polarization is None:
            r0 = jnp.sum(jnp.abs(pupil) ** 2)
        else:
            r0 = vector_pupil_power(pupil, config, polarization=polarization,
                                    apodize=apodize)
        return socs, basis, pupil, r0

    if warm:
        return jax.jit(_build)
    return jax.jit(
        lambda aberrations, source_map, channel_rotation=None: _build(
            aberrations, source_map, channel_rotation=channel_rotation))


def _socs_build_with_channels(config: OpticsConfig, rank: int,
                              polarization=None, apodize: bool = True,
                              chromatic=None):
    """:func:`_compiled_socs_build` with its cached principal-channel
    rotation bound in: returns a callable
    ``(aberrations, source_map) -> (socs, pupil, r0)``. The one entry point
    the production consumers (tiled full-chip, metrology, OPC, serving)
    should use — they get channel compression for free."""
    rot = _channel_rotation_cached(config, polarization, apodize, chromatic)
    k = None if rot is None else int(rot.shape[2])
    build = _compiled_socs_build(config, rank, polarization, apodize,
                                 chromatic, k)
    if rot is None:
        return build
    return lambda aberrations, source_map: build(aberrations, source_map,
                                                 rot)


def _socs_build_basis_with_channels(config: OpticsConfig, rank: int,
                                    polarization=None, apodize: bool = True,
                                    power_iters: int = 2, warm: bool = False,
                                    chromatic=None):
    """:func:`_compiled_socs_build_basis` with the cached channel rotation
    bound in — cold form ``(aberrations, source_map)``, warm form
    ``(aberrations, source_map, init_basis)``."""
    rot = _channel_rotation_cached(config, polarization, apodize, chromatic)
    k = None if rot is None else int(rot.shape[2])
    build = _compiled_socs_build_basis(config, rank, polarization, apodize,
                                       power_iters, warm, chromatic, k)
    if rot is None:
        return build
    if warm:
        return lambda aberrations, source_map, init_basis: build(
            aberrations, source_map, init_basis, rot)
    return lambda aberrations, source_map: build(aberrations, source_map,
                                                 rot)


@functools.lru_cache(maxsize=16)
def _compiled_perturb(perturb, pixel_size: float):
    """Jitted aerial-image perturbation (stage blur / flare): a separate
    cached post-step so the main pipelines need no re-keying; the FFT blur
    is complex math and must run under jit on the TPU tunnel."""
    from .ops.perturb import apply_perturbation

    return jax.jit(lambda img: apply_perturbation(img, perturb, pixel_size))


# Host-side cache of SOCS builds keyed on the concrete optics inputs: the
# rank-doubling auto loop cannot run under jit, and a kernel build (seconds
# at scale) must never be paid twice for the same (config, source,
# aberrations, rank) — the serving batch path hits this on every request.
_SOCS_BUILD_CACHE: dict = {}
_SOCS_BUILD_CACHE_MAX = 16

_AUTO_RANK_START = 32
_AUTO_RANK_MAX = 512
_AUTO_ENERGY_TARGET = 0.999


def _socs_kernels_cached(config: OpticsConfig, src_np: np.ndarray,
                         aberrations: jnp.ndarray, rank: int | str,
                         polarization=None, apodize: bool = True,
                         chromatic=None, tolerance: float | None = None,
                         geometry=None, chunk: int = 4,
                         normalize: bool = False, mask3d=None):
    """Returns ``(socs, pupil, energy, bound)``. ``tolerance`` switches the
    auto doubling loop's stop criterion from the 99.9% energy target to the
    rigorous mask-dependent image-error bound
    (:func:`..ops.hopkins.socs_image_nrms_bound`) <= tolerance — pass the
    mask ``geometry`` (the bound needs its spectrum; the cache key then
    includes it) plus the apply-path ``chunk``/``normalize``/``mask3d`` so
    the criterion applies share the caller's compiled programs. ``bound``
    is None unless tolerance mode ran."""
    if tolerance is not None and geometry is None:
        raise ValueError("socs tolerance mode needs the mask geometry "
                         "(the image-error bound is mask-dependent)")
    if tolerance is not None and rank != "auto":
        raise ValueError("socs_tolerance composes with socs_rank='auto' "
                         "only (a pinned rank cannot honor a tolerance)")
    geo_key = (np.asarray(geometry).tobytes()
               if tolerance is not None else None)
    key = (config, src_np.tobytes(), np.asarray(aberrations).tobytes(), rank,
           polarization, apodize, chromatic, tolerance, geo_key,
           chunk if tolerance is not None else None,
           normalize if tolerance is not None else None,
           mask3d if tolerance is not None else None)
    hit = _SOCS_BUILD_CACHE.get(key)
    if hit is None:
        from .ops.hopkins import lean_auto

        src_dev = jnp.asarray(src_np)
        w_sum = float(src_np.sum())

        def energy_of(socs, r0):
            trace = w_sum * float(r0)
            return (float(np.asarray(jnp.sum(socs.eigenvalues))) / trace
                    if trace > 0 else 1.0)

        bound = None
        if tolerance is not None:
            from .ops.hopkins import socs_image_nrms_bound

            geo_dev = jnp.asarray(geometry)
            apply_run = _compiled_socs_apply(config, chunk, normalize, mask3d)

            def bound_of(socs, energy, pupil=None):
                image, spectrum = apply_run(geo_dev, socs,
                                            jnp.float32(w_sum))
                kept = float(np.asarray(jnp.sum(socs.eigenvalues)))
                trace = kept / energy if energy > 0 else 0.0
                scalar = polarization is None and chromatic is None
                return socs_image_nrms_bound(
                    socs, spectrum, image, trace=trace,
                    pupil=(pupil if scalar else None),
                    source_map=(src_dev if scalar else None),
                    total_weight=(w_sum if normalize else None))

        # Aberration-independent principal-channel rotation (None when the
        # stack does not compress): shared across every rank doubling.
        rot = _channel_rotation_cached(config, polarization, apodize,
                                       chromatic)
        channel_k = None if rot is None else int(rot.shape[2])

        if rank == "auto":
            # auto_rank_socs's doubling loop, with each build jitted: grow
            # the rank until the kept eigenvalues capture the energy target
            # (trace = sum_s w_s * r0 needs no decomposition). rank(TCC) <=
            # #live source points (x #components for vector), so never
            # double past that. Each doubling WARM-STARTS from the previous
            # rank's Ritz basis (power_iters=1) instead of discarding it —
            # basis retention is skipped only where the standard-memory
            # build would not fit HBM (the lean build has no basis).
            n_comp = 1 if polarization is None else 3
            if chromatic is not None:
                n_comp *= chromatic.samples
            if channel_k is not None:
                # compressed operator: rank(T) <= channels x live points
                n_comp = channel_k
            max_rank = max(1, min(_AUTO_RANK_MAX,
                                  n_comp * int((src_np > 0).sum())))
            r = min(_AUTO_RANK_START, max_rank)
            basis = None
            while True:
                keep_basis = (r < max_rank
                              and not lean_auto(2 * r + 16, config.n))
                if basis is not None:
                    socs, basis, pupil, r0 = _compiled_socs_build_basis(
                        config, r, polarization, apodize, power_iters=1,
                        warm=True, chromatic=chromatic,
                        channel_k=channel_k)(aberrations, src_dev, basis, rot)
                elif keep_basis:
                    socs, basis, pupil, r0 = _compiled_socs_build_basis(
                        config, r, polarization, apodize, chromatic=chromatic,
                        channel_k=channel_k)(aberrations, src_dev, rot)
                else:
                    socs, pupil, r0 = _compiled_socs_build(
                        config, r, polarization, apodize, chromatic,
                        channel_k)(aberrations, src_dev, rot)
                energy = energy_of(socs, r0)
                if tolerance is not None:
                    bound = bound_of(socs, energy, pupil)
                    done = bound <= tolerance
                else:
                    done = energy >= _AUTO_ENERGY_TARGET
                if done or r >= max_rank:
                    break
                r = min(r * 2, max_rank)
                if not keep_basis:
                    basis = None
        else:
            socs, pupil, r0 = _compiled_socs_build(
                config, int(rank), polarization, apodize, chromatic,
                channel_k)(aberrations, src_dev, rot)
            energy = energy_of(socs, r0)
        hit = (socs, pupil, energy, bound)
        if len(_SOCS_BUILD_CACHE) >= _SOCS_BUILD_CACHE_MAX:
            _SOCS_BUILD_CACHE.pop(next(iter(_SOCS_BUILD_CACHE)))
        _SOCS_BUILD_CACHE[key] = hit
    return hit


@functools.lru_cache(maxsize=32)
def _compiled_socs_pipeline(config: OpticsConfig, chunk: int, normalize: bool,
                            rank: int, mask3d=None):
    @functools.partial(jax.jit)
    def run(geometry, aberrations, source_map):
        if mask3d is not None:
            geometry = mask3d.apply(geometry, config)
        spectrum = mask_spectrum(geometry, config, solver="gau23")
        pupil = pupil_function(aberrations, config)
        socs = randomized_socs(pupil, source_map, config, rank=rank)
        image = socs_image(spectrum, socs, config, chunk=chunk)
        if normalize:
            total = jnp.sum(source_map)
            image = jnp.where(total > 0,
                              image / jnp.maximum(total, 1e-30), 0.0)
        # Accounting scalars for the report's accuracy class: kept
        # eigenvalue sum + smallest kept eigenvalue, pupil power (trace =
        # w_sum * r0), spectrum power, and the two raw-grid means behind
        # socs_image_nrms_bound's refined formula — computed in-jit because
        # eager complex math dies on the TPU tunnel.
        from .ops.hopkins import _kept_tail_mean, _tcc_diag_weighted_m2

        eig_sum = jnp.sum(socs.eigenvalues)
        eig_min = jnp.min(socs.eigenvalues)
        r0 = jnp.sum(jnp.abs(pupil) ** 2).astype(jnp.float32)
        m2 = jnp.sum(jnp.abs(spectrum) ** 2).astype(jnp.float32)
        a_all = _tcc_diag_weighted_m2(pupil, source_map, spectrum)
        a_kept = _kept_tail_mean(socs.kernels, socs.eigenvalues, spectrum)
        return (image, spectrum, pupil, eig_sum, r0, m2,
                eig_min, a_all, a_kept)

    return run


@functools.lru_cache(maxsize=8)
def _compiled_batch_pipeline(config: OpticsConfig, solver: str, chunk: int,
                             normalize: bool, max_abs_shift: int | None,
                             polarization=None, apodize: bool = True,
                             mask3d=None, chromatic=None):
    @functools.partial(jax.jit)
    def run(geometries, aberrations, shifts, weights):
        def one(geometry):
            if mask3d is not None:
                geometry = mask3d.apply(geometry, config)
            spectrum = mask_spectrum(geometry, config, solver=solver)
            return _exact_image(
                spectrum, aberrations, shifts, weights, config,
                solver=solver, chunk=chunk, normalize=normalize,
                max_abs_shift=max_abs_shift, polarization=polarization,
                apodize=apodize, chromatic=chromatic)

        return jax.vmap(one)(geometries)

    return run


@functools.lru_cache(maxsize=8)
def _compiled_batch_socs(config: OpticsConfig, chunk: int, normalize: bool,
                         mask3d=None):
    @functools.partial(jax.jit)
    def run(geometries, socs, source_total):
        def one(geometry):
            if mask3d is not None:
                geometry = mask3d.apply(geometry, config)
            spectrum = mask_spectrum(geometry, config, solver="gau23")
            image = socs_image(spectrum, socs, config, chunk=chunk)
            if normalize:
                return jnp.where(source_total > 0,
                                 image / jnp.maximum(source_total, 1e-30), 0.0)
            return image

        return jax.vmap(one)(geometries)

    return run


@functools.lru_cache(maxsize=8)
def _compiled_film_pipeline(config: OpticsConfig, solver: str, chunk: int,
                            normalize: bool, max_abs_shift: int | None,
                            mask3d=None, engine: str = "auto"):
    """Rigorous image-in-resist stack: one jitted pipeline producing the
    (nz, n, n) in-film intensity from per-slab component-pupil multipliers
    (:func:`..ops.filmstack.film_component_multipliers`). The multipliers
    arrive as re/im float32 planes (jit *arguments*, not closure captures —
    complex host->device transfers fail on the TPU tunnel, and closures must
    not capture large device arrays; see CLAUDE.md)."""

    @functools.partial(jax.jit)
    def run(geometry, aberrations, shifts, weights, mult_re, mult_im):
        if mask3d is not None:
            geometry = mask3d.apply(geometry, config)
        spectrum = mask_spectrum(geometry, config, solver=solver)
        pupil = pupil_function(aberrations, config)
        mult = jax.lax.complex(mult_re, mult_im)  # (nz, C, n, n)

        def slab(mult_z):
            def comp(total, mult_c):
                image = abbe_image_points(
                    spectrum, pupil * mult_c, shifts, weights, config,
                    solver=solver, chunk=chunk, normalize=normalize,
                    engine=engine, max_abs_shift=max_abs_shift)
                return total + image, None

            zero = jnp.zeros(geometry.shape, jnp.float32)
            total, _ = jax.lax.scan(comp, zero, mult_z)
            return total

        return jax.lax.map(slab, mult)

    return run


def film_stack_images(
    mask,
    source_map,
    aberrations=None,
    *,
    config: OpticsConfig | None = None,
    wafer_stack,
    depths_nm=None,
    resist=None,
    polarization=None,
    apodize: bool = True,
    solver: Literal["gau23", "direct"] = "gau23",
    chunk: int = 4,
    normalize: bool = True,
    engine: str = "auto",
    mask3d=None,
    block: bool = True,
) -> jnp.ndarray:
    """(nz, n, n) rigorous in-film exposure stack — the electromagnetic
    image **inside** the resist (:mod:`..ops.filmstack`), slab by slab.

    Every plane wave of the Abbe sum refracts into the resist of
    ``wafer_stack`` and interferes with its reflection off the underlayers/
    substrate, so Beer-Lambert absorption, polarization-split standing
    waves, oblique-incidence interference and the exact (non-paraxial)
    through-depth defocus are all in the stack — feed it to
    :meth:`..models.resist.DepthResist.develop_profile` (on a
    ``DepthResist.rigorous()`` instance, so the analytic D(z) attenuation
    is not double-counted).

    ``depths_nm`` defaults to ``resist.depths_nm`` when a DepthResist is
    given. ``polarization=None`` = scalar (TE-Airy) image in resist; any
    Jones spec runs the full vector treatment. ``mask3d`` composes: thick
    MASK physics at the object side, thick FILM physics at the image side.
    """
    from .ops.filmstack import film_component_multipliers

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

    src_np = np.asarray(source_map)
    pts = source_points(src_np)
    pad = (-pts.live_count) % chunk
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])
    max_abs_shift = int(np.abs(shifts).max()) if shifts.size else 0

    mult = film_component_multipliers(
        config, wafer_stack, depths, polarization=polarization,
        apodize=apodize)
    run = _compiled_film_pipeline(config, solver, chunk, normalize,
                                  max_abs_shift, mask3d, engine)
    geometry = mask.geometry if hasattr(mask, "geometry") else jnp.asarray(mask)
    stack = run(geometry, jnp.asarray(aberrations, jnp.float32),
                jnp.asarray(shifts), jnp.asarray(weights),
                jnp.asarray(mult.real, jnp.float32),
                jnp.asarray(mult.imag, jnp.float32))
    if block:
        stack = jax.block_until_ready(stack)
    return stack


@functools.lru_cache(maxsize=8)
def _compiled_film_socs_build(config: OpticsConfig, rank: int,
                              power_iters: int, warm: bool):
    """Jitted per-slab film-SOCS build: the slab's component-pupil
    multipliers ride as re/im f32 planes (tunnel rules) and feed the
    generic weighted-component summed-TCC build. ``warm=True`` additionally
    takes the previous slab's Ritz basis — adjacent slabs differ by one
    thin-film propagation phase, so a warm ``power_iters=0-1`` build
    converges like a cold default build (same pattern as the focus-sweep
    warm restarts)."""
    from .ops.hopkins import randomized_socs_components

    def _build(aberrations, source_map, mult_re, mult_im, init_basis=None):
        pupil = pupil_function(aberrations, config)
        comps = jax.lax.complex(mult_re, mult_im) * pupil[None]  # (C, n, n)
        weights = jnp.ones((comps.shape[0],), jnp.float32)
        return randomized_socs_components(
            comps, weights, source_map, config, rank=rank,
            power_iters=power_iters, init_basis=init_basis,
            return_basis=True)

    if warm:
        return jax.jit(_build)
    return jax.jit(lambda aberrations, source_map, mult_re, mult_im:
                   _build(aberrations, source_map, mult_re, mult_im))


def film_socs_kernels(
    source_map,
    aberrations=None,
    *,
    config: OpticsConfig,
    wafer_stack,
    depths_nm=None,
    resist=None,
    polarization=None,
    apodize: bool = True,
    rank: int = 64,
    power_iters: int = 2,
    warm_iters: int = 1,
) -> list:
    """Per-slab SOCS kernel sets for the rigorous image-in-resist — the
    fast path for repeated in-film imaging (dose/mask sweeps, full-chip
    3-D resist): build once, then every mask/dose reuses the kernels at
    :func:`..ops.hopkins.socs_image` cost per slab.

    Each slab's summed TCC stacks the film-modified component pupils
    (:func:`..ops.filmstack.film_component_multipliers` x the aberrated
    pupil) through the generic weighted-component build. Slabs are built
    warm-chained: slab 0 cold at ``power_iters``, each deeper slab
    restarts from the previous slab's Ritz basis at ``warm_iters`` —
    adjacent slabs differ only by the intra-film propagation phase.
    Returns a list of :class:`..ops.hopkins.SOCSKernels`, top slab first;
    apply with :func:`film_socs_stack`.
    """
    from .ops.filmstack import film_component_multipliers

    if depths_nm is None:
        if resist is None:
            raise ValueError("pass depths_nm or a DepthResist via resist=")
        depths_nm = resist.depths_nm
    depths = tuple(float(z) for z in np.atleast_1d(depths_nm))
    if aberrations is None:
        aberrations = np.zeros((1,), np.float32)
    if isinstance(polarization, (list, np.ndarray)):
        polarization = tuple(complex(v) for v in polarization)
    mult = film_component_multipliers(
        config, wafer_stack, depths, polarization=polarization,
        apodize=apodize)  # (nz, C, n, n) complex128 host
    aberr = jnp.asarray(aberrations, jnp.float32)
    src = jnp.asarray(np.asarray(source_map), jnp.float32)
    cold = _compiled_film_socs_build(config, rank, power_iters, False)
    warm = _compiled_film_socs_build(config, rank, warm_iters, True)
    kernels = []
    basis = None
    for z in range(len(depths)):
        m_re = jnp.asarray(mult[z].real, jnp.float32)
        m_im = jnp.asarray(mult[z].imag, jnp.float32)
        if basis is None:
            socs, basis = cold(aberr, src, m_re, m_im)
        else:
            socs, basis = warm(aberr, src, m_re, m_im, basis)
        kernels.append(socs)
    return kernels


def film_socs_stack(
    mask,
    kernels: list,
    *,
    config: OpticsConfig | None = None,
    source_total=None,
    chunk: int = 4,
    normalize: bool = True,
    mask3d=None,
    block: bool = True,
) -> jnp.ndarray:
    """Apply per-slab film-SOCS kernel sets: (nz, n, n) in-film exposure at
    amortized SOCS cost. One compiled apply serves every slab (kernels are
    a jit argument). ``source_total`` (sum of source weights) normalizes
    like the exact path; required when ``normalize=True``."""
    if config is None:
        config = mask.config
    if normalize and source_total is None:
        raise ValueError("normalize=True needs source_total (sum of source "
                         "weights) to match the exact path's scaling")
    run = _compiled_socs_apply(config, chunk, normalize, mask3d)
    geometry = mask.geometry if hasattr(mask, "geometry") else jnp.asarray(mask)
    total = jnp.float32(source_total if source_total is not None else 1.0)
    planes = [run(geometry, socs, total)[0] for socs in kernels]
    stack = jnp.stack(planes)
    if block:
        stack = jax.block_until_ready(stack)
    return stack


def simulate_batch(
    geometries,
    config: OpticsConfig,
    source_map,
    aberrations=None,
    *,
    solver: Literal["gau23", "direct", "socs"] = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    block: bool = True,
    socs_rank: int | str = "auto",
    polarization=None,
    apodize: bool = True,
    mask3d=None,
    chromatic=None,
    perturb=None,
) -> jnp.ndarray:
    """(B, n, n) aerial images for a batch of masks under ONE shared optical
    configuration — a single compiled dispatch (vmap over the mask axis), so
    the pupil/source/SOCS work is paid once per batch instead of once per
    mask. The serving layer batches same-config requests onto this path.
    ``polarization`` routes through the vector Jones-pupil engine (exact
    Abbe solvers) or the vector SOCS kernel build (``solver='socs'``), and
    ``chromatic`` through the polychromatic paths, as in :func:`simulate`."""
    geometries = jnp.asarray(geometries)
    if geometries.ndim != 3:
        raise ValueError(f"expected (B, n, n) geometries, got {geometries.shape}")

    src_np = np.asarray(source_map)
    if aberrations is None:
        aberrations = np.zeros((1,), np.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)

    if isinstance(polarization, (list, np.ndarray)):
        polarization = tuple(complex(v) for v in polarization)
    if solver == "socs":
        socs, _, _, _ = _socs_kernels_cached(config, src_np, aberrations,
                                             socs_rank, polarization, apodize,
                                             chromatic)
        run = _compiled_batch_socs(config, chunk, normalize, mask3d)
        images = run(geometries, socs, jnp.float32(src_np.sum()))
    else:
        pts = source_points(src_np)
        pad = (-pts.live_count) % chunk
        shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
        weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])
        max_abs_shift = int(np.abs(shifts).max()) if shifts.size else 0
        run = _compiled_batch_pipeline(config, solver, chunk, normalize,
                                       max_abs_shift, polarization, apodize,
                                       mask3d, chromatic)
        images = run(geometries, aberrations, jnp.asarray(shifts),
                     jnp.asarray(weights))
    if perturb is not None and perturb.active:
        images = _compiled_perturb(perturb, config.pixel_size)(images)
    if block:
        images = jax.block_until_ready(images)
    return images


def simulate(
    mask: Mask,
    source_map,
    aberrations=None,
    *,
    solver: Literal["gau23", "direct", "socs"] = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    block: bool = True,
    socs_rank: int | str = "auto",
    socs_tolerance: float | None = None,
    polarization=None,
    apodize: bool = True,
    mask3d=None,
    chromatic=None,
    perturb=None,
) -> SimulationResult:
    """Run the full pipeline. ``source_map`` is a concrete (n, n) weight map
    (e.g. from :class:`..models.source.LightSource`).

    ``solver='socs'`` runs the Hopkins eigenkernel fast path — approximate to
    ~1e-4 relative but dramatically faster for dense sources; 'gau23'/
    'direct' are the exact Abbe solvers. ``socs_rank='auto'`` (default)
    self-tunes the rank to 99.9% captured TCC energy via
    :func:`..ops.hopkins.auto_rank_socs` (build cached per (config, source,
    aberrations)); pass an int to pin it. ``socs_tolerance`` (with
    ``socs_rank='auto'``) switches the stop criterion to the rigorous
    mask-dependent image-error bound
    (:func:`..ops.hopkins.socs_image_nrms_bound`) <= tolerance, so the
    image's accuracy class is guaranteed, not just its energy capture.
    Every SOCS run reports the achieved bound as
    ``report['socs_image_nrms_bound']``.

    ``polarization`` (None = scalar imaging): 'unpolarized', 'x', 'y', or a
    Jones 2-vector — switches to the vector/high-NA Jones-pupil engine
    (:mod:`.ops.vector`); with ``solver='socs'`` the kernels come from the
    polarized build (:func:`..ops.hopkins.randomized_socs_vector`), so the
    fast path carries full vector physics. ``apodize`` adds the
    1/sqrt(cos theta) radiometric obliquity factor.

    ``mask3d`` (a :class:`..ops.mask3d.BoundaryLayer`, default None = thin
    mask) adds thick-mask boundary-layer strips to the transmission before
    the spectrum — orientation-dependent CD bias and best-focus shift on
    every solver path.

    ``chromatic`` (a :class:`..config.LaserSpectrum`, default None =
    monochromatic) adds finite laser bandwidth: the image becomes the
    spectrum-weighted incoherent sum over chromatic defocus planes — on the
    exact solvers as a ``lax.map`` focal blend, on ``solver='socs'`` as ONE
    polychromatic kernel set (:func:`..ops.hopkins.randomized_socs_chromatic`;
    composable with ``polarization``).

    ``perturb`` (an :class:`..ops.perturb.ImagePerturbation`, default None)
    applies scanner non-idealities to the aerial intensity: stage-blur MSD
    and flare — incoherent effects, so they compose with every solver as a
    jitted post-step."""
    config = mask.config
    t0 = time.perf_counter()

    src_np = np.asarray(source_map)
    pts = source_points(src_np)
    pad = (-pts.live_count) % chunk
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])

    if aberrations is None:
        aberrations = np.zeros((1,), np.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)

    if isinstance(polarization, (list, np.ndarray)):
        polarization = tuple(complex(v) for v in polarization)

    socs_rank_used = None
    socs_energy = None
    socs_bound = None
    if socs_tolerance is not None and (solver != "socs"
                                       or socs_rank != "auto"):
        raise ValueError("socs_tolerance needs solver='socs' with "
                         "socs_rank='auto' (a pinned rank cannot honor a "
                         "tolerance)")
    if solver == "socs":
        w_sum = float(src_np.sum())
        if (socs_rank == "auto" or polarization is not None
                or chromatic is not None):
            # vector/chromatic kernels always go through the cached build
            # (the pinned-rank all-in-one pipeline is scalar monochromatic)
            socs, pupil, socs_energy, socs_bound = _socs_kernels_cached(
                config, src_np, aberrations, socs_rank, polarization,
                apodize, chromatic, tolerance=socs_tolerance,
                geometry=np.asarray(mask.geometry), chunk=chunk,
                normalize=normalize, mask3d=mask3d)
            run = _compiled_socs_apply(config, chunk, normalize, mask3d)
            image, spectrum = run(mask.geometry, socs,
                                  jnp.float32(src_np.sum()))
            socs_rank_used = socs.rank
            if socs_bound is None:
                # Accuracy class of the run, even without a tolerance: the
                # rigorous dropped-tail bound, from pieces already in hand
                # (trace = kept / energy covers scalar, vector, chromatic).
                from .ops.hopkins import socs_image_nrms_bound

                kept = float(np.asarray(jnp.sum(socs.eigenvalues)))
                trace = kept / socs_energy if socs_energy > 0 else 0.0
                scalar = polarization is None and chromatic is None
                socs_bound = socs_image_nrms_bound(
                    socs, spectrum, image, trace=trace,
                    pupil=(pupil if scalar else None),
                    source_map=(jnp.asarray(src_np) if scalar else None),
                    total_weight=(w_sum if normalize else None))
        else:
            run = _compiled_socs_pipeline(config, chunk, normalize, socs_rank,
                                          mask3d)
            (image, spectrum, pupil, eig_sum, r0, m2,
             eig_min, a_all, a_kept) = run(
                mask.geometry, aberrations, jnp.asarray(src_np))
            socs_rank_used = int(socs_rank)
            kept = float(np.asarray(eig_sum))
            trace = w_sum * float(np.asarray(r0))
            socs_energy = kept / trace if trace > 0 else 1.0
            peak = float(np.asarray(jnp.max(image)))
            if normalize:
                peak *= w_sum
            # same refined formula as socs_image_nrms_bound, from the
            # pipeline's in-jit scalars (the fused build never returns its
            # multi-GB kernel set to the host)
            lam_min = float(np.asarray(eig_min))
            dropped = max(trace - kept, 0.0)
            sup_scale = min(dropped, lam_min) if lam_min > 0 else dropped
            tail = max(float(np.asarray(a_all)) - float(np.asarray(a_kept)),
                       1e-6 * abs(float(np.asarray(a_all))))
            if peak > 0:
                s_m2 = sup_scale * float(np.asarray(m2))
                socs_bound = min(s_m2, 2.0 * math.sqrt(s_m2 * tail)) / peak
            else:
                socs_bound = 0.0
    else:
        max_abs_shift = int(np.abs(shifts).max()) if shifts.size else 0
        run = _compiled_pipeline(config, solver, chunk, normalize,
                                 max_abs_shift, polarization, apodize, mask3d,
                                 chromatic)
        image, spectrum, pupil = run(mask.geometry, aberrations,
                                     jnp.asarray(shifts), jnp.asarray(weights))
    if perturb is not None and perturb.active:
        image = _compiled_perturb(perturb, config.pixel_size)(image)
    if block:
        image = jax.block_until_ready(image)
    elapsed = time.perf_counter() - t0

    ws = config.wavelength_scaling()
    report = {
        "solver": solver,
        "pixel_number": config.n,
        "pixel_size_nm": config.pixel_size,
        "wavelength_nm": config.wavelength,
        "na": config.na,
        "beta": ws.beta,
        "fft_size": ws.fft_size,
        "epsilon": ws.epsilon,
        "source_points": pts.live_count,
        "polarization": (str(polarization) if polarization is not None
                         else "scalar"),
        "chromatic": (f"{chromatic.shape} E95={chromatic.bandwidth_pm}pm "
                      f"x{chromatic.samples} @ {chromatic.focus_nm_per_pm}"
                      "nm/pm" if chromatic is not None else "monochromatic"),
        "mask3d": ("thin" if mask3d is None
                   else f"BL(w={mask3d.width_nm}nm, bh={mask3d.beta_h}, "
                        f"bv={mask3d.beta_v})" if hasattr(mask3d, "beta_h")
                   else f"EdgeKernel(w={mask3d.width_nm}nm, K={mask3d.k})"),
        "wall_clock_s": elapsed,
    }
    if perturb is not None and perturb.active:
        report["perturbation"] = (
            f"MSD=({perturb.msd_x_nm},{perturb.msd_y_nm})nm "
            f"TIS={perturb.flare_tis}")
    if socs_rank_used is not None:
        report["socs_rank"] = socs_rank_used
    if socs_energy is not None:
        report["socs_energy_captured"] = round(float(socs_energy), 6)
    if socs_bound is not None:
        report["socs_image_nrms_bound"] = float(socs_bound)
    if socs_tolerance is not None:
        report["socs_tolerance"] = float(socs_tolerance)
    return SimulationResult(
        image=image, spectrum=spectrum, pupil=pupil,
        source_map=src_np, report=report,
    )
