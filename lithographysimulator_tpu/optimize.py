"""Inverse lithography: differentiable source-mask optimization (SMO).

The whole imaging pipeline (mask spectrum -> pupil -> Abbe accumulation) is
pure jittable JAX, so aerial images are differentiable w.r.t. the mask
geometry, the source weights, and the Zernike coefficients. This module packs
that into a gradient-descent "training step": a sigmoid-parameterized
continuous mask (and optionally non-negative source weights) is optimized so
the simulated aerial image matches a target intensity profile.

This goes beyond the reference — its "2D solver for lithography recipe
generation" is an unchecked roadmap item (reference ``README.md:21``) — but
uses only capabilities the reference's physics defines.

The step shards like inference: source points over the mesh 'source' axis,
one psum of the intensity (and therefore one psum of its cotangent on the
backward pass) over ICI.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import OpticsConfig
from .models.pupil import pupil_function
from .ops.abbe import abbe_image_points
from .ops.fraunhofer import mask_spectrum
from .parallel.abbe_sharded import abbe_image_sharded


@dataclasses.dataclass(frozen=True)
class SMOProblem:
    """Static description of one source-mask optimization problem."""

    config: OpticsConfig
    solver: str = "gau23"
    chunk: int = 4
    mask_steepness: float = 4.0  # sigmoid sharpness of the latent -> mask map
    optimize_source: bool = False
    # Optional thick-mask BoundaryLayer (ops.mask3d): the optimizer then
    # corrects the layout THROUGH the Mask-3D model (M3D-aware SMO/OPC).
    mask3d: object | None = None


def mask_from_latent(latent: jnp.ndarray, steepness: float) -> jnp.ndarray:
    """Continuous (0, 1) mask from unconstrained latents."""
    return jax.nn.sigmoid(steepness * latent)


def latent_from_mask(geometry: jnp.ndarray, steepness: float) -> jnp.ndarray:
    """Inverse of :func:`mask_from_latent` on clipped geometry (init helper)."""
    g = jnp.clip(geometry, 1e-4, 1 - 1e-4)
    return jnp.log(g / (1 - g)) / steepness


def init_params(problem: SMOProblem, geometry_init, source_weights_init=None):
    params = {"mask_latent": latent_from_mask(
        jnp.asarray(geometry_init, jnp.float32), problem.mask_steepness)}
    if problem.optimize_source:
        if source_weights_init is None:
            raise ValueError("optimize_source=True needs source_weights_init")
        params["source_logits"] = jnp.log(
            jnp.clip(jnp.asarray(source_weights_init, jnp.float32), 1e-3, None))
    return params


def forward(params: dict, aberrations, shifts, weights, problem: SMOProblem,
            mesh=None) -> jnp.ndarray:
    """Differentiable aerial image from SMO parameters."""
    cfg = problem.config
    geom = mask_from_latent(params["mask_latent"], problem.mask_steepness)
    if problem.mask3d is not None:
        geom = problem.mask3d.apply(geom, cfg)
    spectrum = mask_spectrum(geom, cfg, solver=problem.solver)
    pupil = pupil_function(aberrations, cfg)
    if problem.optimize_source:
        live = (jnp.asarray(weights) > 0).astype(jnp.float32)
        w = jnp.exp(params["source_logits"]) * live  # padding stays dark
    else:
        w = jnp.asarray(weights)
    if mesh is None:
        return abbe_image_points(
            spectrum, pupil, shifts, w, cfg,
            solver=problem.solver, chunk=problem.chunk, normalize=True,
        )
    return abbe_image_sharded(
        spectrum, pupil, shifts, w, cfg, mesh,
        solver=problem.solver, chunk=problem.chunk, normalize=True,
    )


def loss_fn(params, target, aberrations, shifts, weights, problem: SMOProblem,
            mesh=None) -> jnp.ndarray:
    image = forward(params, aberrations, shifts, weights, problem, mesh)
    return jnp.mean((image - target) ** 2)


def make_train_step(problem: SMOProblem, optimizer: optax.GradientTransformation,
                    mesh=None):
    """Build a jitted (params, opt_state, target, aberrations, shifts,
    weights) -> (params, opt_state, loss) training step."""

    @jax.jit
    def step(params, opt_state, target, aberrations, shifts, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target, aberrations, shifts, weights, problem, mesh)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def optimize(
    problem: SMOProblem,
    target: jnp.ndarray,
    geometry_init,
    aberrations,
    shifts,
    weights,
    *,
    steps: int = 100,
    learning_rate: float = 0.1,
    source_weights_init=None,
    mesh=None,
) -> tuple[dict, list[float]]:
    """Run SMO for ``steps`` iterations; returns (params, loss history)."""
    optimizer = optax.adam(learning_rate)
    params = init_params(problem, geometry_init, source_weights_init)
    opt_state = optimizer.init(params)
    step = make_train_step(problem, optimizer, mesh)
    history: list[float] = []
    aberrations = jnp.asarray(aberrations, jnp.float32)
    for _ in range(steps):
        params, opt_state, loss = step(
            params, opt_state, target, aberrations, shifts, weights)
        history.append(float(loss))
    return params, history


# ---------------------------------------------------------------------------
# SOCS-accelerated SMO (alternating mask / source phases)
# ---------------------------------------------------------------------------

def _source_map_from_points(shifts, weights, n: int) -> jnp.ndarray:
    """Scatter per-point source weights back onto the (n, n) weight map (the
    inverse of :func:`..ops.abbe.source_points`; zero-weight padding points
    scatter zeros, harmless)."""
    idx = jnp.asarray(shifts, jnp.int32) + n // 2
    return jnp.zeros((n, n), jnp.float32).at[idx[:, 0], idx[:, 1]].add(
        jnp.asarray(weights, jnp.float32))


@functools.lru_cache(maxsize=8)
def _compiled_socs_mask_step(problem: SMOProblem, learning_rate: float):
    """Jitted mask-latent gradient step through the SOCS forward model.

    The aerial image is a quadratic form in the mask spectrum for FIXED
    kernels, so holding the kernel set constant across mask steps is exact —
    the source dependence lives entirely in the kernels, rebuilt (warm) in
    the outer loop."""
    from .ops.hopkins import socs_image

    cfg = problem.config
    optimizer = optax.adam(learning_rate)

    def loss(latent, target, socs, w_sum):
        geom = mask_from_latent(latent, problem.mask_steepness)
        if problem.mask3d is not None:
            geom = problem.mask3d.apply(geom, cfg)
        spectrum = mask_spectrum(geom, cfg, solver=problem.solver)
        image = socs_image(spectrum, socs, cfg, solver=problem.solver,
                           chunk=problem.chunk) / w_sum
        return jnp.mean((image - target) ** 2)

    @jax.jit
    def step(latent, opt_state, target, socs, w_sum):
        value, grads = jax.value_and_grad(loss)(latent, target, socs, w_sum)
        updates, opt_state = optimizer.update(grads, opt_state, latent)
        return optax.apply_updates(latent, updates), opt_state, value

    return optimizer, step


@functools.lru_cache(maxsize=8)
def _compiled_source_step(problem: SMOProblem, learning_rate: float):
    """Jitted source-logits gradient step through the exact Abbe model (the
    kernels absorb the source, so the source gradient needs the per-point
    path; one Abbe step per outer iteration, mask held fixed)."""
    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(logits, opt_state, latent, target, aberrations, shifts, weights):
        def loss(lg):
            params = {"mask_latent": latent, "source_logits": lg}
            return loss_fn(params, target, aberrations, shifts, weights,
                           problem)

        value, grads = jax.value_and_grad(loss)(logits)
        updates, opt_state = optimizer.update(grads, opt_state, logits)
        return optax.apply_updates(logits, updates), opt_state, value

    return optimizer, step


def optimize_socs(
    problem: SMOProblem,
    target: jnp.ndarray,
    geometry_init,
    aberrations,
    shifts,
    weights,
    *,
    steps: int = 100,
    learning_rate: float = 0.1,
    rank: int = 64,
    power_iters: int = 2,
    source_weights_init=None,
    mask_steps_per_build: int = 20,
    source_learning_rate: float | None = None,
    chromatic=None,
) -> tuple[dict, list[float]]:
    """SMO with the SOCS forward model on the mask phase (ROADMAP item 7).

    Mask-only problems build ONE kernel set and run every gradient step
    through :func:`..ops.hopkins.socs_image` — O(rank) FFT-sized work per
    step instead of O(source points), typically 10-100x cheaper per step
    than :func:`optimize` at production source counts, with identical
    physics up to the rank truncation.

    With ``problem.optimize_source=True`` the loop alternates: an outer
    iteration rebuilds the kernels for the CURRENT source — warm-started
    from the previous iteration's Ritz basis
    (:func:`..ops.hopkins.randomized_socs` ``init_basis``; a source
    gradient step is a tiny operator perturbation, so ``power_iters=1``
    converges like a cold default build) — runs ``mask_steps_per_build``
    SOCS mask steps against it, then takes one exact-Abbe gradient step on
    the source logits (the kernels absorb the source, so its gradient
    needs the per-point path). Returns (params, loss history) like
    :func:`optimize`; history entries are SOCS-model losses for mask steps
    and Abbe-model losses for source steps.
    """
    from .simulate import _socs_build_basis_with_channels

    cfg = problem.config
    params = init_params(problem, geometry_init, source_weights_init)
    latent = params["mask_latent"]
    aberrations = jnp.asarray(aberrations, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)
    live = (weights > 0).astype(jnp.float32)

    mask_opt, mask_step = _compiled_socs_mask_step(problem, learning_rate)
    mask_state = mask_opt.init(latent)
    history: list[float] = []

    if chromatic is not None and problem.optimize_source:
        # the source step's exact-Abbe gradient path is monochromatic
        raise ValueError(
            "chromatic SMO requires optimize_source=False (mask-only)")
    warm_iters = min(power_iters, 1)
    cold = _socs_build_basis_with_channels(cfg, rank, None, True,
                                           power_iters, chromatic=chromatic)
    warm = _socs_build_basis_with_channels(cfg, rank, None, True, warm_iters,
                                           warm=True, chromatic=chromatic)

    if not problem.optimize_source:
        src_map = _source_map_from_points(shifts, weights, cfg.n)
        socs, _, _, _ = cold(aberrations, src_map)
        w_sum = jnp.sum(weights)
        for _ in range(steps):
            latent, mask_state, loss = mask_step(latent, mask_state, target,
                                                 socs, w_sum)
            history.append(float(loss))
        return {"mask_latent": latent}, history

    logits = params["source_logits"]
    src_lr = learning_rate if source_learning_rate is None else source_learning_rate
    src_opt, src_step = _compiled_source_step(problem, src_lr)
    src_state = src_opt.init(logits)
    basis = None
    done = 0
    while done < steps:
        w_now = jnp.exp(logits) * live
        src_map = _source_map_from_points(shifts, w_now, cfg.n)
        if basis is None:
            socs, basis, _, _ = cold(aberrations, src_map)
        else:
            socs, basis, _, _ = warm(aberrations, src_map, basis)
        w_sum = jnp.sum(w_now)
        for _ in range(min(mask_steps_per_build, steps - done)):
            latent, mask_state, loss = mask_step(latent, mask_state, target,
                                                 socs, w_sum)
            history.append(float(loss))
            done += 1
        logits, src_state, loss = src_step(logits, src_state, latent, target,
                                           aberrations, shifts, weights)
        history.append(float(loss))
    return {"mask_latent": latent, "source_logits": logits}, history


# ---------------------------------------------------------------------------
# Aberration retrieval (wavefront metrology)
# ---------------------------------------------------------------------------

def fit_aberrations(
    target_image: jnp.ndarray,
    spectrum: jnp.ndarray,
    shifts,
    weights,
    config: OpticsConfig,
    *,
    n_coeffs: int = 10,
    steps: int = 200,
    learning_rate: float = 0.05,
    solver: str = "gau23",
    chunk: int = 4,
    init=None,
    defocus_nm=None,
) -> tuple[jnp.ndarray, list[float]]:
    """Recover OSA Zernike coefficients from a measured aerial image by
    gradient descent through the imaging model (the pipeline is
    differentiable w.r.t. the aberration vector; see models/pupil.py).

    The target and model images are normalized per-iteration, so absolute
    dose need not be known. Piston (index 0) is a global phase with no
    intensity signature and is pinned to zero.

    Through-focus mode (the scanner-matching workflow): pass ``defocus_nm``
    (length F) and a matching (F, n, n) ``target_image`` stack. A single
    in-focus intensity image cannot determine the SIGN of even (focus-
    symmetric) aberrations — ±spherical print identically at best focus to
    first order — so production aberration metrology always measures a
    focal stack; each known stage offset is ADDED to the fitted entry-4
    base defocus (both nm, the nm→waves map is linear), which keeps the
    residual scanner defocus itself identifiable from two or more planes.
    """
    from .models.pupil import pupil_function

    target = jnp.asarray(target_image, jnp.float32)
    if defocus_nm is not None:
        # host-side numpy: offsets/mask_vec embed as host constants in the
        # jitted step (a device-array capture would round-trip the tunnel)
        offsets = np.asarray(defocus_nm, np.float32)
        if target.ndim != 3 or target.shape[0] != offsets.shape[0]:
            raise ValueError(
                f"defocus_nm has {offsets.shape[0]} planes; target_image "
                f"must be a matching (F, n, n) stack, got {target.shape}")
        n_coeffs = max(n_coeffs, 5)  # entry 4 carries the focal offsets
    else:
        offsets = None
        if target.ndim != 2:
            raise ValueError("single-image fit expects an (n, n) target; "
                             "pass defocus_nm for a focal stack")
    axes = tuple(range(-2, 0))
    target = target / jnp.maximum(
        jnp.max(target, axis=axes, keepdims=True), 1e-30)
    mask_vec = np.ones((n_coeffs,), np.float32)
    mask_vec[0] = 0.0  # host constant (see offsets note above)
    spectrum = jnp.asarray(spectrum)
    shifts = jnp.asarray(shifts)
    weights = jnp.asarray(weights)

    def one_plane(coeffs, target_plane, spectrum, shifts, weights):
        # all device arrays arrive as arguments — a closure capture would
        # lower them as jit constants, and pulling the complex spectrum to
        # host for that dies UNIMPLEMENTED on the TPU tunnel (CLAUDE.md)
        pupil = pupil_function(coeffs, config)
        image = abbe_image_points(
            spectrum, pupil, shifts, weights, config,
            solver=solver, chunk=chunk, normalize=True,
        )
        image = image / jnp.maximum(jnp.max(image), 1e-30)
        return jnp.mean((image - target_plane) ** 2)

    def loss_fn(coeffs, target, spectrum, shifts, weights):
        coeffs = coeffs * mask_vec
        if offsets is None:
            return one_plane(coeffs, target, spectrum, shifts, weights)
        stacked = jnp.broadcast_to(
            coeffs, (offsets.shape[0], n_coeffs)).at[:, 4].add(offsets)
        per_plane = jax.vmap(one_plane, in_axes=(0, 0, None, None, None))(
            stacked, target, spectrum, shifts, weights)
        return jnp.mean(per_plane)

    optimizer = optax.adam(learning_rate)
    coeffs = (jnp.zeros((n_coeffs,), jnp.float32) if init is None
              else jnp.asarray(init, jnp.float32))
    opt_state = optimizer.init(coeffs)

    # large arrays ride as jit arguments, not closure constants (CLAUDE.md)
    @jax.jit
    def step(coeffs, opt_state, target, spectrum, shifts, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            coeffs, target, spectrum, shifts, weights)
        updates, opt_state = optimizer.update(grads, opt_state, coeffs)
        return optax.apply_updates(coeffs, updates), opt_state, loss

    history: list[float] = []
    for _ in range(steps):
        coeffs, opt_state, loss = step(coeffs, opt_state, target, spectrum,
                                       shifts, weights)
        history.append(float(loss))
    return coeffs * mask_vec, history


# ---------------------------------------------------------------------------
# Resist-aware OPC
# ---------------------------------------------------------------------------

def opc_correct(
    target_geometry,
    aberrations,
    shifts,
    weights,
    problem: SMOProblem,
    *,
    resist=None,
    steps: int = 150,
    learning_rate: float = 0.15,
) -> tuple[jnp.ndarray, list[float]]:
    """Optical proximity correction: optimize the mask so the *developed
    resist pattern* matches the target layout (not just the aerial image).

    The loss is the mean squared difference between the differentiable
    resist profile of the simulated image and the binary target — gradients
    flow through develop -> image -> spectrum -> mask. Returns the corrected
    continuous mask and the loss history.
    """
    from .models.resist import ResistModel

    resist = resist or ResistModel(threshold=0.35, steepness=30.0)
    target = jnp.asarray(target_geometry, jnp.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)
    shifts = jnp.asarray(shifts)
    weights = jnp.asarray(weights)
    optimizer = optax.adam(learning_rate)
    params = init_params(problem, target)  # start from the design itself
    opt_state = optimizer.init(params)

    def loss_fn(params, target, aberrations, shifts, weights):
        image = forward(params, aberrations, shifts, weights, problem)
        profile = resist.develop(image, problem.config)
        return jnp.mean((profile - target) ** 2)

    # large arrays ride as jit arguments, not closure constants (CLAUDE.md)
    @jax.jit
    def step(params, opt_state, target, aberrations, shifts, weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target, aberrations, shifts, weights)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history: list[float] = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, target,
                                       aberrations, shifts, weights)
        history.append(float(loss))
    corrected = mask_from_latent(params["mask_latent"], problem.mask_steepness)
    return corrected, history


# ---------------------------------------------------------------------------
# Full-chip (tile-streamed) OPC
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _compiled_tile_opc_step(config, halo: int, steepness: float,
                            learning_rate: float, resist_key, mask3d=None):
    """One Adam step of the per-tile OPC problem, jitted once and reused for
    every tile of every sweep. The halo ring is FROZEN to ``frozen_tile``
    (the design on sweep 1, corrected neighbors afterwards) so each core
    solution is consistent with its surroundings; the loss reads the core
    only. SOCS kernels ride as a jit argument (pytree)."""
    from .models.resist import ResistModel
    from .ops.fraunhofer import mask_spectrum
    from .ops.hopkins import socs_image

    resist = ResistModel(*resist_key)
    optimizer = optax.adam(learning_rate)
    n = config.n

    def mask_of(latent, frozen_tile):
        soft = jax.nn.sigmoid(steepness * latent)
        core = jnp.zeros((n, n), bool).at[halo:n - halo, halo:n - halo].set(True)
        return jnp.where(core, soft, frozen_tile)

    def loss_fn(latent, frozen_tile, target_core, socs):
        mask = mask_of(latent, frozen_tile)
        if mask3d is not None:
            # M3D-aware full-chip OPC: correct THROUGH the thick-mask model
            mask = mask3d.apply(mask, config)
        spectrum = mask_spectrum(mask, config, solver="gau23")
        image = socs_image(spectrum, socs, config)
        profile = resist.develop(image, config)
        core = profile[halo:n - halo, halo:n - halo]
        return jnp.mean((core - target_core) ** 2)

    @jax.jit
    def step(latent, opt_state, frozen_tile, target_core, socs):
        loss, grads = jax.value_and_grad(loss_fn)(latent, frozen_tile,
                                                  target_core, socs)
        updates, opt_state = optimizer.update(grads, opt_state, latent)
        return optax.apply_updates(latent, updates), opt_state, loss

    return step, optimizer


def opc_correct_tiled(
    target_big,
    tile_config,
    source_map,
    *,
    resist=None,
    halo: int | None = None,
    steps: int = 60,
    learning_rate: float = 0.15,
    mask_steepness: float = 4.0,
    rank: int = 64,
    sweeps: int = 1,
    aberrations=None,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    progress_cb=None,
    mask3d=None,
) -> np.ndarray:
    """Resist-aware OPC on an arbitrarily large layout, tile by tile.

    Imaging locality (the same property :mod:`.ops.tiled` stitches with)
    makes OPC local too: each tile is optimized under tile-sized optics with
    its halo ring frozen — to the original design on the first sweep, to the
    already-corrected mask on later Gauss-Seidel-style sweeps — and only the
    halo-free core lands in the output. The per-tile forward model is the
    Hopkins/SOCS fast path (kernels built once per run, differentiable
    through ``socs_image``), so full-chip OPC cost is
    O(sweeps * tiles * steps) SOCS images at tile size, O(tile^2) memory.

    Returns the corrected CONTINUOUS mask (threshold at 0.5 for manufactured
    geometry). ``polarization`` builds the forward model's kernels with the
    vector Jones-pupil physics (:func:`..ops.hopkins.randomized_socs_vector`;
    kernels are constants to the optimizer, so differentiability is
    untouched), and ``chromatic`` with the finite-bandwidth polychromatic
    build — OPC against the image the real laser prints. ``mask3d`` (a
    :class:`..ops.mask3d.BoundaryLayer` / ``EdgeKernelM3D``, e.g. from
    :func:`..ops.mask3d.boundary_layer_from_rcwa`) makes the correction
    M3D-aware: the forward model images the layout THROUGH the calibrated
    thick-mask model, so the corrected layout pre-compensates topography
    effects (EUV shadowing bias included). The reference has
    no OPC at all (README.md:21 roadmap)."""
    from .models.resist import ResistModel
    from .ops.tiled import default_halo, tile_layout
    from .simulate import _socs_build_with_channels

    resist = resist or ResistModel(threshold=0.35, steepness=30.0)
    resist_key = (resist.threshold, resist.steepness, resist.diffusion_nm)
    if aberrations is None:
        aberrations = np.zeros((5,), np.float32)
    n = tile_config.n
    big_n = np.asarray(target_big).shape[-1]
    if halo is None:
        halo = min(default_halo(tile_config), n // 4)
    tiles, step_px = tile_layout(big_n, n, halo)

    socs = _socs_build_with_channels(tile_config, rank, polarization,
                                     apodize, chromatic)(
        np.asarray(aberrations, np.float32),
        np.asarray(source_map, np.float32))[0]
    step, optimizer = _compiled_tile_opc_step(
        tile_config, halo, mask_steepness, learning_rate, resist_key, mask3d)

    target_big = np.asarray(target_big, np.float32)
    pad_lo = halo
    pad_hi = tiles * step_px + halo - big_n + (n - step_px)
    target_pad = np.pad(target_big, ((pad_lo, pad_hi), (pad_lo, pad_hi)))
    corrected_pad = target_pad.copy()

    n_sweeps = max(1, sweeps)
    done_tiles = 0
    for _ in range(n_sweeps):
        for ti in range(tiles):
            for tj in range(tiles):
                y0, x0 = ti * step_px, tj * step_px
                frozen = jnp.asarray(corrected_pad[y0:y0 + n, x0:x0 + n])
                target_core = jnp.asarray(
                    target_pad[y0 + halo:y0 + n - halo,
                               x0 + halo:x0 + n - halo])
                latent = latent_from_mask(
                    target_pad[y0:y0 + n, x0:x0 + n], mask_steepness)
                opt_state = optimizer.init(latent)
                for _ in range(steps):
                    latent, opt_state, _ = step(latent, opt_state, frozen,
                                                target_core, socs)
                core = np.asarray(
                    mask_from_latent(latent, mask_steepness))[
                        halo:n - halo, halo:n - halo]
                corrected_pad[y0 + halo:y0 + n - halo,
                              x0 + halo:x0 + n - halo] = core
                done_tiles += 1
                if progress_cb is not None:
                    progress_cb(done_tiles / (n_sweeps * tiles * tiles))
    return corrected_pad[pad_lo:pad_lo + big_n, pad_lo:pad_lo + big_n]


# ---------------------------------------------------------------------------
# Process-window-aware OPC (round 3)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _compiled_pw_opc_step(config, steepness: float, learning_rate: float,
                          resist_key, n_corners: int):
    """One Adam step of the process-window OPC problem: the loss sums the
    resist-profile mismatch over every (defocus, dose) corner, each imaged
    through its own SOCS kernel set (a stacked pytree riding as a jit
    argument). Compiled once per (config, corner-count)."""
    from .models.resist import ResistModel
    from .ops.fraunhofer import mask_spectrum
    from .ops.hopkins import socs_image

    resist = ResistModel(*resist_key)
    optimizer = optax.adam(learning_rate)

    def loss_fn(latent, target, kernel_stack, lam_stack, doses, weights):
        mask = jax.nn.sigmoid(steepness * latent)
        spectrum = mask_spectrum(mask, config, solver="gau23")

        def corner_loss(kernels, lams, dose):
            from .ops.hopkins import SOCSKernels

            # engine pinned to the f32 matmul path: the corner vmap maps
            # over kernel stacks, and f32-highest is the right accuracy/
            # robustness point for an optimization forward model (the int8
            # engine's VJP recomputes through f32 anyway).
            img = socs_image(spectrum, SOCSKernels(kernels, lams), config,
                             engine="matmul" if jax.devices()[0].platform
                             in ("tpu", "axon") else "fft")
            img = img / jnp.maximum(jnp.max(img), 1e-30)
            profile = resist.develop(img * dose, config, normalize=False)
            return jnp.mean((profile - target) ** 2)

        losses = jax.vmap(corner_loss)(kernel_stack, lam_stack, doses)
        return jnp.sum(weights * losses), losses

    @jax.jit
    def step(latent, opt_state, target, kernel_stack, lam_stack, doses,
             weights):
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            latent, target, kernel_stack, lam_stack, doses, weights)
        updates, opt_state = optimizer.update(grads, opt_state, latent)
        return optax.apply_updates(latent, updates), opt_state, loss, losses

    return step, optimizer


def opc_correct_pw(
    target_geometry,
    config,
    source_map,
    *,
    defocus_nm=(-60.0, 0.0, 60.0),
    doses=(0.95, 1.0, 1.05),
    corner_weights=None,
    resist=None,
    steps: int = 120,
    learning_rate: float = 0.15,
    mask_steepness: float = 4.0,
    rank: int = 64,
    aberrations=None,
    polarization=None,
    chromatic=None,
) -> tuple[jnp.ndarray, dict]:
    """Process-window-aware OPC: optimize the mask so the developed resist
    pattern matches the target across EVERY (defocus, dose) corner of the
    process window simultaneously — not just at nominal conditions. This is
    the production treatment (nominal-only OPC over-fits to best focus and
    loses the corners; see the FEM machinery in :mod:`.metrology` for
    measuring exactly that).

    One SOCS kernel set is built per defocus plane, warm-started from the
    previous plane's Ritz basis (:func:`..ops.hopkins.randomized_socs`
    ``init_basis``), so the corner sweep pays 1 cold + F-1 cheap builds;
    the (defocus x dose) corner grid shares kernel sets across doses. The
    optimizer sees all corners in ONE jitted step (vmap over a stacked
    kernel pytree), with gradients flowing through every corner's resist
    profile. ``polarization`` builds vector kernels; ``chromatic`` builds
    each corner polychromatic (the laser's focus blur rides on top of each
    defocus corner).

    Returns ``(corrected_mask, report)`` with per-corner final losses.
    """
    from .models.resist import ResistModel
    from .simulate import _socs_build_basis_with_channels

    resist = resist or ResistModel(threshold=0.35, steepness=30.0)
    resist_key = (resist.threshold, resist.steepness, resist.diffusion_nm)
    if aberrations is None:
        aberrations = np.zeros((5,), np.float32)
    aberrations = np.asarray(aberrations, np.float32)
    if aberrations.shape[0] < 5:
        aberrations = np.pad(aberrations, (0, 5 - aberrations.shape[0]))
    src = np.asarray(source_map, np.float32)

    # one kernel set per focal plane, warm-chained
    cold = _socs_build_basis_with_channels(config, rank, polarization,
                                           True, chromatic=chromatic)
    warm = _socs_build_basis_with_channels(config, rank, polarization, True,
                                           power_iters=0, warm=True,
                                           chromatic=chromatic)
    kernel_sets = []
    basis = None
    for d in defocus_nm:
        ab = aberrations.copy()
        ab[4] += float(d)
        if basis is None:
            socs, basis, _, _ = cold(jnp.asarray(ab), src)
        else:
            socs, basis, _, _ = warm(jnp.asarray(ab), src, basis)
        kernel_sets.append(socs)

    # corner grid: (defocus x dose); kernel sets shared across doses
    kernel_stack = jnp.stack(
        [kernel_sets[i].kernels for i in range(len(defocus_nm))
         for _ in doses])
    lam_stack = jnp.stack(
        [kernel_sets[i].eigenvalues for i in range(len(defocus_nm))
         for _ in doses])
    dose_vec = jnp.asarray([d for _ in defocus_nm for d in doses],
                           jnp.float32)
    n_corners = len(defocus_nm) * len(doses)
    if corner_weights is None:
        weights = jnp.full((n_corners,), 1.0 / n_corners, jnp.float32)
    else:
        weights = jnp.asarray(corner_weights, jnp.float32)
        if weights.shape != (n_corners,):
            raise ValueError(f"corner_weights shape {weights.shape} != "
                             f"({n_corners},)")
        weights = weights / jnp.sum(weights)

    target = jnp.asarray(target_geometry, jnp.float32)
    latent = latent_from_mask(target, mask_steepness)
    step, optimizer = _compiled_pw_opc_step(
        config, mask_steepness, learning_rate, resist_key, n_corners)
    opt_state = optimizer.init(latent)
    history = []
    for _ in range(steps):
        latent, opt_state, loss, losses = step(
            latent, opt_state, target, kernel_stack, lam_stack, dose_vec,
            weights)
        history.append(float(loss))
    corrected = mask_from_latent(latent, mask_steepness)
    report = {
        "loss_history": history,
        "corner_losses": np.asarray(losses).reshape(
            len(defocus_nm), len(doses)),
        "defocus_nm": list(defocus_nm),
        "doses": list(doses),
    }
    return corrected, report
