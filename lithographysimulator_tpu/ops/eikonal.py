"""Iterative eikonal solver for resist development fronts.

Solves |grad t(x)| = s(x) on a regular 3-D grid — the arrival time t of a
front propagating from the top surface through a medium with local slowness
s = 1/rate — with the Godunov upwind discretization (Rouy & Tourin 1992).
This is the standard PDE formulation of photoresist development: the etch
front reaches voxel x at time t(x), so the developed profile after T seconds
of development is the sublevel set {t <= T}, including *lateral* etch and
undercuts that purely-vertical integration (the thin-film chain in
:class:`..models.resist.DepthResist`) cannot represent.

The classic sequential solvers (fast marching's priority queue, fast
sweeping's ordered passes) serialize on data-dependent orderings and do not
map to TPUs. Here the Godunov update is applied as a **Jacobi iteration**:
every voxel recomputes its arrival time from its six neighbors
simultaneously, and ``t <- min(t, update)`` is monotone non-increasing and
converges to the same viscosity solution. Each sweep is a dense stencil op
over the whole (nz, ny, nx) volume — pure VPU work with static shapes under
``lax.scan`` — and information propagates one cell per sweep, so
``iterations`` bounds the distance (in cells) the front can travel.
Unconverged voxels hold an *upper bound* on the true arrival time (the
solution only ever decreases), so truncating the iteration under-etches,
never over-etches. The whole solver is built from min/sort/clip — fixed
iteration count under ``lax.scan`` keeps it reverse-differentiable (the
reference has no resist model at all: reference README.md:19 lists
photoresist modeling as an unchecked roadmap item).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-but-safe "unreached" sentinel: w * _FAR^2 with w = 1/h^2 must stay
# finite in f32 so the masked branches of the Godunov quadratic never go inf
# — an inf/nan in a discarded jnp.where branch would still poison gradients
# (0 * nan = nan in the VJP of select). 1e16 keeps 3 * _FAR^2 / h^2 below
# f32 max for any spacing h > ~0.003 nm (sub-atomic), while staying many
# orders above any physical arrival time (slowness <= 1/r_min ~ 10 s/nm
# over ~1e4 nm fronts -> t ~ 1e5 s).
_FAR = 1e16


def _axis_min_neighbors(t: jnp.ndarray, axis: int, *, source_low: bool) -> jnp.ndarray:
    """Per-voxel minimum of the two axis neighbors, non-periodic boundaries.

    Outside the volume is unreachable (_FAR), except below the low-z face
    when ``source_low`` — the developer sits on the resist top surface, so
    the ghost layer above z=0 carries t = 0 (the Dirichlet source plane).
    """
    lo_pad = jnp.zeros_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis)) if source_low \
        else jnp.full_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis), _FAR)
    hi_pad = jnp.full_like(lo_pad, _FAR)
    n = t.shape[axis]
    from_lo = jnp.concatenate([lo_pad, jax.lax.slice_in_dim(t, 0, n - 1, axis=axis)], axis)
    from_hi = jnp.concatenate([jax.lax.slice_in_dim(t, 1, n, axis=axis), hi_pad], axis)
    return jnp.minimum(from_lo, from_hi)


def _solve_quadratic(a: jnp.ndarray, w: jnp.ndarray, s2: jnp.ndarray,
                     m: int) -> jnp.ndarray:
    """Root > max(a) of sum_{i<m} w_i (t - a_i)^2 = s2, vectorized.

    a: (3, ...) sorted ascending neighbor values, w = 1/h^2 matching weights.
    Valid whenever the caller's cascade selects this branch (the m-term root
    then provably exists, see Rouy-Tourin); values are clamped so discarded
    branches stay finite.
    """
    a = jnp.minimum(a[:m], _FAR)
    w = w[:m]
    sw = jnp.sum(w, axis=0)
    swa = jnp.sum(w * a, axis=0)
    swa2 = jnp.sum(w * a * a, axis=0)
    disc = swa * swa - sw * (swa2 - s2)
    # Double-where guard: sqrt has an infinite VJP at 0, and even a discarded
    # jnp.where branch poisons gradients (0 * inf = nan). disc > 0 holds
    # strictly whenever the caller's cascade selects this root.
    pos = disc > 0
    root = (swa + jnp.sqrt(jnp.where(pos, disc, 1.0))) / sw
    return jnp.where(pos, root, _FAR)


def godunov_update(t: jnp.ndarray, slowness: jnp.ndarray,
                   spacing: tuple[float, float, float],
                   lateral_factor=None) -> jnp.ndarray:
    """One monotone Godunov/Jacobi sweep: t <- min(t, local eikonal solve).

    ``spacing`` = (hz, hy, hx) grid steps (nm); ``slowness`` = 1/rate (s/nm),
    both per voxel. The source is the plane above the first z-slice (t = 0).

    ``lateral_factor`` (scalar or (nz,); None = isotropic) makes the etch
    ANISOTROPIC: the lateral (y, x) rate is ``lateral_factor * rate`` while
    the vertical rate stays ``rate`` — the standard model of surface-
    inhibited lateral development. The axis-dependent eikonal
    sum_i (dt/dx_i)^2 / r_i^2 = 1 is algebraically the ISOTROPIC equation
    on axis-scaled spacings h_i' = h_i * (s_i / s) (both reduce to
    sum_i (t - a_i)^2 / (h_i^2 s_i^2) = 1, and the 1-axis update
    a + s h' = a + s_i h_i), so anisotropy costs one broadcast divide —
    lateral steps simply 'look longer' to the front.
    """
    az = _axis_min_neighbors(t, 0, source_low=True)
    ay = _axis_min_neighbors(t, 1, source_low=False)
    ax = _axis_min_neighbors(t, 2, source_low=False)
    a = jnp.stack([az, ay, ax])
    h = jnp.asarray(spacing, t.dtype).reshape(3, 1, 1, 1)
    if lateral_factor is not None:
        lf = jnp.clip(jnp.atleast_1d(jnp.asarray(lateral_factor, t.dtype)),
                      1e-6, None)  # (1,) or (nz,); 0 would send h' to inf
        ones = jnp.ones_like(lf)
        per_axis = jnp.stack([ones, 1.0 / lf, 1.0 / lf])  # (3, nz)
        h = h * per_axis[:, :, None, None]
    w = jnp.broadcast_to(1.0 / (h * h), a.shape)

    order = jnp.argsort(a, axis=0)
    a_s = jnp.take_along_axis(a, order, axis=0)
    w_s = jnp.take_along_axis(w, order, axis=0)
    h_s = jnp.take_along_axis(jnp.broadcast_to(h, a.shape), order, axis=0)

    s2 = slowness * slowness
    t1 = a_s[0] + slowness * h_s[0]                  # 1-axis (pure upwind)
    t2 = _solve_quadratic(a_s, w_s, s2, 2)           # 2-axis
    t3 = _solve_quadratic(a_s, w_s, s2, 3)           # 3-axis
    new = jnp.where(t1 <= a_s[1], t1, jnp.where(t2 <= a_s[2], t2, t3))
    return jnp.minimum(t, new)


def arrival_times(
    slowness: jnp.ndarray,
    spacing: tuple[float, float, float],
    *,
    iterations: int,
    lateral_factor=None,
) -> jnp.ndarray:
    """Front arrival times t(z, y, x) from the top surface (z=0 face, t=0).

    ``iterations`` bounds propagation: the front cannot be tracked further
    than ``iterations`` cells from the source plane; beyond that, values are
    upper bounds (safe: truncation under-etches). For a film of nz slabs and
    lateral spread of L pixels, ``nz + L`` sweeps suffice along convex paths.

    ``lateral_factor`` (scalar or per-slab (nz,)) sets the anisotropic
    lateral/vertical etch-rate ratio — see :func:`godunov_update`. With
    laterally uniform slowness it has NO effect (the front moves straight
    down), which is the vertical-limit invariant the tests pin.
    """
    slowness = jnp.asarray(slowness, jnp.float32)
    t0 = jnp.full(slowness.shape, _FAR, jnp.float32)

    def sweep(t, _):
        return godunov_update(t, slowness, spacing, lateral_factor), None

    t, _ = jax.lax.scan(sweep, t0, None, length=iterations)
    return t
