"""Mesh-sharded randomized SOCS kernel *builds* — collective pattern #5.

The imaging stages have had multi-chip paths since round 2 (source psum,
rank psum, tile all-gather, trial psum), but the kernel build itself —
~91% of the cold 1024^2 headline (BENCH_r03: 1.29 of 1.42 s) — ran on one
chip. This module distributes :func:`..ops.hopkins.randomized_socs` and
:func:`..ops.hopkins.randomized_socs_components` over a device mesh.

The build alternates between two compute regimes with *different* natural
shardings of the (L, n, n) probe block (L = rank + oversample):

* **FFT stages** (Gram-operator matvecs, kernel synthesis) are
  embarrassingly parallel over probe rows: shard the leading axis,
  ``P(axis, None, None)`` — each chip runs full (n, n) FFT convolutions
  on its L/D rows, zero communication.
* **MXU stages** (whitening Grams, whiten applies, Rayleigh-Ritz
  projections) contract over the n^2 image axis: shard the trailing
  image axis, ``P(None, None, axis)`` — each chip contracts its n/D
  columns and the (L, L) Gram results meet in a psum, while the
  (L, L) @ (L, n, n) mixing applies stay fully local.

Layout transitions are ``with_sharding_constraint`` boundaries: XLA's SPMD
partitioner lowers them to all_to_alls over ICI (block_size/D per chip per
transition — far cheaper than all-gathering the block, which is multi-GB at
production scale). The whole build is pure GSPMD — no shard_map — so the
compensated double-float contractions (:mod:`..ops.compensated`) are reused
unchanged: per-chip partials keep their error-free cross-chunk accumulation
and the final cross-chip psum adds only D rounding terms.

Math is identical to the local builds (same probes at equal seed, same
CholQR2 whitening, same Rayleigh-Ritz); only summation order differs, so
sharded-vs-local image agreement is at the fp32 reduction floor
(tests/test_sharding.py pins <= 1e-5 normalized RMS; measured ~1e-7 at
64^2). Krylov and lean variants are deliberately not mirrored here: krylov
is not the at-scale production path, and the lean build exists for
single-chip HBM limits that sharding itself removes (the per-chip block
footprint is already L/D of the local build's).

(Reference: the amortized source loop this build replaces is
/root/reference/imageformation.py:62-67; the reference has no distributed
code at all — SURVEY §2, §5.8.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OpticsConfig
from ..ops.compensated import rowdot3_compensated
from ..ops.hopkins import (
    SOCSKernels,
    _WHITEN_CLIP,
    _cholesky_whiten_mat,
    _gram_matvec,
    _random_probe_block,
    _synthesize_kernels,
    _warm_omega,
    apply_channel_rotation,
    compress_components,
    principal_channel_rotation,
)
from .mesh import SOURCE_AXIS

_HI = jax.lax.Precision.HIGHEST
_MIX_DIMS = (((1,), (0,)), ((), ()))      # (out, in) @ (in, n, n) -> (out, n, n)
_IMG_DIMS = (((1, 2), (1, 2)), ((), ()))  # contract trailing image axes


def _build_axis(mesh: Mesh, axis: str | None) -> str:
    if axis is not None:
        if axis not in mesh.axis_names:
            raise ValueError(f"axis {axis!r} not in mesh axes {mesh.axis_names}")
        return axis
    return SOURCE_AXIS if SOURCE_AXIS in mesh.axis_names else mesh.axis_names[0]


def _range_eigh_sharded(
    matvec_all,
    omega: jnp.ndarray,
    *,
    rank: int,
    power_iters: int,
    compensated: bool,
    row_s: NamedSharding,
    col_s: NamedSharding,
    method: str = "rr",
):
    """Sharded twin of :func:`..ops.hopkins._randomized_range_eigh`
    (subspace-iteration path): block subspace iteration with CholQR2 Gram
    whitening, then Rayleigh-Ritz (``method='rr'``) or the fixed-rank PSD
    Nystrom core (``method='nystrom'`` — one fewer block matvec, see the
    local twin). Blocks stay 3-D throughout — the Gram contractions run on
    :func:`..ops.compensated.rowdot3_compensated`, whose row-chunked scan
    slices only the UNSHARDED image-row axis (slicing a sharded axis would
    force SPMD gathers).

    Returns ``(eigvals, u)`` exactly as the local twin: full descending
    clipped Ritz values and the top-``rank`` Ritz block, row-sharded."""
    if method not in ("rr", "nystrom"):
        raise ValueError(f"unknown randomized-eigh method {method!r} "
                         "(expected 'rr' or 'nystrom')")

    def to_rows(x):
        return jax.lax.with_sharding_constraint(x, row_s)

    def to_cols(x):
        return jax.lax.with_sharding_constraint(x, col_s)

    def dot3(a, b, conj_a=False, conj_b=False):
        if compensated:
            return rowdot3_compensated(a, b, conj_a=conj_a, conj_b=conj_b)
        if conj_a:
            a = jnp.conj(a)
        if conj_b:
            b = jnp.conj(b)
        return jax.lax.dot_general(a, b, _IMG_DIMS, precision=_HI)

    def orthonormalize(block):
        b = to_cols(block)
        for _ in range(2):  # CholQR2-style double whitening (see local twin)
            whiten = _cholesky_whiten_mat(dot3(b, b, conj_b=True))
            b = to_cols(jax.lax.dot_general(whiten, b, _MIX_DIMS, precision=_HI))
        return b

    if method == "nystrom":
        # Mirrors the local Nystrom core: basis from `power_iters` whitened
        # subspace iterations, one further application Y = G B, and
        # G ~ Y_nu S_nu^-1 Y_nu^H with S_nu = B^H Y + nu I. The (L, L)
        # reductions psum over the column shards; everything (L, n, n)
        # stays sharded.
        lq = omega.shape[0]
        b = orthonormalize(omega)
        for _ in range(power_iters):
            b = orthonormalize(matvec_all(to_rows(b)))
        y = to_cols(matvec_all(to_rows(b)))
        small = dot3(b, y, conj_a=True)          # B^H Y, (L, L), replicated
        small = 0.5 * (small + small.conj().T)
        nu = 1.2e-7 * jnp.real(jnp.trace(small))
        y_nu = to_cols(y + nu.astype(y.dtype) * b)
        eye = jnp.eye(lq, dtype=small.dtype)
        lc = jnp.linalg.cholesky(small + nu.astype(small.dtype) * eye)
        linv = jax.scipy.linalg.solve_triangular(lc, eye, lower=True)
        gy = dot3(y_nu, y_nu, conj_a=True)       # Y_nu^H Y_nu
        gy = 0.5 * (gy + gy.conj().T)
        m = jnp.matmul(jnp.matmul(linv, gy, precision=_HI),
                       linv.conj().T, precision=_HI)
        m = 0.5 * (m + m.conj().T)
        sig2, v = jnp.linalg.eigh(m)             # ascending
        sig2 = sig2[::-1].real
        v = v[:, ::-1]
        eigvals = jnp.clip(sig2 - nu, 0.0, None)
        inv_sig = jnp.where(
            sig2 > _WHITEN_CLIP * jnp.maximum(sig2[0], 1e-30),
            1.0 / jnp.sqrt(jnp.maximum(sig2, 1e-300)), 0.0)
        c = jnp.matmul(linv.conj().T,
                       v[:, :rank] * inv_sig[None, :rank].astype(v.dtype),
                       precision=_HI)            # (L, rank)
        u = jax.lax.dot_general(c.T, y_nu, _MIX_DIMS, precision=_HI)
        return eigvals, to_rows(u)

    y = matvec_all(to_rows(omega))
    for _ in range(power_iters):
        y = matvec_all(to_rows(orthonormalize(y)))
    q = orthonormalize(y)                 # col-sharded orthonormal basis
    gq = to_cols(matvec_all(to_rows(q)))  # one more matvec for Rayleigh-Ritz

    small = dot3(q, gq, conj_a=True)      # (L, L), psum-reduced, replicated
    small = 0.5 * (small + small.conj().T)
    eigvals, eigvecs = jnp.linalg.eigh(small)  # ascending
    eigvals = jnp.clip(eigvals[::-1].real, 0.0, None)
    top = eigvecs[:, ::-1][:, :rank]      # (L, rank)

    u = jax.lax.dot_general(top.T, q, _MIX_DIMS, precision=_HI)
    return eigvals, to_rows(u)


def _live_points(source_map) -> int:
    try:
        return int(np.sum(np.asarray(source_map) > 0))
    except (jax.errors.TracerArrayConversionError, TypeError):
        return -1


@functools.lru_cache(maxsize=None)
def _compiled_scalar_build(mesh, axis, n, rank, oversample, power_iters,
                           seed, compensated, method="rr"):
    row_s = NamedSharding(mesh, P(axis, None, None))
    col_s = NamedSharding(mesh, P(None, None, axis))
    l = rank + oversample

    def build(pupil, w, init_basis):
        sqrt_w = jnp.sqrt(w).astype(jnp.complex64)
        pupil = pupil.astype(jnp.complex64)
        pupil_fft = jnp.fft.fft2(pupil)
        r_fft = pupil_fft * jnp.conj(pupil_fft)

        key = jax.random.PRNGKey(seed)
        omega = (_random_probe_block(key, l, n) if init_basis is None
                 else _warm_omega(init_basis, l, n, key))

        def matvec_all(block):
            # row-sharded: each chip convolves its L/D probe rows
            return jax.lax.with_sharding_constraint(
                _gram_matvec(block, sqrt_w, r_fft), row_s)

        eigvals, u = _range_eigh_sharded(
            matvec_all, omega, rank=rank, power_iters=power_iters,
            compensated=compensated, row_s=row_s, col_s=col_s, method=method)
        basis = u  # Ritz basis of the iterated operator (conj(G)) for warm restarts
        # _gram_matvec applies conj(G); conjugate before synthesis — see the
        # conjugation note in ops/hopkins.randomized_socs.
        u = jnp.conj(u)
        synth = jax.lax.with_sharding_constraint(
            _synthesize_kernels(u, sqrt_w, pupil_fft), row_s)
        kernels = jnp.conj(synth)
        top_vals = eigvals[:rank]
        alive = top_vals > 1e-12 * jnp.maximum(eigvals[0], 1e-30)
        scale = jnp.where(
            alive, 1.0 / jnp.sqrt(jnp.where(alive, top_vals, 1.0)), 0.0)
        kernels = kernels * scale[:, None, None].astype(kernels.dtype)
        return kernels, top_vals.astype(jnp.float32), basis

    # None arguments (cold start / no rotation) are empty pytrees — jit
    # retraces on the warm/cold structure change without static marking.
    return jax.jit(build)


def randomized_socs_sharded(
    pupil: jnp.ndarray,
    source_map,
    config: OpticsConfig,
    mesh: Mesh,
    *,
    rank: int = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    compensated: bool = True,
    axis: str | None = None,
    init_basis=None,
    return_basis: bool = False,
    method: str = "rr",
) -> SOCSKernels:
    """Mesh-sharded :func:`..ops.hopkins.randomized_socs` (scalar Gram-side
    build): FFT matvecs split over probe rows, whitening/Rayleigh-Ritz
    matmuls split over image columns, layout changes riding ICI all_to_alls.
    Same math and probes as the local build at equal ``seed``; the returned
    kernels are rank-sharded over ``axis`` (default the mesh's 'source'
    axis) — exactly the layout :func:`.socs_sharded.socs_image_sharded`
    consumes. ``init_basis``/``return_basis`` mirror the local warm-start
    protocol (sharded and local bases are interchangeable);
    ``method='nystrom'`` mirrors the local Nystrom core (one fewer sharded
    block matvec per build)."""
    axis = _build_axis(mesh, axis)
    n = config.n
    w = jnp.asarray(source_map, jnp.float32)
    fn = _compiled_scalar_build(mesh, axis, n, rank, oversample, power_iters,
                                seed, compensated, method)
    kernels, vals, basis = fn(
        jnp.asarray(pupil), w,
        None if init_basis is None else jnp.asarray(init_basis, jnp.complex64))
    socs = SOCSKernels(kernels=kernels, eigenvalues=vals,
                       total_rank=_live_points(source_map))
    return (socs, basis) if return_basis else socs


@functools.lru_cache(maxsize=None)
def _compiled_components_build(mesh, axis, n, rank, oversample, power_iters,
                               seed, compensated, channels, method="rr"):
    row_s = NamedSharding(mesh, P(axis, None, None))
    col_s = NamedSharding(mesh, P(None, None, axis))
    l = rank + oversample

    def build(components, weights, w_rolled, init_basis, rotation):
        if rotation is not None:
            components, weights = apply_channel_rotation(
                components, weights, rotation)
        elif channels is not None:
            components, weights = compress_components(
                components, weights, channels)
        chats = jnp.fft.fft2(jnp.conj(components.astype(jnp.complex64)))
        q_vec = jnp.asarray(weights, jnp.float32).astype(jnp.complex64)

        def tcc_matvec(v):
            # batched over components with the SHARDED probe-row axis
            # leading — (B, C, n, n), unlike the local build's (C, B, n, n):
            # each chip runs all C components on its L/D rows, and the
            # leading batch layout keeps the FFT operands major-to-minor
            # monotonic (the CPU backend's fft thunk rejects the transposed
            # layout SPMD picks for a second-axis shard).
            vhat = jnp.fft.fft2(v)
            u = jnp.fft.ifft2(jnp.conj(chats)[None, :] * vhat[:, None])
            y = jnp.fft.fft2(w_rolled[None, None] * u)
            acc = jnp.sum(q_vec[None, :, None, None] * chats[None, :] * y,
                          axis=1)
            return jax.lax.with_sharding_constraint(
                jnp.fft.ifft2(acc), row_s)

        key = jax.random.PRNGKey(seed)
        omega = (_random_probe_block(key, l, n) if init_basis is None
                 else _warm_omega(init_basis, l, n, key))
        eigvals, u = _range_eigh_sharded(
            tcc_matvec, omega, rank=rank, power_iters=power_iters,
            compensated=compensated, row_s=row_s, col_s=col_s, method=method)
        # u rows are Ritz vectors of T itself (frequency plane, unit norm);
        # the kernel multiplying the mask spectrum is conj(phi_j).
        return jnp.conj(u), eigvals[:rank].astype(jnp.float32), u

    return jax.jit(build)


def randomized_socs_components_sharded(
    components: jnp.ndarray,
    weights,
    source_map,
    config: OpticsConfig,
    mesh: Mesh,
    *,
    rank: int = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    compensated: bool = True,
    axis: str | None = None,
    channels: int | str | None = None,
    channel_rotation=None,
    init_basis=None,
    return_basis: bool = False,
    method: str = "rr",
) -> SOCSKernels:
    """Mesh-sharded :func:`..ops.hopkins.randomized_socs_components`
    (frequency-side summed-TCC build — the vector/chromatic path): the
    2 + 2C FFTs per probe row shard over the mesh, the whitening and
    Rayleigh-Ritz contractions shard over image columns. ``channels`` /
    ``channel_rotation`` follow the local build's protocol (``"auto"``
    resolves host-side via :func:`..ops.hopkins.principal_channel_rotation`;
    a static int compresses under the jit)."""
    axis = _build_axis(mesh, axis)
    n = config.n
    if channel_rotation is None and channels == "auto":
        channel_rotation, _ = principal_channel_rotation(components, weights)
        channels = None
    if channels is not None:
        channels = int(channels)
    # the matvec's source coordinate is the physical shift; see the roll
    # note in ops/hopkins.randomized_socs_components
    w = jnp.roll(jnp.asarray(source_map, jnp.float32),
                 (-(n // 2), -(n // 2)), axis=(0, 1))
    fn = _compiled_components_build(mesh, axis, n, rank, oversample,
                                    power_iters, seed, compensated, channels,
                                    method)
    kernels, vals, basis = fn(
        jnp.asarray(components), jnp.asarray(weights, jnp.float32), w,
        None if init_basis is None else jnp.asarray(init_basis, jnp.complex64),
        None if channel_rotation is None else jnp.asarray(channel_rotation))
    socs = SOCSKernels(kernels=kernels, eigenvalues=vals,
                       total_rank=_live_points(source_map))
    return (socs, basis) if return_basis else socs
