"""Hopkins transmission-cross-coefficient (TCC) imaging via SOCS kernels.

The Abbe engine (:mod:`.abbe`) costs one padded iFFT per illuminated source
point — ~49.5k FFTs for a 1024^2 quadrupole. The Hopkins formulation
precomputes the source integral once into the TCC operator

    T(k, k') = sum_s w_s P(k - s) conj(P(k' - s)),

whose eigendecomposition (Cobb's Sum Of Coherent Systems) yields kernels
phi_j and weights lambda_j with

    I(x) = sum_j lambda_j |F(phi_j * M)(x)|^2     (exact at full rank).

A few tens of kernels carry essentially all the energy, so imaging cost drops
from #source-points FFTs to #kernels FFTs — the production fast path for
large masks and OPC-style workloads. (Reference: this solver does not exist
there; BASELINE.json config 5 requests it. Physics per Cobb 1998, cited in
reference README.md:24.)

TPU-native structure:

* :func:`tcc_eigensystem` (small/medium grids): the TCC is materialized only
  over the optical passband support D = {k : some source point passes light
  at k}, |D| ~ pi ((1 + sigma_out) n/4)^2; the build is one MXU matmul
  A^H A with A[s, d] = sqrt(w_s) P(k_d - s), then ``jnp.linalg.eigh``.
* :func:`randomized_socs` (any grid size): matrix-free randomized
  eigendecomposition of the source-side Gram operator, whose matvec is two
  n^2 FFTs thanks to the problem's exact circulant structure — no matrix is
  ever formed. This is the production path for 1024^2+ masks.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..xfer import to_device_complex, to_host_complex
from .abbe import source_points
from .compensated import rowdot3_compensated, rowdot_compensated
from .fourier import centered_ifft2, crop_center, pad_center
from .fraunhofer import separable_dft


@dataclasses.dataclass(frozen=True)
class SOCSKernels:
    """Truncated SOCS decomposition: (rank, n, n) complex kernels on the full
    sigma grid and their (rank,) real eigenvalues, sorted descending.

    Registered as a jax pytree so kernel sets flow through jit/vmap/shard_map
    (``total_rank`` is static metadata; -1 when built inside a trace)."""

    kernels: jnp.ndarray
    eigenvalues: jnp.ndarray
    total_rank: int = -1  # passband/source size the decomposition ran on

    @property
    def rank(self) -> int:
        return self.kernels.shape[0]


jax.tree_util.register_dataclass(
    SOCSKernels, data_fields=["kernels", "eigenvalues"], meta_fields=["total_rank"]
)


def passband_support(pupil: np.ndarray, shifts: np.ndarray) -> np.ndarray:
    """Boolean (n, n) union support of the pupil rolled to every source
    offset: frequencies outside it never pass light, so the TCC restricted
    to this set is exact."""
    n = pupil.shape[0]
    base = np.abs(np.asarray(pupil)) > 0
    iy, ix = np.nonzero(base)
    support = np.zeros((n, n), dtype=bool)
    for dy, dx in np.unique(shifts, axis=0):
        support[(iy + dy) % n, (ix + dx) % n] = True
    return support


def tcc_eigensystem(
    pupil: jnp.ndarray,
    source_map,
    config: OpticsConfig,
    *,
    rank: int | None = None,
    energy_tol: float = 1e-4,
    side: str = "auto",
    component_weights=None,
) -> SOCSKernels:
    """Build the passband-restricted TCC and eigendecompose it exactly.

    ``rank=None`` keeps every kernel with eigenvalue > energy_tol * max;
    ``rank=k`` keeps the top k. Eigenvalue units match the Abbe engine's
    unnormalized source-weight sum, so full-rank SOCS reproduces
    :func:`..ops.abbe.abbe_image` exactly.

    ``side`` picks which Gram matrix to eigendecompose — both give the same
    nonzero eigenpairs (T = A^H A and G = A A^H are isospectral):

    * ``"frequency"``: eigh the (D, D) TCC over the passband support —
      O(D^3), intractable beyond ~64^2 grids (D ~ pi (1.6 n/4)^2).
    * ``"source"``: eigh the (P, P) source-side Gram with P = #source
      points, then lift eigenvectors through A^H — O(P^2 D + P^3). Since
      rank(TCC) <= P << D for real illuminators, this makes the *exact*
      dense decomposition tractable at production grid sizes (128^2
      quadrupole: P ~ 1e3 vs D ~ 8e3).
    * ``"auto"`` (default): whichever side is smaller.

    Wide contractions use compensated (double-float) accumulation so the
    result is an fp64-grade oracle for the randomized path.

    VECTOR ORACLE: ``pupil`` may be a stacked (C, n, n) block of component
    pupils with ``component_weights`` (C,) — the decomposition then runs on
    the summed operator T = sum_i q_i A_i^H A_i (the same physics as
    :func:`randomized_socs_vector`, dense and exact), by stacking the
    per-component A blocks row-wise (rows scale by sqrt(q_i)).
    """
    n = config.n
    pts = source_points(np.asarray(source_map))
    pupil_np = to_host_complex(pupil)
    if pupil_np.ndim == 2:
        pupil_np = pupil_np[None]
    n_comp = pupil_np.shape[0]
    comp_w = (np.ones(n_comp) if component_weights is None
              else np.asarray(component_weights, np.float64))
    if comp_w.shape != (n_comp,):
        raise ValueError(
            f"component_weights shape {comp_w.shape} != ({n_comp},)")

    support = passband_support(
        np.max(np.abs(pupil_np), axis=0), pts.shifts)
    sup_idx = np.argwhere(support)  # (D, 2)
    d = len(sup_idx)
    p = n_comp * len(pts.shifts)
    if side == "auto":
        side = "source" if p < d else "frequency"

    # A[(i, s), d] = sqrt(q_i w_s) * C_i(k_d - s): gather with wraparound
    # (the integer sigma-grid shift invariant, same as the Abbe roll),
    # component blocks stacked row-wise.
    ky = (sup_idx[None, :, 0] - pts.shifts[:, None, 0]) % n  # (P, D)
    kx = (sup_idx[None, :, 1] - pts.shifts[:, None, 1]) % n
    sqrt_ws = jnp.sqrt(jnp.asarray(pts.weights, jnp.float32))[:, None]
    blocks = []
    for i in range(n_comp):
        block = to_device_complex(pupil_np[i][ky, kx])
        blocks.append(block * (np.sqrt(comp_w[i])
                               * sqrt_ws).astype(block.dtype))
    a = blocks[0] if n_comp == 1 else jnp.concatenate(blocks, axis=0)

    if side == "source":
        gram = rowdot_compensated(a, a, conj_b=True)  # (P, P) Hermitian PSD
        gram = 0.5 * (gram + gram.conj().T)
        eigvals, u = jnp.linalg.eigh(gram)  # ascending
        eigvals = eigvals[::-1]
        u = u[:, ::-1]
        limit = min(p, d)
    else:
        tcc = jnp.matmul(a.conj().T, a,
                         precision=jax.lax.Precision.HIGHEST)  # (D, D)
        eigvals, eigvecs = jnp.linalg.eigh(tcc)  # ascending
        eigvals = eigvals[::-1]
        eigvecs = eigvecs[:, ::-1]
        limit = d

    eigvals_np = np.asarray(eigvals)
    if rank is None:
        keep = int(np.sum(eigvals_np > energy_tol * max(eigvals_np[0], 1e-30)))
        keep = max(keep, 1)
    else:
        keep = min(rank, limit)

    if side == "source":
        # Lift source-side eigenvectors to frequency side: v_j = A^H u_j /
        # sqrt(lambda_j) (unit norm exactly for nonzero eigenvalues; dead
        # eigenvalues get a zero kernel, mirroring randomized_socs).
        lam = eigvals[:keep].real
        alive = lam > 1e-12 * jnp.maximum(eigvals[0].real, 1e-30)
        scale = jnp.where(alive,
                          1.0 / jnp.sqrt(jnp.where(alive, lam, 1.0)), 0.0)
        eigvecs = jnp.matmul(a.conj().T, u[:, :keep],
                             precision=jax.lax.Precision.HIGHEST)
        eigvecs = eigvecs * scale[None, :].astype(eigvecs.dtype)

    # I(x) = c^H T c with c = M . f_x, so each rank-1 term is
    # lambda_j |phi_j^H c|^2 = lambda_j |F(conj(phi_j) * M)|^2 — the kernel
    # applied to the mask spectrum is the CONJUGATE eigenvector.
    kernels = jnp.zeros((keep, n, n), dtype=a.dtype)
    kernels = kernels.at[:, sup_idx[:, 0], sup_idx[:, 1]].set(
        jnp.conj(eigvecs[:, :keep]).T)
    return SOCSKernels(
        kernels=kernels,
        eigenvalues=jnp.clip(eigvals[:keep].real, 0.0, None).astype(jnp.float32),
        total_rank=limit,
    )


def socs_image(
    spectrum: jnp.ndarray,
    socs: SOCSKernels,
    config: OpticsConfig,
    *,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    matmul_precision: str = "highest",
) -> jnp.ndarray:
    """Aerial image I = sum_j lambda_j |F(phi_j * M)|^2 (pre-postprocessing
    handled identically to the Abbe engine)."""
    from .abbe import (_intensity_windowed_int8, _postprocess_gau23,
                       resolve_engine)

    # Explicit engine names fail loudly rather than silently degrading
    # (ADVICE r1); 'auto' picks int8 on TPU. The int8 path reuses the Abbe
    # engine's Pallas limb kernels with the FULL (n, n) chirp as the
    # transform (SOCS kernels are centered, so there is no per-point window
    # to exploit): f32 row transform + fused int8 column/intensity kernel,
    # 1.15x the f32 'highest' engine (85 ms vs 98 ms, rank 128 at 1024^2 on
    # v5e) at 6e-7 normalized RMS. Gradients flow through
    # the f32 path via the kernels' custom VJP (ILT/OPC stay differentiable).
    explicit_int8 = engine in ("int8", "pallas", "int8_fast")
    engine = resolve_engine(engine,
                            allowed=("fft", "matmul", "int8", "int8_fast"))

    n = config.n
    fft_size = config.wavelength_scaling().fft_size
    if engine in ("int8", "int8_fast") and (solver != "gau23" or fft_size < n):
        if explicit_int8:  # fail loudly; only 'auto' reroutes (ADVICE r1)
            raise ValueError(
                "engine='int8' needs solver='gau23' with fft_size >= n "
                f"(got solver={solver!r}, fft_size={fft_size}, n={n})")
        engine = "matmul"  # auto: int8 needs the pure >=n chirp / gau23 path
    r = socs.rank
    pad = (-r) % chunk
    kernels = jnp.concatenate(
        [socs.kernels, jnp.zeros((pad, n, n), socs.kernels.dtype)]) if pad else socs.kernels
    lams = jnp.concatenate(
        [socs.eigenvalues, jnp.zeros((pad,), socs.eigenvalues.dtype)]) if pad else socs.eigenvalues

    kernels = kernels.reshape(-1, chunk, n, n)
    lams = lams.reshape(-1, chunk)

    if solver == "gau23" and engine in ("int8", "int8_fast"):
        from .abbe import _zoom_dft_kernel

        t_full = _zoom_dft_kernel(n, fft_size)
        t0r = jnp.asarray(t_full.real, jnp.float32)
        t0i = jnp.asarray(t_full.imag, jnp.float32)

    def body(acc, kl):
        ks, ls = kl
        prod = ks * spectrum[None]
        if solver == "gau23":
            if engine in ("int8", "int8_fast"):
                part = _intensity_windowed_int8(
                    prod, t0r, t0i, ls.astype(jnp.float32),
                    fast=engine == "int8_fast")
                return acc + part, None
            if engine == "matmul":
                from .abbe import _PRECISIONS, _zoom_dft_kernel
                t = jnp.asarray(_zoom_dft_kernel(n, fft_size), spectrum.dtype)
                prec = _PRECISIONS[matmul_precision]
                fields = jnp.einsum("ij,...jk->...ik", t, prod, precision=prec)
                fields = jnp.einsum("...ik,lk->...il", fields, t, precision=prec)
            else:
                fields = crop_center(centered_ifft2(pad_center(prod, fft_size)), n)
        else:
            fields = separable_dft(prod, config, sign=-1, dtype=spectrum.dtype)
        return acc + jnp.sum(ls[:, None, None] * jnp.abs(fields) ** 2, axis=0), None

    # vma seed: under shard_map the scan carry must share the inputs'
    # varying-manual-axes (see ops/abbe.py accumulate_intensity).
    real_dtype = jnp.real(spectrum).dtype
    seed = (jnp.real(spectrum[0, 0]) + lams[0, 0]
            + jnp.real(kernels[0, 0, 0, 0])) * 0
    init = jnp.zeros((n, n), dtype=real_dtype) + seed.astype(real_dtype)
    image, _ = jax.lax.scan(body, init, (kernels, lams))
    if solver == "gau23":
        image = _postprocess_gau23(image, config)
    return image


# ---------------------------------------------------------------------------
# Matrix-free randomized SOCS (the at-scale path)
# ---------------------------------------------------------------------------
#
# Write the Abbe sum as I = sum_s |F((sqrt(w_s) P(.-s)) M)|^2 and stack the
# shifted pupils into A[s, k] = sqrt(w_s) P(k - s). The TCC is T = A^H A
# (frequency side, |D| x |D|) but the *source-side* Gram matrix G = A A^H has
# the same nonzero spectrum and pure circulant structure:
#
#     G[s, s'] = sqrt(w_s w_s') R(s' - s),   R(t) = sum_u P(u + t) conj(P(u))
#
# R is one FFT autocorrelation of the pupil, and G's matvec is
# sqrt(w) * conv_R(sqrt(w) * v) — two n^2 FFTs, never a matrix. A randomized
# Hermitian eigensolver on G (subspace iteration + small dense eigh) gives the
# top eigenpairs, and the SOCS kernels come back through one convolution per
# kernel: phi_j = A^H u_j / sqrt(lambda_j). Everything wraps mod n, exactly
# like the engine's integer-roll invariant, so circular FFT convolutions are
# *exact* — this computes the same discrete decomposition as a dense eigh,
# at any grid size, in O((rank + oversample) * n^2 log n).


# Gram-whitening rank-deficiency clip, relative to the leading eigenvalue
# (of the SQUARED singular values): directions whose norm has collapsed
# below sqrt(clip) of the leading one carry only fp32 rounding noise —
# whitening would renormalize that noise to unit length and pollute the
# Rayleigh-Ritz basis, so they are zeroed instead.
_WHITEN_CLIP = 1e-12


def _cholesky_whiten_mat(gram: jnp.ndarray) -> jnp.ndarray:
    """Shifted-Cholesky whitening matrix L^-1 with gram + shift*I = L L^H
    (Fukaya et al. 2020). The eps*trace shift keeps cond(gram + sI) <= 1/eps
    so the factorization cannot break; the tiny triangular factor is
    inverted against I so callers apply ONE big MXU matmul (a triangular
    solve with a (L, n^2) RHS serializes and measures slower than eigh).
    Shared by the standard and lean builds — their parity depends on it."""
    gram = 0.5 * (gram + gram.conj().T)
    shift = (1.2e-7 * jnp.real(jnp.trace(gram))).astype(gram.dtype)
    lc = jnp.linalg.cholesky(
        gram + shift * jnp.eye(gram.shape[0], dtype=gram.dtype))
    return jax.scipy.linalg.solve_triangular(
        lc, jnp.eye(lc.shape[0], dtype=lc.dtype), lower=True)


def pupil_autocorrelation(pupil: jnp.ndarray) -> jnp.ndarray:
    """R(t) = sum_u P(u + t) conj(P(u)) with circular wraparound, via FFT."""
    f = jnp.fft.fft2(pupil)
    return jnp.fft.ifft2(f * jnp.conj(f))


def _gram_matvec(v, sqrt_w, r_fft):
    """G v for a block of source-grid vectors v: (..., n, n)."""
    x = sqrt_w * v
    conv = jnp.fft.ifft2(jnp.fft.fft2(x) * r_fft)
    return sqrt_w * conv


def _synthesize_kernels(u, sqrt_w, pupil_fft):
    """phi(k) = sum_s sqrt(w_s) u(s) conj(P(k - s)) for a block of source-
    space eigenvectors u: a circular correlation, via FFT.

    Source-space functions are stored at grid index s + n//2 (array center =
    zero shift). The Gram matvec is insensitive to that constant offset (G
    depends only on s - s'), but the synthesis convolution is not: the raw
    result comes out circularly shifted by n//2 on both axes, undone here.
    """
    n = u.shape[-1]
    x = sqrt_w * u
    # sum_s x(s) conj(P(k - s)) = conj( sum_s conj(x(s)) P(k - s) )
    conv = jnp.conj(jnp.fft.ifft2(jnp.fft.fft2(jnp.conj(x)) * pupil_fft))
    return jnp.roll(conv, (n // 2, n // 2), axis=(-2, -1))


def lean_auto(block_rows: int, n: int, *, hbm_budget: float = 12e9) -> bool:
    """Auto policy for the lean in-place SOCS build: the standard build's
    peak is ~2.1x the (block_rows, n, n) complex probe block (measured
    9.7 GB at rank 128 / 2048^2), so go lean only when that would not fit
    the HBM budget — the in-place loops serialize work the batched build
    overlaps, so lean costs ~2x the build time and is not a free default."""
    return 2.2 * block_rows * n * n * 8 > hbm_budget


def _warm_omega(init_basis, l: int, n: int, key) -> jnp.ndarray:
    """Probe block seeded from a previous build's Ritz basis (warm start):
    the converged subspace of a nearby operator (adjacent focal plane, or
    the same operator at a smaller rank) is a near-perfect starting range,
    so callers can cut ``power_iters`` to 0-1 at unchanged accuracy. Rows
    beyond the warm basis are topped up with fresh random probes."""
    init_basis = jnp.asarray(init_basis, jnp.complex64)
    fresh = l - init_basis.shape[0]
    if fresh <= 0:
        return init_basis[:l]
    return jnp.concatenate([init_basis, _random_probe_block(key, fresh, n)])


def _randomized_range_eigh(
    matvec_all,
    omega: jnp.ndarray,
    *,
    rank: int,
    power_iters: int,
    compensated: bool,
    krylov: bool,
    method: str = "rr",
):
    """Shared core of the randomized SOCS builds: block subspace (or
    block-Krylov) iteration with CholQR2-style Gram whitening, then
    Rayleigh-Ritz (``method='rr'``) or the fixed-rank PSD Nystrom
    approximation (``method='nystrom'``). ``matvec_all`` applies the
    Hermitian PSD target operator to an (L, n, n) block; ``omega`` is the
    starting probe block.

    Returns ``(eigvals, u)``: the Ritz eigenvalues of the FULL basis, sorted
    descending and clipped at 0, and the top-``rank`` Ritz vectors
    ``u = top^T q`` as a (rank, n, n) block (NOT conjugated — callers own
    the operator's conjugation convention)."""
    if method not in ("rr", "nystrom"):
        raise ValueError(f"unknown randomized-eigh method {method!r} "
                         "(expected 'rr' or 'nystrom')")
    n = omega.shape[-1]

    hi = jax.lax.Precision.HIGHEST  # TPU matmuls default to bf16 passes

    def wide_rowdot(x, y, conj_a=False, conj_b=False):
        # op(x) @ op(y).T without materializing a transpose (the (L, n^2)
        # operands are GBs at 2048^2 — transposed copies of them OOM HBM)
        if compensated:
            return rowdot_compensated(x, y, conj_a=conj_a, conj_b=conj_b)
        if conj_a:
            x = jnp.conj(x)
        if conj_b:
            y = jnp.conj(y)
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), precision=hi)

    def orthonormalize(block):
        # Tall-skinny orthonormalization via Gram whitening: Householder QR
        # of an (n^2, L) complex matrix is pathologically slow on TPU, while
        # the (L, L) Gram matmul rides the MXU and its eigh is tiny. Small
        # eigenvalues are clipped, which also handles rank deficiency.
        b = block.shape[0]
        flat = block.reshape(b, -1)  # (L, n^2), rows are vectors

        def whiten_once_eigh(f):
            # Eigh-clip whitening: tiny eigenvalues are clipped, handling
            # arbitrary rank deficiency (the krylov sandwich feeds nearly
            # dead projected residuals through here).
            gram = wide_rowdot(f, f, conj_b=True)
            gram = 0.5 * (gram + gram.conj().T)
            s, v = jnp.linalg.eigh(gram)
            inv_sqrt = jnp.where(
                s > _WHITEN_CLIP * jnp.max(s), 1.0 / jnp.sqrt(jnp.abs(s)), 0.0)
            whiten = jnp.matmul(v * inv_sqrt[None, :], v.conj().T, precision=hi)
            return jnp.matmul(whiten, f, precision=hi)

        def whiten_once_chol(f):
            # Shifted Cholesky whitening (see _cholesky_whiten_mat): the
            # 272^2 eigh costs ~65 ms per whiten on v5e (~30% of the whole
            # build across 7 calls) where cholesky is ~free; images agree
            # with the eigh-clip build to ~1e-7 at 1024^2 rank 256
            # (measured).
            gram = wide_rowdot(f, f, conj_b=True)
            return jnp.matmul(_cholesky_whiten_mat(gram), f, precision=hi)

        whiten_once = whiten_once_eigh if krylov else whiten_once_chol
        # Two passes (CholQR2-style): one whitening squares the condition
        # number in fp32; the second restores orthogonality to ~machine eps.
        return whiten_once(whiten_once(flat)).reshape(b, n, n)

    def project_out(block, basis_blocks):
        # Block Gram-Schmidt pass: remove the span of every earlier Krylov
        # block. Later blocks converge toward the same dominant eigenspace,
        # so WITHOUT this the concatenated basis has condition number far
        # beyond what fp32 Gram whitening survives (cond^2 < 1/eps).
        flat = block.reshape(block.shape[0], -1)
        for qb in basis_blocks:
            qf = qb.reshape(qb.shape[0], -1)
            coef = (rowdot_compensated(qf, flat, conj_a=True) if compensated
                    else jax.lax.dot_general(
                        jnp.conj(qf), flat, (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
            flat = flat - jnp.matmul(coef.T, qf,
                                     precision=jax.lax.Precision.HIGHEST)
        return flat.reshape(block.shape)

    if method == "nystrom":
        # Fixed-rank PSD Nystrom (Tropp et al. 2017, shifted for Cholesky
        # stability): basis B from `power_iters` whitened subspace
        # iterations, ONE further application Y = G B, and the approximation
        # G ~ Y_nu S_nu^-1 Y_nu^H with S_nu = B^H Y_nu = B^H Y + nu I.
        # ONE FEWER block matvec than Rayleigh-Ritz at matched power_iters
        # (the RR projection needs its own G q), and the approximation
        # error contracts ~quadratically in the basis residual where RR's
        # is linear — measured at the randomized-truncation floor already
        # at power_iters=1 on the production TCC spectra. Everything big
        # stays (L, n^2): the factor F = Y_nu L^-H is never materialized
        # (its Gram is reconstructed as L^-1 (Y_nu^H Y_nu) L^-H).
        if krylov:
            raise ValueError("method='nystrom' is incompatible with "
                             "krylov=True (use the RR core)")
        b = orthonormalize(omega)
        for _ in range(power_iters):
            b = orthonormalize(matvec_all(b))
        y = matvec_all(b)
        lq = b.shape[0]
        bf = b.reshape(lq, -1)
        yf = y.reshape(lq, -1)
        small = wide_rowdot(bf, yf, conj_a=True)          # B^H Y, (L, L)
        small = 0.5 * (small + small.conj().T)
        nu = 1.2e-7 * jnp.real(jnp.trace(small))
        y_nu = yf + nu.astype(yf.dtype) * bf              # Y + nu B
        eye = jnp.eye(lq, dtype=small.dtype)
        lc = jnp.linalg.cholesky(small + nu.astype(small.dtype) * eye)
        linv = jax.scipy.linalg.solve_triangular(lc, eye, lower=True)
        gy = wide_rowdot(y_nu, y_nu, conj_a=True)         # Y_nu^H Y_nu
        gy = 0.5 * (gy + gy.conj().T)
        m = jnp.matmul(jnp.matmul(linv, gy, precision=hi),
                       linv.conj().T, precision=hi)       # F^H F, (L, L)
        m = 0.5 * (m + m.conj().T)
        sig2, v = jnp.linalg.eigh(m)                      # ascending
        sig2 = sig2[::-1].real
        v = v[:, ::-1]
        eigvals = jnp.clip(sig2 - nu, 0.0, None)
        # eigvecs of G: U = F V Sigma^-1 = Y_nu (L^-H V Sigma^-1); dead
        # directions (collapsed singular values) get zero vectors, mirroring
        # the whitening clip.
        inv_sig = jnp.where(sig2 > _WHITEN_CLIP * jnp.maximum(sig2[0], 1e-30),
                            1.0 / jnp.sqrt(jnp.maximum(sig2, 1e-300)), 0.0)
        c = jnp.matmul(linv.conj().T,
                       v[:, :rank] * inv_sig[None, :rank].astype(v.dtype),
                       precision=hi)                      # (L, rank)
        u = jnp.matmul(c.T, y_nu, precision=hi).reshape(rank, n, n)
        return eigvals, u

    if krylov:
        # Block-Krylov: Rayleigh-Ritz over ALL iterates [Q_0, G Q_0, ...,
        # G^q Q_0] (Musco & Musco 2015). Same matvec count as subspace
        # iteration, (q+1)x the basis — and convergence on clustered TCC
        # tails that plain iteration cannot reach in fp32.
        #
        # Orthogonalization is the project -> whiten -> project -> whiten
        # sandwich: the projected residual of a converging block is tiny and
        # internally ill-conditioned, so the first whiten re-amplifies
        # projection rounding along earlier blocks by 1/sigma_min; the
        # second projection removes that at O(1) scale (plain BCGS2-then-
        # whiten loses orthogonality here at the 1e-3 level, which corrupts
        # leading Rayleigh-Ritz eigenvalues at ~1e-4 relative).
        blocks = [orthonormalize(omega)]
        for _ in range(power_iters):
            y = matvec_all(blocks[-1])
            # Noise-floor guard: the genuinely-new Krylov content of a block
            # decays with the spectrum tail each iteration; once a projected
            # residual direction falls below ~1e-5 of the block's strongest
            # direction it is fp32 projection noise, and whitening would
            # promote that noise to a unit basis vector whose Rayleigh
            # quotient can land anywhere in the spectrum — corrupting even
            # the LEADING eigenpairs. Zero such directions instead (zero
            # basis rows are inert through whitening, Rayleigh-Ritz, and
            # kernel synthesis).
            y_energy = jnp.sum(jnp.abs(y.reshape(y.shape[0], -1)) ** 2, axis=1)
            r = project_out(y, blocks)
            energy = jnp.sum(jnp.abs(r.reshape(r.shape[0], -1)) ** 2, axis=1)
            # reference is the PRE-projection scale: if the whole residual
            # block is noise, a residual-relative threshold would keep the
            # loudest noise
            keep = energy > 1e-10 * jnp.maximum(jnp.max(y_energy), 1e-30)
            r = r * keep[:, None, None].astype(r.dtype)
            y = orthonormalize(r)
            blocks.append(orthonormalize(project_out(y, blocks)))
        q = jnp.concatenate(blocks, axis=0)
        # Final joint polish: blocks are now mutually orthogonal to ~fp32
        # eps, so the joint Gram is ~I and one whitening pass is stable.
        q = orthonormalize(q)
    else:
        y = matvec_all(omega)
        for _ in range(power_iters):
            y = orthonormalize(y)
            y = matvec_all(y)
        q = orthonormalize(y)  # (L, n, n) orthonormal basis of the range

    lq = q.shape[0]  # L, or L * (power_iters + 1) on the Krylov path
    gq = matvec_all(q)
    if compensated:
        small = rowdot_compensated(q.reshape(lq, -1), gq.reshape(lq, -1),
                                   conj_a=True)  # (L, L)
    else:
        small = jax.lax.dot_general(
            q.reshape(lq, -1).conj(), gq.reshape(lq, -1),
            (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST)
    small = 0.5 * (small + small.conj().T)
    eigvals, eigvecs = jnp.linalg.eigh(small)  # ascending
    eigvals = jnp.clip(eigvals[::-1].real, 0.0, None)
    eigvecs = eigvecs[:, ::-1]

    top = eigvecs[:, :rank]  # (L, rank)
    u = jnp.tensordot(top.T, q, axes=1,
                      precision=jax.lax.Precision.HIGHEST)  # (rank, n, n)
    return eigvals, u


def randomized_socs(
    pupil: jnp.ndarray,
    source_map,
    config: OpticsConfig,
    *,
    rank: int | str = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    probe_chunk: int | None | str = "auto",
    compensated: bool = True,
    krylov: bool = False,
    lean: bool | str = "auto",
    init_basis=None,
    return_basis: bool = False,
    method: str = "rr",
    tolerance: float | None = None,
    spectrum=None,
) -> SOCSKernels:
    """Top-``rank`` SOCS kernels via matrix-free randomized eigendecomposition
    of the source-side Gram operator. Exact circulant structure; accuracy set
    by ``power_iters``/``oversample``. Scales to arbitrarily fine grids.

    ``method='nystrom'`` swaps the Rayleigh-Ritz projection for the
    fixed-rank PSD Nystrom core (see :func:`_randomized_range_eigh`): one
    fewer block matvec per build — the matvecs are the FFT-bound stage —
    with error that contracts ~quadratically (vs linearly) in the subspace
    residual. Not supported by the lean or krylov builds.

    ``compensated=True`` (default) computes the K = n^2 contractions of the
    whitening Gram and the Rayleigh-Ritz projection with double-float
    cross-chunk accumulation (:func:`..ops.compensated.matmul_compensated`),
    removing the plain-fp32 eps*sqrt(K) accumulation floor (~5e-5 relative
    image error). Same MXU FLOPs; only kernel-build time is affected.

    ``krylov=True`` does Rayleigh-Ritz on the full block-Krylov subspace
    [Omega, G Omega, ..., G^q Omega] (Musco & Musco 2015) instead of the last
    iterate only — far faster convergence on the slowly-decaying TCC tail
    (randomized-vs-dense image agreement ~1e-6 at matched rank instead of
    ~1e-5), at (power_iters + 1)x the probe-field memory. Default off: the
    plain subspace iteration is the at-scale production path.

    ``lean`` routes to the single-block-peak in-place build (see
    :func:`_randomized_socs_lean`): ~1x the probe-block memory instead of
    ~2x, which is what admits rank 256 at 2048^2 inside 15.75 GB HBM.
    ``"auto"`` engages lean only when ~2.2x the (rank + oversample, n, n)
    complex probe block would exceed the ~12 GB HBM budget (see
    :func:`lean_auto`) — e.g. rank 256 at 2048^2, but NOT rank 128 there;
    lean costs ~2x the build time, so it is never a free default (krylov
    has no lean variant).

    ``init_basis`` warm-starts the subspace iteration from a previous
    build's Ritz basis (see :func:`_warm_omega`; get one by passing
    ``return_basis=True``, which makes this return ``(socs, basis)``).
    Adjacent focal planes / grown ranks converge from a warm basis with
    ``power_iters=0`` at full accuracy (tests/test_hopkins.py).

    ``rank='auto'`` (or a ``tolerance``) delegates to the host-side
    :func:`auto_rank_socs` doubling loop: energy-targeted for ``'auto'``
    alone, or error-budgeted — smallest rank whose rigorous
    :func:`socs_image_nrms_bound` meets ``tolerance`` for the mask whose
    ``spectrum`` is supplied. Host-side only (the selected rank is
    data-dependent); under jit pass a static int rank instead."""
    if rank == "auto" or tolerance is not None:
        if isinstance(pupil, jax.core.Tracer) or isinstance(
                jnp.asarray(source_map), jax.core.Tracer):
            raise ValueError(
                "rank='auto'/tolerance= select a data-dependent rank and "
                "cannot run under jit; pass a static int rank instead")
        if init_basis is not None or return_basis:
            raise ValueError("rank='auto' does not compose with warm-start "
                             "bases; call auto_rank_socs directly")
        return auto_rank_socs(
            pupil, source_map, config, tolerance=tolerance,
            spectrum=spectrum, oversample=oversample,
            power_iters=power_iters, seed=seed, probe_chunk=probe_chunk,
            compensated=compensated, krylov=krylov, lean=lean, method=method)
    rank = int(rank)
    n = config.n
    if lean == "auto":
        lean = lean_auto(rank + oversample, n) and not krylov \
            and init_basis is None and not return_basis \
            and method == "rr"
    if lean:
        if krylov:
            raise ValueError("krylov=True has no lean-memory variant")
        if method != "rr":
            raise ValueError(f"method={method!r} has no lean-memory variant")
        if init_basis is not None or return_basis:
            raise ValueError("warm-start basis is not supported by the "
                             "lean build (pass lean=False)")
        return _randomized_socs_lean(
            pupil, source_map, config, rank=rank, oversample=oversample,
            power_iters=power_iters, seed=seed, compensated=compensated)
    if probe_chunk == "auto":
        probe_chunk = 8 if n >= 2048 else None
    w = jnp.asarray(source_map, jnp.float32)
    sqrt_w = jnp.sqrt(w).astype(jnp.complex64)
    pupil = to_device_complex(pupil).astype(jnp.complex64)

    pupil_fft = jnp.fft.fft2(pupil)
    r_fft = pupil_fft * jnp.conj(pupil_fft)  # FFT of the autocorrelation

    l = rank + oversample
    key = jax.random.PRNGKey(seed)
    if init_basis is None:
        omega = _random_probe_block(key, l, n)
    else:
        # the basis fed back is a Ritz basis of THIS operator (conj(G), see
        # the conjugation note below) — pass it through un-conjugated
        omega = _warm_omega(init_basis, l, n, key)

    def matvec_all(block):
        b = block.shape[0]
        if probe_chunk is None or b % probe_chunk:
            return _gram_matvec(block, sqrt_w, r_fft)
        chunked = block.reshape(b // probe_chunk, probe_chunk, n, n)
        out = jax.lax.map(lambda c: _gram_matvec(c, sqrt_w, r_fft), chunked)
        return out.reshape(b, n, n)

    eigvals, u = _randomized_range_eigh(
        matvec_all, omega, rank=rank, power_iters=power_iters,
        compensated=compensated, krylov=krylov, method=method)
    basis = u  # Ritz basis of the iterated operator, for warm restarts
    # _gram_matvec convolves with R(s - s') where G's true entry is
    # conj(R(s - s')) = R(s' - s): it applies conj(G). conj(G) shares G's
    # (real) spectrum and its eigenvectors are the conjugates of G's, so
    # conjugate here before synthesizing kernels.
    u = jnp.conj(u)

    # Store conj(phi_j) = conj(A^H u_j)/sqrt(lambda_j): the kernel that
    # multiplies the mask spectrum (see tcc_eigensystem's conjugation note).
    if probe_chunk is not None and rank % probe_chunk == 0:
        synth = jax.lax.map(
            lambda c: _synthesize_kernels(c, sqrt_w, pupil_fft),
            u.reshape(rank // probe_chunk, probe_chunk, n, n),
        ).reshape(rank, n, n)
    else:
        synth = _synthesize_kernels(u, sqrt_w, pupil_fft)
    kernels = jnp.conj(synth)
    top_vals = eigvals[:rank]
    # Zero (or numerically dead) eigenvalues get a zero kernel, not a
    # 1/sqrt(0) blow-up — their lambda * |field|^2 term would be 0 * inf.
    alive = top_vals > 1e-12 * jnp.maximum(eigvals[0], 1e-30)
    scale = jnp.where(alive, 1.0 / jnp.sqrt(jnp.where(alive, top_vals, 1.0)), 0.0)
    kernels = kernels * scale[:, None, None].astype(kernels.dtype)
    try:
        live = int(np.asarray(jnp.sum(w > 0)))  # concrete outside traces
    except jax.errors.TracerArrayConversionError:
        live = -1
    socs = SOCSKernels(
        kernels=kernels,
        eigenvalues=eigvals[:rank].astype(jnp.float32),
        total_rank=live,
    )
    return (socs, basis) if return_basis else socs


# ---------------------------------------------------------------------------
# Polarized / vector SOCS (frequency-side summed-TCC build)
# ---------------------------------------------------------------------------


def randomized_socs_vector(
    pupil: jnp.ndarray,
    source_map,
    config: OpticsConfig,
    *,
    polarization="unpolarized",
    apodize: bool = True,
    rank: int = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    probe_chunk: int | None | str = "auto",
    compensated: bool = True,
    krylov: bool = False,
    init_basis=None,
    return_basis: bool = False,
    channels: int | str | None = None,
    channel_rotation=None,
    method: str = "rr",
) -> SOCSKernels:
    """Polarized (vector/high-NA) SOCS kernels: ONE kernel set carrying the
    full Jones-pupil physics, drop-in for every scalar-SOCS consumer.

    The vector aerial image is an incoherent sum over wafer-plane field
    components c in {x, y, z} and polarization states p of scalar Abbe
    images through the component pupils C_i = (V . J_p)_c * P
    (:mod:`.vector`; scalar pupil reference ``pupil.py:102-111``
    generalized). Each component has a TCC T_i = A_i^H A_i with
    A_i[s, k] = sqrt(w_s) C_i(k - s), and every component's intensity is a
    quadratic form in the SAME mask-spectrum vector c_x, so

        I(x) = sum_i q_i c_x^H T_i c_x = c_x^H T c_x,  T = sum_i q_i T_i :

    one eigendecomposition of the SUMMED operator yields kernels that flow
    through :func:`socs_image`, the tiled full-chip path, metrology, OPC and
    serving unchanged — full-chip vector imaging at scalar imaging cost, and
    rank r spent on the joint spectrum (strictly better than r kernels per
    component).

    Matrix-free, frequency side: unlike the scalar build (which iterates the
    source-side Gram because sums of per-component Grams are NOT isospectral
    to sums of TCCs), this iterates T itself. With chat_i = fft2(conj(C_i)),

        T v = ifft2( sum_i q_i chat_i * fft2( w * ifft2( conj(chat_i) *
              fft2(v) ) ) ),

    i.e. 2 FFTs per component per block plus 2 shared — exact circulant
    wraparound, no matrix ever formed. Eigenvectors land directly in the
    frequency plane: kernels are their conjugates (unit norm; no synthesis
    step and no 1/sqrt(lambda) scaling). Identically-zero components (e.g.
    cross-pol and z as NA -> 0) are dropped host-side before tracing.

    Build cost is ~(1 + #components)/3 x the scalar build's matvec stage
    (whitening/Rayleigh-Ritz costs are identical); unpolarized runs 6
    components, a single Jones state 3. ``channels`` / ``channel_rotation``
    first compress the stack to its principal channels (exact unitary
    mixing + trace-bounded truncation — see
    :func:`randomized_socs_components`): at moderate NA the 5 deduped
    unpolarized components carry their energy in 2-3 channels.
    """
    components, q = vector_component_stack(
        pupil, config, polarization=polarization, apodize=apodize)
    return randomized_socs_components(
        components, q, source_map, config, rank=rank, oversample=oversample,
        power_iters=power_iters, seed=seed, probe_chunk=probe_chunk,
        compensated=compensated, krylov=krylov, init_basis=init_basis,
        return_basis=return_basis, channels=channels,
        channel_rotation=channel_rotation, method=method)


def vector_component_stack(pupil, config: OpticsConfig, *,
                           polarization="unpolarized", apodize: bool = True):
    """(C, n, n) deduped Jones-pupil component stack + (C,) weights of the
    vector summed-TCC operator — the front half of
    :func:`randomized_socs_vector`, exposed for channel analysis
    (:func:`channel_gram` / :func:`principal_channel_rotation`). Its channel
    Gram is independent of phase-only aberrations in ``pupil`` (it sees only
    |P| = disk x apodization), so one principal-channel rotation serves
    every aberration and defocus at a given (config, polarization)."""
    pupil = to_device_complex(pupil).astype(jnp.complex64)
    factor_list = dedup_polarization_factors(config, polarization,
                                             apodize=apodize)
    components = jnp.stack([
        jnp.asarray(f, jnp.complex64) * pupil for _, f in factor_list])
    q = jnp.asarray([q for q, _ in factor_list], jnp.float32)
    return components, q


def dedup_polarization_factors(config: OpticsConfig, polarization, *,
                               apodize: bool = True) -> list:
    """DISTINCT vector component factors with summed weights, host-side.

    Identical factors yield identical per-component TCCs, so duplicates fold
    into one matvec term. (For unpolarized illumination the
    cross-polarization factors coincide — V[0,1] = V[1,0] =
    t_x t_y + gamma r_x r_y — so 6 components reduce to 5: a 17% matvec
    saving, exact.) Returns a list of [summed weight, (n, n) complex numpy
    factor] pairs."""
    from .vector import component_factors, polarization_states

    factor_list: list = []
    for weight, jones in polarization_states(polarization):
        factors = component_factors(config, jones, apodize=apodize)
        for c in range(3):
            if np.abs(factors[c]).max() <= 1e-12:
                continue  # identically dark component (scalar limit etc.)
            for entry in factor_list:
                if np.array_equal(entry[1], factors[c]):
                    entry[0] += float(weight)
                    break
            else:
                factor_list.append([float(weight), factors[c]])
    return factor_list


DEFAULT_CHANNEL_TOL = 1e-6


def channel_gram(components, weights) -> jnp.ndarray:
    """(C, C) Hermitian channel Gram S = sum_k x(k) x(k)^H of the weighted
    component stack x_i(k) = sqrt(q_i) C_i(k).

    The summed TCC T = sum_i q_i T_i depends on the stack only through the
    frequency-wise outer products x(k) x(k)^H (its kernel is
    M(a, b) = x(a)^H x(b)), so trace(T) = (sum_s w_s) * trace(S) and the
    eigenspectrum of S is the exact energy budget of principal-channel
    compression (:func:`principal_channel_rotation`). Jit-traceable;
    returned as a (2, C, C) float32 real/imag pair (complex arrays cannot
    cross the TPU-tunnel host boundary)."""
    c = components.shape[0]
    x = (components.astype(jnp.complex64)
         * jnp.sqrt(jnp.asarray(weights, jnp.float32)
                    ).astype(jnp.complex64)[:, None, None])
    xm = x.reshape(c, -1)
    s = jnp.matmul(xm, xm.conj().T, precision=_HI)
    return jnp.stack([s.real, s.imag]).astype(jnp.float32)


def principal_channel_rotation(components, weights, *,
                               channels: int | None = None,
                               tol: float = DEFAULT_CHANNEL_TOL):
    """Host-side principal-channel rotation of a weighted component stack.

    T is invariant under any unitary mixing U of the weighted components
    x(k) -> U^H x(k) (M(a, b) = x(a)^H U U^H x(b) = x(a)^H x(b)), so
    rotating to the eigenbasis of the channel Gram S and KEEPING only the
    top K channels approximates T with trace error exactly
    (sum_s w_s) * (dropped eigenvalue sum) — SOCS-style truncation on the
    CHANNEL axis, bought before any subspace iteration. ``channels`` picks K
    directly; otherwise the smallest K capturing >= 1 - tol of trace(S).

    Returns ``(rotation, captured)``: a (2, C, K) float32 real/imag pair
    (tunnel-transfer-safe, exactly isometric — eigh runs in float64 on the
    host) for :func:`randomized_socs_components`'s ``channel_rotation``
    argument, and the captured trace fraction. Outside jit only (the
    channel count is data-dependent); under jit pass a static ``channels``
    int instead."""
    try:
        s_pair = np.asarray(channel_gram(components, weights))
    except jax.errors.TracerArrayConversionError as exc:
        raise ValueError(
            "principal_channel_rotation needs concrete components (it picks "
            "a data-dependent channel count); under jit pass channels=<int> "
            "to the build instead") from exc
    return rotation_from_gram(s_pair, channels=channels, tol=tol)


def rotation_from_gram(s_pair: np.ndarray, *, channels: int | None = None,
                       tol: float = DEFAULT_CHANNEL_TOL):
    """Principal-channel rotation from a precomputed (2, C, C) channel-Gram
    real/imag pair (:func:`channel_gram` output, already host-side): the
    back half of :func:`principal_channel_rotation`, for callers that must
    run the Gram under jit (the TPU tunnel forbids eager complex math) and
    the eigendecomposition on the host."""
    s_pair = np.asarray(s_pair)
    s = (s_pair[0] + 1j * s_pair[1]).astype(np.complex128)
    evals, evecs = np.linalg.eigh(s)  # ascending
    evals, evecs = evals[::-1], evecs[:, ::-1]
    total = float(evals.sum())
    if channels is None:
        if total <= 0:
            channels = len(evals)
        else:
            cum = np.cumsum(evals)
            channels = int(np.searchsorted(cum, (1.0 - tol) * total) + 1)
    channels = max(1, min(len(evals), int(channels)))
    u = evecs[:, :channels]
    captured = (float(evals[:channels].sum()) / total) if total > 0 else 1.0
    return np.stack([u.real, u.imag]).astype(np.float32), captured


def apply_channel_rotation(components, weights, rotation):
    """Project the weighted component stack onto a channel isometry: returns
    the (K, n, n) rotated stack y_j(k) = sum_i U*_ij sqrt(q_i) C_i(k) with
    unit weights (the sqrt(q) are absorbed). ``rotation`` is (C, K) complex
    or a (2, C, K) float32 real/imag pair. Jit-traceable."""
    rot = jnp.asarray(rotation)
    if rot.ndim == 3:
        rot = (rot[0] + 1j * rot[1])
    rot = rot.astype(jnp.complex64)
    c, n, _ = components.shape
    x = (components.astype(jnp.complex64)
         * jnp.sqrt(jnp.asarray(weights, jnp.float32)
                    ).astype(jnp.complex64)[:, None, None]).reshape(c, -1)
    y = jnp.matmul(rot.conj().T, x, precision=_HI).reshape(-1, n, n)
    return y, jnp.ones((rot.shape[1],), jnp.float32)


def compress_components(components, weights, channels: int):
    """Jit-traceable principal-channel compression to a STATIC channel
    count: channel Gram -> device eigh -> top-``channels`` rotation. TPU's
    eigh runs reduced-precision matmuls, so the rotation gets one Newton
    unitarity polish U <- U (3I - U^H U)/2 (a non-isometric U would perturb
    T rather than merely truncate it); the rotation is stop_gradient'ed so
    differentiating a build w.r.t. aberrations treats the mixing as frozen
    (exact for the kept subspace)."""
    c, n, _ = components.shape
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if channels >= c:
        return (components.astype(jnp.complex64),
                jnp.asarray(weights, jnp.float32))
    x = (components.astype(jnp.complex64)
         * jnp.sqrt(jnp.asarray(weights, jnp.float32)
                    ).astype(jnp.complex64)[:, None, None]).reshape(c, -1)
    s = jnp.matmul(x, x.conj().T, precision=_HI)
    _, v = jnp.linalg.eigh(s)  # ascending
    u = v[:, ::-1][:, :channels]
    eye = jnp.eye(channels, dtype=u.dtype)
    u = jnp.matmul(
        u, 1.5 * eye - 0.5 * jnp.matmul(u.conj().T, u, precision=_HI),
        precision=_HI)
    u = jax.lax.stop_gradient(u)
    y = jnp.matmul(u.conj().T, x, precision=_HI).reshape(channels, n, n)
    return y, jnp.ones((channels,), jnp.float32)


def randomized_socs_components(
    components: jnp.ndarray,
    weights,
    source_map,
    config: OpticsConfig,
    *,
    rank: int = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    probe_chunk: int | None | str = "auto",
    compensated: bool = True,
    krylov: bool = False,
    init_basis=None,
    return_basis: bool = False,
    channels: int | str | None = None,
    channel_rotation=None,
    method: str = "rr",
) -> SOCSKernels:
    """Summed-TCC SOCS kernels for ANY weighted stack of component pupils.

    ``components`` is a (C, n, n) complex stack of effective pupils C_i and
    ``weights`` their (C,) non-negative incoherent weights q_i: the build
    eigendecomposes T = sum_i q_i T_i with T_i the TCC of C_i, producing
    one kernel set whose quadratic form is the weighted incoherent sum of
    the per-component images. Instances of this pattern:

    - vector/high-NA polarization (:func:`randomized_socs_vector` — the
      C_i are Jones-pupil components);
    - chromatic/finite laser bandwidth (:func:`randomized_socs_chromatic`
      — the C_i are the pupil at sampled chromatic focus offsets, q_i the
      laser spectrum);
    - both at once (the product set of polarization x focus components).

    Same matrix-free frequency-side subspace iteration as the vector build
    (2 shared + 2C FFTs per block vector); kernels flow through every
    scalar-SOCS consumer unchanged.

    The matvec cost is linear in C, so the build first compresses the stack
    to its principal channels when asked: ``channel_rotation`` applies a
    precomputed isometry (:func:`principal_channel_rotation` — the
    production path: host-side eigh, K picked by trace tolerance, passed
    into the jitted build as a float pair); ``channels`` is a static count
    for the pure-jit path (int, device eigh via
    :func:`compress_components`) or ``"auto"`` (host-side selection at
    DEFAULT_CHANNEL_TOL, outside jit only). Nearly-parallel component
    stacks — narrow laser spectra, low-NA vector factors — collapse to
    1-3 channels at 1e-6 trace error, cutting the matvec toward scalar
    cost."""
    n = config.n
    if channel_rotation is None and channels == "auto":
        channel_rotation, _ = principal_channel_rotation(components, weights)
        channels = None
    if channel_rotation is not None:
        components, weights = apply_channel_rotation(
            components, weights, channel_rotation)
    elif channels is not None:
        components, weights = compress_components(
            components, weights, int(channels))
    if probe_chunk == "auto":
        # The frequency-side matvec keeps more live block-sized temporaries
        # than the scalar Gram matvec (the batched (C, chunk, n, n)
        # component stack plus the Fourier accumulator), so chunk earlier
        # and smaller: unchunked rank 256 at 1024^2 peaked at 23.5 GB
        # (OOM); chunked it fits easily.
        probe_chunk = 4 if n >= 2048 else (8 if n >= 1024 else None)
    # The matvec's source coordinate IS the physical shift, but the source
    # map stores the point of shift s at array index s + n/2 (array center =
    # on-axis): roll the weights so w(s) is evaluated at the shift. (The
    # scalar source-side build is insensitive to this constant offset — G
    # depends only on s - s' — but T is not: a missed roll is a permutation
    # similarity that preserves eigenvalues while modulating every kernel.)
    w = jnp.roll(jnp.asarray(source_map, jnp.float32),
                 (-(n // 2), -(n // 2)), axis=(0, 1))
    chats = jnp.fft.fft2(jnp.conj(components.astype(jnp.complex64)))  # (C,n,n)
    q_vec = jnp.asarray(weights, jnp.float32).astype(jnp.complex64)  # (C,)

    def tcc_matvec(v):
        # batched over components: 2 shared + 2C FFTs per block, the
        # component axis riding the FFT batch dimension
        vhat = jnp.fft.fft2(v)
        u = jnp.fft.ifft2(jnp.conj(chats)[:, None] * vhat[None])  # (C,B,n,n)
        y = jnp.fft.fft2(w[None, None] * u)
        acc = jnp.sum(q_vec[:, None, None, None] * chats[:, None] * y,
                      axis=0)
        return jnp.fft.ifft2(acc)

    def matvec_all(block):
        b = block.shape[0]
        if probe_chunk is None or b % probe_chunk:
            return tcc_matvec(block)
        chunked = block.reshape(b // probe_chunk, probe_chunk, n, n)
        out = jax.lax.map(tcc_matvec, chunked)
        return out.reshape(b, n, n)

    l = rank + oversample
    key = jax.random.PRNGKey(seed)
    omega = (_random_probe_block(key, l, n) if init_basis is None
             else _warm_omega(init_basis, l, n, key))

    eigvals, u = _randomized_range_eigh(
        matvec_all, omega, rank=rank, power_iters=power_iters,
        compensated=compensated, krylov=krylov, method=method)
    # u rows are Ritz vectors of T itself (frequency plane, unit norm);
    # the kernel that multiplies the mask spectrum is conj(phi_j) — see
    # tcc_eigensystem's conjugation note.
    kernels = jnp.conj(u)
    try:
        live = int(np.asarray(jnp.sum(w > 0)))
    except jax.errors.TracerArrayConversionError:
        live = -1
    socs = SOCSKernels(
        kernels=kernels,
        eigenvalues=eigvals[:rank].astype(jnp.float32),
        total_rank=live,
    )
    return (socs, u) if return_basis else socs


def randomized_socs_chromatic(
    aberrations,
    source_map,
    config: OpticsConfig,
    *,
    spectrum,
    polarization=None,
    apodize: bool = True,
    rank: int = 64,
    oversample: int = 16,
    power_iters: int = 2,
    seed: int = 0,
    probe_chunk: int | None | str = "auto",
    compensated: bool = True,
    krylov: bool = False,
    init_basis=None,
    return_basis: bool = False,
    channels: int | str | None = None,
    channel_rotation=None,
    method: str = "rr",
) -> SOCSKernels:
    """Polychromatic (finite laser-bandwidth) SOCS kernels — optionally
    polarized too — as ONE kernel set for every scalar-SOCS consumer.

    ``spectrum`` is a :class:`..config.LaserSpectrum`: its quadrature
    samples land at chromatic defocus offsets (nm per pm of wavelength
    through the lens), and the polychromatic TCC is the spectrum-weighted
    sum of the per-plane TCCs — exactly the summed-component pattern of
    :func:`randomized_socs_components`, with component pupils P_f = the
    aberrated pupil at each offset plane. With ``polarization`` set, the
    component set is the OUTER PRODUCT of the Jones-pupil factors and the
    focus planes (vector physics AND bandwidth in one operator). Takes the
    aberration VECTOR (not a prebuilt pupil): the offsets enter the
    wavefront pre-exponential. Differentiable in ``aberrations``.

    No reference counterpart (the reference is monochromatic,
    ``pupil.py:6``); physics per Mack's focus-blur bandwidth model."""
    components, weights = chromatic_component_stack(
        aberrations, config, spectrum=spectrum, polarization=polarization,
        apodize=apodize)
    return randomized_socs_components(
        components, weights, source_map, config, rank=rank,
        oversample=oversample, power_iters=power_iters, seed=seed,
        probe_chunk=probe_chunk, compensated=compensated, krylov=krylov,
        init_basis=init_basis, return_basis=return_basis, channels=channels,
        channel_rotation=channel_rotation, method=method)


def chromatic_component_stack(aberrations, config: OpticsConfig, *,
                              spectrum, polarization=None,
                              apodize: bool = True):
    """(C, n, n) component stack + (C,) weights of the polychromatic
    (optionally polarized: the polarization x focus product set) summed-TCC
    operator — the front half of :func:`randomized_socs_chromatic`, exposed
    for channel analysis. Its channel Gram is independent of the common
    aberration phase (S_fg = sum_k A^2 exp(i(delta_g - delta_f)) — only the
    chromatic defocus DIFFERENCES survive), so one principal-channel
    rotation serves every aberration at a given (config, spectrum,
    polarization); narrow spectra make the stack nearly parallel and
    compress to 2-3 channels."""
    from ..models.pupil import pupil_function
    from .focus import chromatic_aberrations

    stack_ab, q_f = chromatic_aberrations(aberrations, spectrum)
    pupils = jax.vmap(
        lambda ab: pupil_function(ab, config))(stack_ab)  # (F, n, n)
    if polarization is None:
        return pupils, q_f
    factor_list = dedup_polarization_factors(config, polarization,
                                             apodize=apodize)
    vfac = jnp.stack([jnp.asarray(f, jnp.complex64)
                      for _, f in factor_list])  # (V, n, n)
    q_v = jnp.asarray([q for q, _ in factor_list], jnp.float32)
    n = config.n
    components = (vfac[:, None] * pupils[None]).reshape(-1, n, n)
    weights = (q_v[:, None] * q_f[None]).reshape(-1)
    return components, weights


def vector_pupil_power(pupil, config: OpticsConfig, *,
                       polarization="unpolarized",
                       apodize: bool = True) -> jnp.ndarray:
    """sum_i q_i sum_k |C_i(k)|^2 over the component pupils — the vector
    analog of the scalar sum|P|^2 (R(0)): trace(T_total) = w_sum * this.
    Jit-traceable."""
    from .vector import component_factors, polarization_states

    pupil = to_device_complex(pupil).astype(jnp.complex64)
    power = 0.0
    for weight, jones in polarization_states(polarization):
        factors = component_factors(config, jones, apodize=apodize)
        for c in range(3):
            if np.abs(factors[c]).max() <= 1e-12:
                continue
            comp = jnp.asarray(factors[c], jnp.complex64) * pupil
            power = power + weight * jnp.sum(jnp.abs(comp) ** 2)
    return power


def vector_tcc_trace(pupil, source_map, config: OpticsConfig, *,
                     polarization="unpolarized",
                     apodize: bool = True) -> jnp.ndarray:
    """trace(T_total) = sum_s w_s * sum_i q_i sum_k |C_i(k)|^2 — the total
    TCC energy of the vector operator, jit-traceable (the vector analog of
    the scalar w_sum * sum|P|^2 in :func:`socs_energy_captured`)."""
    return (jnp.sum(jnp.asarray(source_map, jnp.float32))
            * vector_pupil_power(pupil, config, polarization=polarization,
                                 apodize=apodize))


# ---------------------------------------------------------------------------
# Lean-memory randomized SOCS (single-probe-block peak)
# ---------------------------------------------------------------------------
#
# The standard randomized build holds ~2 copies of the (rank + oversample,
# n, n) complex probe block live at its peaks (matvec out vs in, whitening
# apply out vs in, Rayleigh-Ritz G Q vs Q, and the final synthesis) — rank
# 256 at 2048^2 is ~8.9 GB per copy, so two copies OOM the 15.75 GB HBM.
# The lean build reaches a SINGLE-copy peak by updating the probe block in
# place: every stage is a `lax.fori_loop` whose carry IS the block, updated
# chunk-wise with `dynamic_update_slice` (XLA aliases while-loop carries, so
# no second block is ever allocated), and the block is kept as a
# (rank, n, n) + (oversample, n, n) buffer PAIR so the final kernels are the
# first buffer itself — no (L, n, n) -> (rank, n, n) slice copy at the end.
# The math is identical to `randomized_socs` (same matvec, CholQR2-style
# double Gram whitening, Rayleigh-Ritz, synthesis); only buffer lifetimes
# and the probe randomness (independently drawn per buffer) differ.
# fori_loop is not reverse-differentiable, but nothing differentiates
# through kernel builds (OPC/ILT treat kernels as constants).

_HI = jax.lax.Precision.HIGHEST


def _random_probe_block(key, rows: int, n: int, *,
                        row_chunk: int = 16) -> jnp.ndarray:
    """(rows, n, n) complex64 standard-normal probes, generated chunk-wise
    into the output buffer. A single `normal(...) + 1j * normal(...)` at full
    size keeps two f32 (rows, n, n) temporaries plus the complex result live
    (16 GB at rank 256 / 2048^2 — the build OOMed in *generation* before any
    linear algebra ran); chunking caps the temporaries at chunk-size."""
    buf = jnp.zeros((rows, n, n), jnp.complex64)
    if rows == 0:
        return buf
    chunk = min(row_chunk, rows)
    steps, rem = divmod(rows, chunk)

    def gen(i, size):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        return (jax.random.normal(k1, (size, n, n))
                + 1j * jax.random.normal(k2, (size, n, n))).astype(jnp.complex64)

    def body(i, b):
        return jax.lax.dynamic_update_slice_in_dim(b, gen(i, chunk), i * chunk, 0)

    buf = jax.lax.fori_loop(0, steps, body, buf)
    if rem:
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, gen(steps, rem), steps * chunk, 0)
    return buf


def _rows_inplace(fn, buf: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """buf[c] = fn(buf[c]) over leading-axis chunks, sequentially, reusing
    buf's storage (loop-carry aliasing). fn must be row-local."""
    l = buf.shape[0]
    if l == 0:
        return buf
    chunk = min(chunk, l)
    steps, rem = divmod(l, chunk)

    def body(i, b):
        sl = jax.lax.dynamic_slice_in_dim(b, i * chunk, chunk, 0)
        return jax.lax.dynamic_update_slice_in_dim(b, fn(sl), i * chunk, 0)

    buf = jax.lax.fori_loop(0, steps, body, buf)
    if rem:
        sl = jax.lax.dynamic_slice_in_dim(buf, steps * chunk, rem, 0)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, fn(sl), steps * chunk, 0)
    return buf


_MIX_DIMS = (((1,), (0,)), ((), ()))   # (out, in) @ (in, rc, n) -> (out, rc, n)
_IMG_DIMS = (((1, 2), (1, 2)), ((), ()))  # contract trailing image axes


def _pair_gram(qm: jnp.ndarray, qo: jnp.ndarray, compensated: bool):
    """Gram of the stacked (rows, n, n) buffers [qm; qo] — no concatenation,
    no reshape (a reshape bitcast on a loop-carry buffer forces a full copy,
    see :func:`..compensated.rowdot3_compensated`)."""
    def dot(a, b):
        if compensated:
            return rowdot3_compensated(a, b, conj_b=True)
        return jax.lax.dot_general(a, jnp.conj(b), _IMG_DIMS, precision=_HI)

    g_mm = dot(qm, qm)
    g_mo = dot(qm, qo)
    g_oo = dot(qo, qo)
    return jnp.concatenate([
        jnp.concatenate([g_mm, g_mo], axis=1),
        jnp.concatenate([g_mo.conj().T, g_oo], axis=1),
    ], axis=0)


def _pair_left_apply(mat: jnp.ndarray, qm: jnp.ndarray, qo: jnp.ndarray,
                     img_row_chunk: int):
    """[qm; qo] <- mat applied along the stack axis, chunked over image rows
    in place (both buffers' chunk is read before either is written)."""
    r_, n = qm.shape[0], qm.shape[1]
    o_ = qo.shape[0]
    m_mm, m_mo = mat[:r_, :r_], mat[:r_, r_:]
    m_om, m_oo = mat[r_:, :r_], mat[r_:, r_:]
    rc = min(img_row_chunk, n)
    steps, rem = divmod(n, rc)

    def update(carry, start, size):
        bm, bo = carry
        cm = jax.lax.dynamic_slice(bm, (0, start, 0), (r_, size, n))
        co = jax.lax.dynamic_slice(bo, (0, start, 0), (o_, size, n))
        nm = (jax.lax.dot_general(m_mm, cm, _MIX_DIMS, precision=_HI)
              + jax.lax.dot_general(m_mo, co, _MIX_DIMS, precision=_HI))
        no = (jax.lax.dot_general(m_om, cm, _MIX_DIMS, precision=_HI)
              + jax.lax.dot_general(m_oo, co, _MIX_DIMS, precision=_HI))
        return (jax.lax.dynamic_update_slice(bm, nm, (0, start, 0)),
                jax.lax.dynamic_update_slice(bo, no, (0, start, 0)))

    carry = jax.lax.fori_loop(
        0, steps, lambda i, c: update(c, i * rc, rc), (qm, qo))
    if rem:
        carry = update(carry, steps * rc, rem)
    return carry


def _randomized_socs_lean(
    pupil: jnp.ndarray,
    source_map,
    config: OpticsConfig,
    *,
    rank: int,
    oversample: int,
    power_iters: int,
    seed: int,
    compensated: bool,
    row_chunk: int = 32,
    img_row_chunk: int = 128,
) -> SOCSKernels:
    """Single-block-peak variant of :func:`randomized_socs` (same algorithm,
    in-place buffer discipline; see the section comment above).

    ``row_chunk`` (probe rows per in-place matvec/Rayleigh-Ritz step) and
    ``img_row_chunk`` (image rows per in-place matrix-apply step) trade
    per-step temporary memory for loop-serialization overhead — the chunk
    temporaries are (chunk, n, n) and (L, chunk, n) complex respectively,
    so larger chunks stay far below the block's own footprint while cutting
    the fori_loop step count. Round-3 re-tune on v5e (rank 256 at 2048^2,
    power_iters=1, fused with one consuming image): (8, 8) ~14 s ->
    (32, 128) 6.2 s — the lean build now costs ~1.16x the standard build
    instead of ~2x, with image agreement to the old chunks at 2e-7."""
    n = config.n
    w = jnp.asarray(source_map, jnp.float32)
    sqrt_w = jnp.sqrt(w).astype(jnp.complex64)
    pupil = to_device_complex(pupil).astype(jnp.complex64)
    pupil_fft = jnp.fft.fft2(pupil)
    r_fft = pupil_fft * jnp.conj(pupil_fft)

    l = rank + oversample
    km, ko = jax.random.split(jax.random.PRNGKey(seed))
    qm = _random_probe_block(km, rank, n)
    qo = _random_probe_block(ko, oversample, n)

    mv = lambda c: _gram_matvec(c, sqrt_w, r_fft)

    def pair_matvec(pm, po):
        return (_rows_inplace(mv, pm, row_chunk),
                _rows_inplace(mv, po, row_chunk))

    whiten_mat = _cholesky_whiten_mat  # same whitening as the standard build

    def orthonormalize(pm, po):
        for _ in range(2):  # CholQR2-style double whitening (see non-lean)
            mat = whiten_mat(_pair_gram(pm, po, compensated))
            pm, po = _pair_left_apply(mat, pm, po, img_row_chunk)
        return pm, po

    qm, qo = pair_matvec(qm, qo)
    for _ in range(power_iters):
        qm, qo = orthonormalize(qm, qo)
        qm, qo = pair_matvec(qm, qo)
    qm, qo = orthonormalize(qm, qo)

    # Rayleigh-Ritz small matrix without materializing G Q: per row chunk c,
    # small[:, c] = [qm; qo]^H (G q_c). The image contraction is fully inside
    # each rowdot, so compensation needs no cross-chunk state.
    def small_cols(chunk_rows):
        gq = mv(chunk_rows)
        if compensated:
            top_blk = rowdot3_compensated(qm, gq, conj_a=True)
            bot_blk = rowdot3_compensated(qo, gq, conj_a=True)
        else:
            top_blk = jax.lax.dot_general(jnp.conj(qm), gq, _IMG_DIMS,
                                          precision=_HI)
            bot_blk = jax.lax.dot_general(jnp.conj(qo), gq, _IMG_DIMS,
                                          precision=_HI)
        return jnp.concatenate([top_blk, bot_blk], axis=0)  # (L, c)

    small = jnp.zeros((l, l), jnp.complex64)
    for buf, offset in ((qm, 0), (qo, rank)):
        rows = buf.shape[0]
        if rows == 0:  # oversample=0: same early-out as _rows_inplace
            continue
        chunk = min(row_chunk, rows)
        steps, rem = divmod(rows, chunk)

        def body(i, sm, _buf=buf, _off=offset, _chunk=chunk):
            blk = small_cols(jax.lax.dynamic_slice_in_dim(
                _buf, i * _chunk, _chunk, 0))
            return jax.lax.dynamic_update_slice(sm, blk, (0, _off + i * _chunk))

        small = jax.lax.fori_loop(0, steps, body, small)
        if rem:
            blk = small_cols(buf[steps * chunk:])
            small = jax.lax.dynamic_update_slice(
                small, blk, (0, offset + steps * chunk))

    small = 0.5 * (small + small.conj().T)
    eigvals, eigvecs = jnp.linalg.eigh(small)  # ascending
    eigvals = jnp.clip(eigvals[::-1].real, 0.0, None)
    top = eigvecs[:, ::-1][:, :rank]  # (L, rank)

    # u = conj(top.T @ [qm; qo]) written into qm, image-row-chunked in place
    # (qo is dead afterwards and freed by XLA).
    t_m, t_o = top.T[:, :rank], top.T[:, rank:]
    rc = min(img_row_chunk, n)
    steps, rem = divmod(n, rc)

    def u_update(bm, start, size):
        cm = jax.lax.dynamic_slice(bm, (0, start, 0), (rank, size, n))
        co = jax.lax.dynamic_slice(qo, (0, start, 0), (oversample, size, n))
        um = (jax.lax.dot_general(t_m, cm, _MIX_DIMS, precision=_HI)
              + jax.lax.dot_general(t_o, co, _MIX_DIMS, precision=_HI))
        return jax.lax.dynamic_update_slice(bm, um, (0, start, 0))

    qm = jax.lax.fori_loop(
        0, steps, lambda i, b: u_update(b, i * rc, rc), qm)
    if rem:
        qm = u_update(qm, steps * rc, rem)

    # Synthesis + conjugation + 1/sqrt(lambda) scaling, row-chunked in place:
    # kernels ARE qm's buffer. (conj(u) folds into the synthesis call; see
    # the conjugation notes in randomized_socs.)
    top_vals = eigvals[:rank]
    alive = top_vals > 1e-12 * jnp.maximum(eigvals[0], 1e-30)
    scale = jnp.where(alive, 1.0 / jnp.sqrt(jnp.where(alive, top_vals, 1.0)),
                      0.0).astype(jnp.complex64)

    chunk = min(row_chunk, rank)
    steps, rem = divmod(rank, chunk)

    def synth_update(b, start, size):
        u_c = jax.lax.dynamic_slice(b, (start, 0, 0), (size, n, n))
        s_c = jax.lax.dynamic_slice(scale, (start,), (size,))
        # u rows here hold top.T @ q; the eigenvector convention needs
        # conj(.) before synthesis, and the stored kernel is conj(synth).
        ker = jnp.conj(_synthesize_kernels(jnp.conj(u_c), sqrt_w, pupil_fft))
        return jax.lax.dynamic_update_slice(
            b, ker * s_c[:, None, None], (start, 0, 0))

    qm = jax.lax.fori_loop(
        0, steps, lambda i, b: synth_update(b, i * chunk, chunk), qm)
    if rem:
        qm = synth_update(qm, steps * chunk, rem)

    try:
        live = int(np.asarray(jnp.sum(w > 0)))
    except jax.errors.TracerArrayConversionError:
        live = -1
    return SOCSKernels(
        kernels=qm,
        eigenvalues=top_vals.astype(jnp.float32),
        total_rank=live,
    )


def tcc_total_trace(pupil, source_map, *, polarization=None,
                    apodize: bool = True,
                    config: OpticsConfig | None = None) -> float:
    """Exact trace of the (scalar or vector) TCC, no decomposition needed:
    trace(G) = sum_s w_s * R(0) with R(0) = sum |P|^2 for the scalar
    operator; the polarized operator's trace comes from
    :func:`vector_tcc_trace` (pass the build's ``polarization``/``apodize``
    plus ``config``). Eigenvalue units match the Abbe engine's unnormalized
    source-weight sum, i.e. the units of ``SOCSKernels.eigenvalues``."""
    if polarization is not None:
        if config is None:
            raise ValueError("polarization needs config for the trace")
        return float(np.asarray(jax.jit(
            vector_tcc_trace,
            static_argnames=("config", "polarization", "apodize"))(
                pupil, source_map, config=config, polarization=polarization,
                apodize=apodize)))
    w_sum = float(np.asarray(jnp.sum(jnp.asarray(source_map, jnp.float32))))
    r0 = float(np.asarray(_field_power(to_device_complex(pupil))))
    return w_sum * r0


@jax.jit
def _field_power(field):
    """sum |field|^2 under jit (eager complex math dies on the TPU tunnel)."""
    return jnp.sum(jnp.abs(field) ** 2).astype(jnp.float32)


def socs_energy_captured(socs: SOCSKernels, pupil, source_map, *,
                         polarization=None, apodize: bool = True,
                         config: OpticsConfig | None = None) -> float:
    """Fraction of the TCC's total energy (trace) captured by the kept
    kernels: trace(G) = sum_s w_s * R(0) with R(0) = sum |P|^2, so no
    decomposition is needed for the denominator. Values near 1 mean the
    truncation is faithful; grow ``rank`` if this is low.

    For kernels from :func:`randomized_socs_vector`, pass the same
    ``polarization``/``apodize`` plus ``config`` so the denominator is the
    vector operator's trace (:func:`vector_tcc_trace`)."""
    trace = tcc_total_trace(pupil, source_map, polarization=polarization,
                            apodize=apodize, config=config)
    if trace <= 0:
        return 1.0
    return float(np.asarray(jnp.sum(socs.eigenvalues))) / trace


@jax.jit
def _tcc_diag_weighted_m2(pupil, source_map, spec):
    """sum_k |M(k)|^2 * diag_TCC(k) with diag_TCC(k) = sum_s w_s |P(k-s)|^2
    (circular shifts — the Abbe engine's roll convention; the ifftshift
    alignment is pinned against a brute-force rolled-pupil sum in
    tests/test_socs_bound.py). Equals the raw-grid mean of the EXACT image
    in eigenvalue units under the forward-norm inverse DFT."""
    p2 = (jnp.abs(pupil) ** 2).astype(jnp.complex64)
    src_c = source_map.astype(jnp.complex64)
    diag = jnp.real(jnp.fft.ifft2(
        jnp.fft.fft2(jnp.fft.ifftshift(src_c)) * jnp.fft.fft2(p2)))
    return jnp.sum(jnp.abs(spec) ** 2 * diag).astype(jnp.float32)


@jax.jit
def _kept_tail_mean(kernels, eigenvalues, spec):
    """sum_j lambda_j ||phi_j * M||^2 — the raw-grid mean of the SOCS image
    in eigenvalue units. lax.map keeps the transient at one (n, n) complex
    buffer (a flat (rank, n, n) product is multi-GB at 1024^2 rank 256)."""
    def one(k):
        return jnp.sum(jnp.abs(k * spec) ** 2)

    prod = jax.lax.map(one, kernels)
    return jnp.sum(eigenvalues * prod).astype(jnp.float32)


def socs_image_nrms_bound(socs: SOCSKernels, spectrum, image, *,
                          trace: float | None = None, pupil=None,
                          source_map=None, polarization=None,
                          apodize: bool = True,
                          config: OpticsConfig | None = None,
                          total_weight: float | None = None) -> float:
    """Rigorous a-priori bound on the truncation error's normalized RMS,
    nRMS = RMS(I_exact - I_socs) / max(I_exact), from the dropped
    eigenvalue tail alone — the bench/test accuracy metric, computable
    without ever running the exact Abbe solver.

    For exact eigenkernels (:func:`tcc_eigensystem`) the pointwise deficit
    is Delta I(x) = sum_dropped lambda_j |F(phi_j M)(x)|^2 with unit-norm
    phi_j and the forward-norm inverse DFT (a plain sum, no 1/N^2 —
    ``ops/fourier.centered_ifft2``; the windowed matmul engines implement
    the identical transform), so Cauchy-Schwarz gives pointwise
    ``Delta I <= dropped_trace * ||M||_2^2``. The Gau'23 postprocess
    (bilinear downscale + zero pad) is a convex average so the sup cannot
    grow, and Delta I >= 0 makes max(I_exact) >= max(I_socs); hence

        nRMS <= (trace - sum kept lambda) * sum|M|^2 / max(I_socs).

    ``image`` is the SOCS aerial image the bound certifies; if it was
    normalized by the source-weight sum (``normalize=True`` paths) pass the
    same ``total_weight`` so the peak is restored to eigenvalue units
    (nRMS itself is scale-invariant). Pass the exact ``trace`` if already
    known, else ``pupil``/``source_map`` (+ ``polarization``/``config`` for
    vector builds) to compute it via :func:`tcc_total_trace`.

    Two refinements tighten the raw Cauchy-Schwarz sup (round 5; each is
    orders of magnitude at production scale, where the plain dropped-trace
    sup goes vacuous — 285 at the bench's 1024^2 rank-256 headline):

    - **Completeness**: for any pixel x, Delta I(x) = sum_d lambda_j
      |<u_x, phi_j>|^2 with u_x(k) = conj(e_x(k)) M(k), and summing
      |<u_x, phi_j>|^2 over the FULL orthonormal eigenbasis gives
      ||u_x||^2 = sum|M|^2 — so the sup also obeys
      ``Delta I <= lambda_max_dropped * sum|M|^2``. For the exact
      decomposition lambda_max_dropped <= the smallest KEPT eigenvalue
      (descending order); the sup scale becomes
      ``min(dropped_trace, lambda_kept_min)``.
    - **Exact tail mean** (scalar builds, needs ``pupil``+``source_map``):
      the raw-grid mean of Delta I is computable without the exact solver:
      mean(I_exact) = sum_k |M(k)|^2 * diag_TCC(k) with diag_TCC(k) =
      sum_s w_s |P(k-s)|^2 (one circular convolution — the engine's roll
      convention, alignment pinned by tests), and mean(I_socs) =
      sum_kept lambda_j ||phi_j M||^2 from the kernels in hand. With
      0 <= Delta I <= S pointwise, RMS^2 <= S * mean(Delta I); the Gau'23
      postprocess reuses a raw pixel at most 4x across its bilinear
      convex combinations, so mean_post <= 4 * mean_raw and
      ``RMS <= 2 * sqrt(S * mean(Delta I))``. The tail mean is floored at
      1e-6 of mean(I_exact) (the f32 reduction noise floor) so float
      cancellation cannot fake a zero bound.

    For randomized builds the kept pairs are Ritz approximations: the
    kept-subspace misfit adds a term that is higher-order in the
    oversampled / power-iterated residual, while the Ritz values
    UNDER-estimate the true top eigenvalues (Cauchy interlacing), which
    over-estimates the dropped trace (and in practice lambda_kept_min
    tracks the true lambda_rank from below closely enough that the
    refined bound keeps an order-of-magnitude margin) — in practice the
    bound holds with margin (tests/test_socs_bound.py verifies bound >=
    measured across the demo configs). The bound covers SOCS truncation
    only, not the int8 apply engine's ~6e-7 quantization floor."""
    if trace is None:
        if pupil is None or source_map is None:
            raise ValueError("socs_image_nrms_bound needs trace= or "
                             "pupil=/source_map= to compute it")
        trace = tcc_total_trace(pupil, source_map, polarization=polarization,
                                apodize=apodize, config=config)
    kept = float(np.asarray(jnp.sum(socs.eigenvalues)))
    dropped = max(trace - kept, 0.0)
    lam_min = float(np.asarray(jnp.min(socs.eigenvalues)))
    sup_scale = min(dropped, lam_min) if lam_min > 0 else dropped
    m2 = float(np.asarray(_field_power(to_device_complex(spectrum))))
    peak = float(np.asarray(jnp.max(image)))
    if total_weight is not None:
        peak = peak * float(total_weight)
    if peak <= 0:
        return 0.0 if sup_scale * m2 == 0 else float("inf")
    bound = sup_scale * m2 / peak
    if (pupil is not None and source_map is not None
            and polarization is None):
        spec_dev = to_device_complex(spectrum)
        a_all = float(np.asarray(_tcc_diag_weighted_m2(
            to_device_complex(pupil),
            jnp.asarray(np.asarray(source_map), jnp.float32), spec_dev)))
        a_kept = float(np.asarray(_kept_tail_mean(
            socs.kernels, socs.eigenvalues, spec_dev)))
        tail_mean = max(a_all - a_kept, 1e-6 * abs(a_all))
        bound = min(bound,
                    2.0 * math.sqrt(sup_scale * m2 * tail_mean) / peak)
    return bound


def auto_rank_socs(
    pupil,
    source_map,
    config: OpticsConfig,
    *,
    energy_target: float = 0.999,
    start_rank: int = 32,
    max_rank: int = 512,
    tolerance: float | None = None,
    spectrum=None,
    image_chunk: int = 4,
    **kwargs,
) -> SOCSKernels:
    """Build SOCS kernels with the smallest power-of-two-stepped rank whose
    captured energy fraction meets ``energy_target`` (host-side doubling
    loop; each attempt is one :func:`randomized_socs` build).

    ``tolerance`` switches the stop criterion from the energy fraction to a
    guaranteed image accuracy: the doubling stops once
    :func:`socs_image_nrms_bound` — the rigorous dropped-tail bound on
    nRMS vs the exact Abbe image — is <= ``tolerance`` for the mask whose
    ``spectrum`` is supplied (required: the bound, unlike the energy
    fraction, is mask-dependent). Each candidate pays one cheap
    :func:`socs_image` apply on top of its build. If ``max_rank`` is hit
    first, the best effort is returned; read the achieved bound back via
    :func:`socs_image_nrms_bound`."""
    if tolerance is not None and spectrum is None:
        raise ValueError("tolerance= needs spectrum= (the image-error bound "
                         "is mask-dependent); pass mask_spectrum(geometry, "
                         "config)")
    trace = tcc_total_trace(pupil, source_map)
    rank = start_rank

    def converged(socs) -> bool:
        if tolerance is None:
            kept = float(np.asarray(jnp.sum(socs.eigenvalues)))
            return trace <= 0 or kept / trace >= energy_target
        image = socs_image(spectrum, socs, config, chunk=image_chunk)
        return socs_image_nrms_bound(socs, spectrum, image, trace=trace,
                                     pupil=pupil,
                                     source_map=source_map) <= tolerance

    socs = randomized_socs(pupil, source_map, config, rank=rank, **kwargs)
    while not converged(socs) and rank < max_rank:
        rank = min(rank * 2, max_rank)
        socs = randomized_socs(pupil, source_map, config, rank=rank, **kwargs)
    return socs
