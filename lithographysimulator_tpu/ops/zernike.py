"""Zernike polynomials (OSA/ANSI indexing) and wavefront-error assembly.

Physics parity with reference ``pupil.py:40-100``: Born & Wolf radial
polynomial R_mn (Lin eq. 4.37), normalization N_mn = sqrt((2n+1)/(1+delta_m0)),
cos(m*theta) for m >= 0 and -sin(|m|*theta) for m < 0, zeroed outside the unit
disk; OSA single-index j -> (m, n) via Lin eqs. 4.39/4.40.

TPU-first design: the basis depends only on static config (grid size), so the
whole (count, n, n) stack is generated **on the host in float64** and cached;
the traced part of the computation is just one einsum of the aberration
coefficient vector against the stack — which keeps the wavefront error
differentiable w.r.t. the coefficients (for aberration retrieval / SMO) and
free of the reference's fp16 grid rounding (``pupil.py:53``).

Deliberate divergences from the reference (documented quirks, SURVEY §2.2):
* no in-place mutation of the caller's aberration array (``pupil.py:92``
  mutates, so calling twice double-applies the defocus conversion);
* the defocus-nm conversion guard is ``len >= 5`` (the reference's ``>= 4``
  IndexErrors on exactly-4-element input, ``pupil.py:91``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..grid import Grid

DEFOCUS_OSA_INDEX = 4  # Z_2^0, stored in nm and converted to waves internally.


def osa_index_to_mn(j: int) -> tuple[int, int]:
    """OSA/ANSI single index -> (m, n) (Lin eqs. 4.39/4.40)."""
    n = math.ceil(0.5 * (-3.0 + math.sqrt(9.0 + 8.0 * j)))
    m = 2 * j - n * (n + 2)
    return m, n


def mn_to_osa_index(m: int, n: int) -> int:
    return (n * (n + 2) + m) // 2


def noll_index_to_mn(j: int) -> tuple[int, int]:
    """Noll single index (1-based) -> (m, n). Noll's convention: radial
    order ascending; within an order, |m| ascending with the sign chosen so
    even j <-> cosine (m >= 0) and odd j <-> sine (m < 0). (The reference
    leaves alternative indexings as a TODO, ``pupil.py:82``.)"""
    if j < 1:
        raise ValueError(f"Noll index is 1-based, got {j}")
    n = 0
    k = j - 1
    while k > n:
        n += 1
        k -= n
    m = (-1) ** j * ((n % 2) + 2 * ((k + ((n + 1) % 2)) // 2))
    return m, n


def fringe_index_to_mn(j: int) -> tuple[int, int]:
    """Fringe / University-of-Arizona single index (1-based) -> (m, n).
    Fringe orders by (n + |m|)/2 (wavefront 'order'), then |m| descending,
    cosine before sine: j = (1 + (n + |m|)/2)^2 - 2|m| + (1 - sgn m)/2."""
    if j < 1:
        raise ValueError(f"Fringe index is 1-based, got {j}")
    # invert by search over the bounded (m, n) table
    order = 1
    while order**2 < j:
        order += 1
    for n in range(2 * order + 1):
        for m in sorted(range(-n, n + 1), key=lambda v: (-abs(v), -v)):
            if (n - abs(m)) % 2:
                continue
            jf = (1 + (n + abs(m)) // 2) ** 2 - 2 * abs(m) + (0 if m >= 0 else 1)
            if jf == j:
                return m, n
    raise ValueError(f"no Fringe term with index {j}")


_INDEXINGS = {"osa": lambda j: osa_index_to_mn(j),
              "noll": noll_index_to_mn,
              "fringe": fringe_index_to_mn}


def to_osa_coefficients(coefficients, scheme: str = "noll") -> np.ndarray:
    """Re-order a Noll- or Fringe-indexed coefficient vector (1-based,
    ``coefficients[0]`` is term 1) into the OSA-ordered vector the rest of
    the pipeline consumes (``pupil_function`` / ``wavefront_error``)."""
    scheme = scheme.lower()
    if scheme == "osa":
        return np.asarray(coefficients, np.float64)
    try:
        index_to_mn = _INDEXINGS[scheme]
    except KeyError:
        raise ValueError(
            f"unknown Zernike indexing {scheme!r} (osa, noll, fringe)") from None
    coefficients = np.asarray(coefficients, np.float64)
    pairs = [index_to_mn(j) for j in range(1, len(coefficients) + 1)]
    out = np.zeros(max(mn_to_osa_index(m, n) for m, n in pairs) + 1)
    for c, (m, n) in zip(coefficients, pairs):
        out[mn_to_osa_index(m, n)] += c
    return out


def radial_polynomial(m: int, n: int, r: np.ndarray) -> np.ndarray:
    """R_mn(r): sum over k of the factorial-coefficient terms."""
    am = abs(m)
    l_lim = (n - am) // 2
    il_lim = (n + am) // 2
    out = np.zeros_like(r)
    for k in range(l_lim + 1):
        coeff = ((-1) ** k * math.factorial(n - k)) / (
            math.factorial(k) * math.factorial(il_lim - k) * math.factorial(l_lim - k)
        )
        out += coeff * r ** (n - 2 * k)
    return out


def zernike_term(m: int, n: int, grid: Grid) -> np.ndarray:
    """One unit-coefficient Zernike polynomial on the sigma grid, float64,
    zeroed outside the unit disk."""
    r = grid.radius()
    theta = grid.theta()
    radial = radial_polynomial(m, n, r)
    norm = math.sqrt((2 * n + 1) / (1 + (1 if m == 0 else 0)))
    if m >= 0:
        z = norm * radial * np.cos(m * theta)
    else:
        # The reference writes -N*R*sin(m*theta) with m negative
        # (pupil.py:74), which equals +N*R*sin(|m|*theta).
        z = norm * radial * np.sin(abs(m) * theta)
    return np.where(r <= 1.0, z, 0.0)


@functools.lru_cache(maxsize=16)
def _basis_cached(config: OpticsConfig, count: int) -> np.ndarray:
    grid = Grid(config)
    stack = np.empty((count, config.n, config.n), dtype=np.float64)
    for j in range(count):
        m, n = osa_index_to_mn(j)
        stack[j] = zernike_term(m, n, grid)
    return stack


def zernike_basis(config: OpticsConfig, count: int) -> np.ndarray:
    """Host-side cached (count, n, n) float64 stack of unit Zernike terms in
    OSA order 0..count-1."""
    return _basis_cached(config, int(count)).copy()


def convert_defocus(aberrations: jnp.ndarray, config: OpticsConfig) -> jnp.ndarray:
    """Return coefficients with entry 4 converted from nm of defocus to waves
    (Mack eq. 3.24; reference ``pupil.py:91-92`` — pure, guard fixed to >= 5)."""
    aberrations = jnp.asarray(aberrations)
    if aberrations.shape[0] >= DEFOCUS_OSA_INDEX + 1:
        scale = config.na**2 / (4.0 * config.wavelength)
        aberrations = aberrations.at[DEFOCUS_OSA_INDEX].multiply(scale)
    return aberrations


def wavefront_error(
    aberrations: jnp.ndarray,
    config: OpticsConfig,
    *,
    defocus_in_nm: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Coefficient-weighted sum of Zernike terms -> (n, n) wavefront error in
    waves. ``aberrations`` may be a traced jnp array (differentiable)."""
    aberrations = jnp.asarray(aberrations, dtype=dtype)
    if defocus_in_nm:
        aberrations = convert_defocus(aberrations, config)
    basis = jnp.asarray(zernike_basis(config, aberrations.shape[0]), dtype=dtype)
    return jnp.tensordot(aberrations, basis, axes=1,
                         precision=jax.lax.Precision.HIGHEST)
