"""Vector (high-NA) imaging: Jones-pupil Abbe engine.

The reference is strictly scalar (``imageformation.py`` carries one complex
field per source point); above NA ~ 0.85 the scalar approximation breaks
down because the focused plane waves are no longer paraxial — their E-field
tilts, the tangential (TE) and radial (TM) components focus differently, and
a longitudinal (z) component appears. This module generalizes the pupil to a
3x2 **Jones/vector pupil** V(sigma): input polarization (Jx, Jy) at the mask
-> three wafer-plane field components (Ex, Ey, Ez).

Construction (Wong, *Optical Imaging in Projection Microlithography*, ch. 5;
also Mack eq. 10.26-10.31): at pupil position sigma with rho = |sigma| <= 1,

    sin(theta) = NA * rho,   cos(theta) = gamma = sqrt(1 - (NA rho)^2)
    e_t = (-sy, sx)/rho  (tangential/TE, unchanged by focusing)
    e_r = ( sx, sy)/rho  (radial/TM, tilts: in-plane part scales by gamma,
                          z part is -sin(theta))

    V[:, p] = e_t e_t[p] + gamma * e_r e_r[p]    (x, y rows)
    V[2, p] = -sin(theta) * e_r[p]               (z row)

so V -> [[1,0],[0,1],[0,0]] as NA*rho -> 0 (the scalar limit), and an
optional radiometric obliquity factor 1/sqrt(gamma) conserves energy for an
aplanatic projector. Each of the (up to 6) component pupils V_cp * P_scalar
is a standard scalar pupil, so every source point runs through the existing
Abbe machinery (scan, windowed zoom-DFT, int8 kernels) unchanged — the
vector image is the incoherent sum over components and polarization states:

    I = sum_p q_p sum_c AbbeIntensity(V_cp * P, M)
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..config import OpticsConfig
from ..grid import Grid
from .abbe import abbe_image_points

#: polarization states: name -> list of (weight, jones (jx, jy))
_UNPOL = [(0.5, (1.0, 0.0)), (0.5, (0.0, 1.0))]


def polarization_states(polarization) -> list:
    """Normalize a polarization spec to [(weight, (jx, jy)), ...].

    'x' / 'y': linear; 'unpolarized': incoherent equal mix of x and y;
    a 2-tuple/list: an explicit Jones vector (normalized to unit power).
    """
    if polarization in (None, "unpolarized"):
        return _UNPOL
    if polarization == "x":
        return [(1.0, (1.0, 0.0))]
    if polarization == "y":
        return [(1.0, (0.0, 1.0))]
    if isinstance(polarization, (tuple, list)) and len(polarization) == 2:
        jx, jy = complex(polarization[0]), complex(polarization[1])
        norm = np.sqrt(abs(jx) ** 2 + abs(jy) ** 2)
        if norm == 0:
            raise ValueError("zero Jones vector")
        return [(1.0, (jx / norm, jy / norm))]
    raise ValueError(f"unknown polarization {polarization!r}")


@functools.lru_cache(maxsize=16)
def _vector_basis(config: OpticsConfig):
    """Host-side float64 pupil-angle basis shared by the Jones pupil and the
    film-stack image-in-resist factors (:mod:`.filmstack`).

    Returns ``(tx, ty, rx, ry, gamma, sin_t, inside)``: the tangential (TE)
    and radial (TM) unit vectors on the sigma plane, the focus-cone cosine
    and sine measured in the image-side medium, and the propagating
    unit-disk mask.
    """
    grid = Grid(config)
    sx = grid.sigma[None, :]
    sy = grid.sigma[:, None]
    rho = np.hypot(sx + 0 * sy, sy + 0 * sx)
    inside = rho <= 1.0
    # Angles are measured in the image-side medium (immersion fluid/resist):
    # sin(theta) = NA rho / n. Pupil positions with NA rho >= n are
    # EVANESCENT — beyond the total-internal-reflection angle they carry no
    # propagating field, so they are cut from the vector pupil rather than
    # clipped (this is what physically limits dry lithography to NA < 1 and
    # what water immersion at n = 1.437 buys back).
    n_med = config.immersion_index
    sin_t = config.na * rho / n_med
    propagating = sin_t < 1.0 - 1e-12
    sin_t = np.where(propagating, sin_t, 0.0)
    inside = inside & propagating
    gamma = np.sqrt(1.0 - sin_t**2)

    safe_rho = np.where(rho > 0, rho, 1.0)
    tx = np.where(rho > 0, -sy / safe_rho, 0.0)
    ty = np.where(rho > 0, sx / safe_rho, 1.0)
    rx = np.where(rho > 0, sx / safe_rho, 1.0)
    ry = np.where(rho > 0, sy / safe_rho, 0.0)
    return tx, ty, rx, ry, gamma, sin_t, inside


@functools.lru_cache(maxsize=16)
def _vector_factors(config: OpticsConfig, apodize: bool):
    """Host-side (3, 2, n, n) float64 V(sigma) plus the unit-disk mask."""
    tx, ty, rx, ry, gamma, sin_t, inside = _vector_basis(config)
    rho = Grid(config).radius()
    # on-axis point: direction degenerate; V must be identity (x,y), 0 (z)
    v = np.zeros((3, 2, config.n, config.n))
    for p, (tp, rp) in enumerate(((tx, rx), (ty, ry))):
        v[0, p] = tx * tp + gamma * rx * rp
        v[1, p] = ty * tp + gamma * ry * rp
        v[2, p] = -sin_t * rp
    center = rho == 0
    if center.any():
        v[0, 0][center] = 1.0
        v[1, 1][center] = 1.0
        v[0, 1][center] = v[1, 0][center] = v[2, 0][center] = v[2, 1][center] = 0.0
    if apodize:
        v = v / np.sqrt(np.maximum(gamma, 1e-6))[None, None]
    return v * inside[None, None], inside


def component_factors(config: OpticsConfig, jones, *,
                      apodize: bool = True) -> np.ndarray:
    """Host-side (3, n, n) V . J — the three wafer-plane component factors
    for one Jones input state (multiply by the scalar pupil to get the
    component pupils). Kept on the host so builders can drop identically-
    zero components (e.g. cross-pol and z at tiny NA) before tracing."""
    v, _ = _vector_factors(config, apodize)
    jx, jy = jones
    return v[:, 0] * jx + v[:, 1] * jy  # (3, n, n), possibly complex


def vector_pupils(pupil, config: OpticsConfig, jones, *,
                  apodize: bool = True) -> jnp.ndarray:
    """(3, n, n) component pupils (Vx.J, Vy.J, Vz.J) * scalar pupil."""
    comp = component_factors(config, jones, apodize=apodize)
    return jnp.asarray(comp, jnp.complex64) * pupil[None]


def vector_abbe_image(
    spectrum,
    pupil,
    shifts,
    weights,
    config: OpticsConfig,
    *,
    polarization="unpolarized",
    apodize: bool = True,
    solver: str = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    engine: str = "auto",
    max_abs_shift: int | None = None,
):
    """Vector aerial image from an explicit padded source-point list.

    Same contract as :func:`..ops.abbe.abbe_image_points`, plus the
    polarization spec. Scalar-limit regression: NA -> 0 (or small NA) makes
    this converge to the scalar image for any polarization (tested in
    tests/test_vector.py).
    """
    states = polarization_states(polarization)
    image = None
    for weight, jones in states:
        comps = vector_pupils(pupil, config, jones, apodize=apodize)
        for c in range(3):
            part = abbe_image_points(
                spectrum, comps[c], shifts, weights, config,
                solver=solver, chunk=chunk, normalize=normalize,
                engine=engine, max_abs_shift=max_abs_shift)
            part = weight * part
            image = part if image is None else image + part
    return image
