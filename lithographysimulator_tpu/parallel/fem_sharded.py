"""Mesh-sharded focus-exposure-matrix (FEM) cell pass.

The host FEM (:func:`..metrology.tiled_fem`) images each focal plane, then
walks the (focus, dose) grid on the host with full feature-table metrology —
the sign-off path. This module is its DEVICE-side fast screen: the whole
(F, D) CD matrix is computed in one jittable pass over a 2-D
('focus', 'source') mesh — focal planes sharded across 'focus', source
points psum-reduced across 'source' (:func:`.abbe_sharded
.through_focus_sharded`), and the dose axis riding an on-device vmap.
Useful for in-loop process-window screening (e.g. inside an SMO objective,
where the host round-trip per cell would dominate) and as the multichip
gate's FEM pattern.

Dose semantics match :func:`..metrology.tiled_fem`: every plane shares ONE
normalization scale (the stack max), dose scales the normalized image, and
the profile is the resist's diffusion blur thresholded at the develop
threshold. The device CD is the TOTAL printed linewidth along a row cut
(soft subpixel edges via the resist sigmoid) — for a cut crossing a single
feature this is the feature CD; multi-feature cuts report the summed width,
where the host path's :func:`..models.resist.feature_table` separates
features. (Reference: no FEM/metrology exists there at all —
/root/reference/README.md:18 lists model validation as unchecked.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import OpticsConfig
from ..models.resist import ResistModel
from ..ops.focus import focus_stack_aberrations
from .abbe_sharded import through_focus_sharded


def row_cut_cd(profile_row: jnp.ndarray, pixel_size: float) -> jnp.ndarray:
    """Total printed width (nm) along a soft developed-profile row in [0, 1]:
    sum of the per-pixel occupancies. Exactly (end - start + 1) * pixel_size
    for a hard single-run profile; soft sigmoid edges give subpixel
    sensitivity and keep it differentiable."""
    return jnp.sum(profile_row) * pixel_size


def fem_cd_matrix_sharded(
    spectrum: jnp.ndarray,
    base_aberrations,
    defocus_nm,
    doses,
    shifts: jnp.ndarray,
    weights: jnp.ndarray,
    config: OpticsConfig,
    mesh: Mesh,
    *,
    resist: ResistModel | None = None,
    chunk: int = 4,
    solver: str = "gau23",
    engine: str = "auto",
    max_abs_shift: int | None = None,
    row: int | None = None,
) -> jnp.ndarray:
    """(F, D) focus-exposure CD matrix, fully on device over a 2-D
    ('focus', 'source') mesh. ``defocus_nm`` length must divide the mesh's
    focus axis; ``shifts``/``weights`` follow
    :func:`.abbe_sharded.padded_source_arrays`. Jit-compatible and
    differentiable in ``base_aberrations`` (process-window-aware SMO)."""
    resist = resist or ResistModel()
    stack_ab = focus_stack_aberrations(
        jnp.asarray(base_aberrations, jnp.float32),
        jnp.asarray(defocus_nm, jnp.float32))
    stack = through_focus_sharded(
        spectrum, stack_ab, shifts, weights, config, mesh,
        solver=solver, chunk=chunk, engine=engine,
        max_abs_shift=max_abs_shift)  # (F, n, n)
    # One shared scale across all planes — per-plane normalization would
    # hide the through-focus contrast loss the FEM measures (tiled_fem).
    norm = stack / jnp.maximum(jnp.max(stack), 1e-30)
    blurred = jax.vmap(lambda im: resist.blur(im, config))(norm)  # (F, n, n)
    n = config.n
    cut = blurred[:, n // 2 if row is None else row]  # (F, n)
    doses = jnp.asarray(doses, jnp.float32)

    def cd_at_dose(dose):
        profile = jax.nn.sigmoid(
            resist.steepness * (cut * dose - resist.threshold))
        return jax.vmap(lambda r: row_cut_cd(r, config.pixel_size))(profile)

    return jax.vmap(cd_at_dose, out_axes=1)(doses)  # (F, D)
