"""Illumination sources: classical / annular / quasar (quadrupole) / dipole.

Parity target: reference ``lightsource.py:34-73``. Source maps live on the
sigma plane (shared with the pupil and k grids) as float32 weight maps; the
classical top-hat circular source is the annulus' sigma_in = 0 degenerate
case (reference ``README.md:4``). Off-axis ``shift_x/shift_y`` are in
wavelength/NA units and offset the sigma grid (reference
``lightsource.py:39-40``).

Maps are built host-side in float64 (the source is static configuration) and
returned as jnp float32. Weight maps are {0, 1} like the reference's, but the
imaging engine accepts arbitrary non-negative weights (e.g. for source-map
optimization or measured pupilograms).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..grid import Grid


@dataclasses.dataclass(frozen=True)
class LightSource:
    """Partial-coherence source spec: sigma_in/sigma_out in partial-coherence
    units, optional off-axis shift in wavelength/NA units."""

    config: OpticsConfig
    sigma_in: float = 0.0
    sigma_out: float = 0.6
    shift_x: float = 0.0
    shift_y: float = 0.0

    def _polar(self):
        grid = Grid(self.config)
        r = grid.radius(self.shift_x, self.shift_y)
        theta = grid.theta(self.shift_x, self.shift_y)
        return r, theta

    def annular(self) -> jnp.ndarray:
        """Binary ring sigma_in <= ||sigma|| <= sigma_out
        (reference ``lightsource.py:34-50``)."""
        r, _ = self._polar()
        ring = (r >= self.sigma_in) & (r <= self.sigma_out)
        return jnp.asarray(ring.astype(np.float32))

    def classical(self) -> jnp.ndarray:
        """Top-hat circular source: the sigma_in = 0 annulus."""
        r, _ = self._polar()
        disk = (r >= 0.0) & (r <= self.sigma_out)
        return jnp.asarray(disk.astype(np.float32))

    def quasar(self, count: int, rotation: float) -> jnp.ndarray:
        """Annulus with ``count`` poles carved out by zeroing alternating
        angular sectors of width pi/count, rotated by ``rotation``
        (reference ``lightsource.py:52-73``)."""
        r, theta = self._polar()
        theta = np.mod(theta + rotation, 2.0 * np.pi)
        ring = (r >= self.sigma_in) & (r <= self.sigma_out)
        spacing = np.pi / count
        keep = np.ones_like(theta, dtype=bool)
        for gap in range(count):
            lo = 2 * gap * spacing
            hi = (2 * gap + 1) * spacing
            keep &= ~((lo < theta) & (theta < hi))
        return jnp.asarray((ring & keep).astype(np.float32))

    def quadrupole(self, rotation: float = -np.pi / 8) -> jnp.ndarray:
        """Four-pole quasar; default rotation matches the reference demo
        (``imageformation.py:112``)."""
        return self.quasar(4, rotation)

    def dipole(self, rotation: float = 0.0) -> jnp.ndarray:
        """Two-pole quasar."""
        return self.quasar(2, rotation)

    def monopole(self) -> jnp.ndarray:
        """Single on-axis point: a coherent-illumination limit, useful for
        classical-limit property tests."""
        n = self.config.n
        m = np.zeros((n, n), dtype=np.float32)
        m[n // 2, n // 2] = 1.0
        return jnp.asarray(m)
