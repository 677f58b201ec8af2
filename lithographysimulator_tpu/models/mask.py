"""Binary mask geometry: container + procedural geometry factories.

Parity target: reference ``mask.py:3-35`` (square binary mask, pixel pitch in
nm, hard-coded demo of four 4-px vertical bars at 9-px pitch) — plus general
procedural generators the reference lacks (its GDSII import is an unchecked
roadmap item, reference ``README.md:20``).

Geometry is stored as a float32 {0, 1} jnp array: the FFT path casts to float
before resampling anyway (reference ``mask.py:76``), float32 keeps the array
directly usable as a differentiable variable for inverse lithography.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig


@dataclasses.dataclass(frozen=True)
class Mask:
    """A square binary mask tied to an :class:`OpticsConfig`."""

    geometry: jnp.ndarray  # (n, n) float32 in [0, 1]
    config: OpticsConfig

    def __post_init__(self):
        n = self.config.n
        if self.geometry.shape != (n, n):
            raise ValueError(
                f"mask geometry {self.geometry.shape} does not match config grid {(n, n)}"
            )

    @property
    def pixel_number(self) -> int:
        return self.config.n

    @property
    def pixel_size(self) -> float:
        return self.config.pixel_size


def from_array(geometry, config: OpticsConfig) -> Mask:
    """Wrap an existing square array as a Mask. Real dtypes become float32;
    complex transmission (phase-shift masks) becomes complex64, uploaded as
    re/im planes (serving backends may not transfer complex dtypes)."""
    host = np.asarray(geometry)
    if np.iscomplexobj(host):
        from ..xfer import to_device_complex

        arr = to_device_complex(host).astype(jnp.complex64)
    else:
        arr = jnp.asarray(host, dtype=jnp.float32)
    if arr.ndim != 2 or arr.shape[0] != arr.shape[1]:
        raise ValueError(f"mask geometry must be square 2-D, got {arr.shape}")
    if arr.shape[0] != config.n:
        config = dataclasses.replace(config, pixel_number=arr.shape[0])
    return Mask(geometry=arr, config=config)


def demo_bars(config: OpticsConfig | None = None) -> Mask:
    """The reference's demo geometry (``mask.py:22-27``): on a 64^2 grid, four
    4-px-wide vertical bars, rows 9:55, columns starting at 16 with pitch 9.
    For other grid sizes the same pattern is scaled proportionally."""
    config = config or OpticsConfig()
    n = config.n
    geom = np.zeros((n, n), dtype=np.float32)
    s = n / 64.0
    r0, r1 = round(9 * s), round(55 * s)
    for bar in range(4):
        c0 = round((16 + 9 * bar) * s)
        c1 = round((20 + 9 * bar) * s)
        geom[r0:r1, c0:c1] = 1.0
    return Mask(geometry=jnp.asarray(geom), config=config)


def lines_and_spaces(
    config: OpticsConfig,
    *,
    line_width_px: int,
    pitch_px: int,
    count: int | None = None,
    vertical: bool = True,
    margin_px: int = 0,
) -> Mask:
    """General 1-D line/space grating."""
    n = config.n
    geom = np.zeros((n, n), dtype=np.float32)
    usable = n - 2 * margin_px
    if count is None:
        count = max(1, usable // pitch_px)
    start = margin_px + (usable - ((count - 1) * pitch_px + line_width_px)) // 2
    for i in range(count):
        c0 = start + i * pitch_px
        geom[margin_px : n - margin_px, c0 : c0 + line_width_px] = 1.0
    if not vertical:
        geom = geom.T
    return Mask(geometry=jnp.asarray(geom), config=config)


def contact_holes(
    config: OpticsConfig, *, hole_px: int, pitch_px: int, count: int | None = None
) -> Mask:
    """2-D array of square contact holes."""
    n = config.n
    geom = np.zeros((n, n), dtype=np.float32)
    if count is None:
        count = max(1, n // pitch_px)
    start = (n - ((count - 1) * pitch_px + hole_px)) // 2
    for i in range(count):
        for j in range(count):
            r0 = start + i * pitch_px
            c0 = start + j * pitch_px
            geom[r0 : r0 + hole_px, c0 : c0 + hole_px] = 1.0
    return Mask(geometry=jnp.asarray(geom), config=config)


def attenuated_psm(binary_mask: Mask, *, transmission: float = 0.06,
                   phase: float = np.pi) -> Mask:
    """Attenuated phase-shift mask: clear features transmit 1, the
    'opaque' background transmits sqrt(transmission) * exp(i*phase)
    (typically 6% at 180 deg), sharpening edge contrast. Returns a Mask
    with complex64 geometry — the spectrum and imaging paths handle complex
    transmission natively (the reference supports binary masks only)."""
    bg = np.sqrt(transmission) * np.exp(1j * phase)
    geom = jnp.real(jnp.asarray(binary_mask.geometry)).astype(jnp.float32)
    # assemble on device from real planes (complex host constants may not
    # transfer on serving backends)
    re = geom + (1.0 - geom) * float(bg.real)
    im = (1.0 - geom) * float(bg.imag)
    complex_geom = jax.lax.complex(re, im).astype(jnp.complex64)
    return dataclasses.replace(binary_mask, geometry=complex_geom)


def alternating_psm(config: OpticsConfig, *, line_width_px: int, pitch_px: int,
                    count: int | None = None, margin_px: int = 0) -> Mask:
    """Alternating (Levenson) phase-shift mask: a line/space grating whose
    adjacent clear lines alternate 0 / 180 degree phase (+1 / -1
    transmission), doubling the effective pitch of the diffraction orders."""
    base = lines_and_spaces(config, line_width_px=line_width_px,
                            pitch_px=pitch_px, count=count,
                            margin_px=margin_px)
    geom = np.asarray(base.geometry)
    n = config.n
    # 0/180-degree phases are +-1 real transmission: no complex dtype needed
    signed = np.zeros((n, n), np.float32)
    cols = np.nonzero(geom.any(axis=0))[0]
    if len(cols):
        # group contiguous columns into lines; alternate sign per line
        breaks = np.nonzero(np.diff(cols) > 1)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(cols) - 1]])
        for k, (s0, e0) in enumerate(zip(starts, ends)):
            sign = 1.0 if k % 2 == 0 else -1.0
            sel = cols[s0 : e0 + 1]
            signed[:, sel] = sign * geom[:, sel]
    return Mask(geometry=jnp.asarray(signed), config=config)
