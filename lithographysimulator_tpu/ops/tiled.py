"""Tiled full-chip imaging: arbitrarily large masks through fixed-size optics.

The sigma ≡ k grid invariant ties the frequency step to the grid size
(delta_k = 4/n), so the per-field pipeline has a natural working size. Real
layouts are much bigger than one field — the standard full-chip approach
(Cobb-style OPC flows) exploits that imaging is *local*: the coherent-system
point-spread functions decay over a few lambda/NA, so the chip is cut into
overlapping tiles, each imaged independently under the tile-sized optics, and
only the halo-free tile cores are stitched into the output.

This composes with any per-tile solver; SOCS is the natural choice (kernels
are built once for the tile optics and reused for every tile of every mask).
Memory stays at O(tile^2) regardless of chip size — an 8192^2 (or larger)
mask streams through in 1024^2 pieces. Tiles are independent, so the tile
loop is embarrassingly parallel across chips (`parallel.tiled_sharded`).

Guard-band guidance: the optical interaction distance is a few
lambda / NA — e.g. ~1.4 um at 193 nm / 0.7 NA, i.e. ~55 px of 25 nm pixels;
`default_halo` rounds that up generously.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from .fraunhofer import mask_spectrum
from .hopkins import SOCSKernels, socs_image


def default_halo(config: OpticsConfig, *, wavelengths: float = 8.0) -> int:
    """Halo in pixels covering ``wavelengths`` * lambda/NA of optical
    interaction distance (rounded up to a multiple of 8), clamped so the
    tile (``config.n``) keeps a core of at least 8 px — without the clamp,
    the derived default (96 px at the 193/0.7/25nm config) exceeds half of a
    128-px tile and the tool errors on its own defaults. Pass ``halo``
    explicitly to override (larger halos need a larger tile)."""
    distance_nm = wavelengths * config.wavelength / config.na
    px = math.ceil(distance_nm / config.pixel_size)
    halo = ((px + 7) // 8) * 8
    max_halo = ((config.n - 8) // 2) // 8 * 8
    return max(0, min(halo, max_halo))


def tile_layout(big_n: int, tile_n: int, halo: int):
    """Number of tile steps per axis and the core (stitched) step size."""
    step = tile_n - 2 * halo
    if step <= 0:
        raise ValueError(f"halo {halo} too large for tile size {tile_n}")
    tiles = math.ceil(big_n / step)
    return tiles, step


def _check_mask3d_halo(mask3d, halo: int) -> None:
    """Per-window mask3d application is only exact when the apply stencil
    (1 px for BoundaryLayer, k+1 px for EdgeKernelM3D: edge strips reach 1 px
    past the step and taps shift them by up to k more) lies inside the
    cropped halo — otherwise the jnp.roll wraparound from a window edge
    leaks into the kept tile core."""
    if mask3d is None:
        return
    stencil = getattr(mask3d, "k", 0) + 1
    if halo < stencil:
        raise ValueError(
            f"halo {halo} is smaller than the mask3d apply stencil "
            f"({stencil} px): per-tile thick-mask application would wrap "
            f"tap contributions into the kept core. Use halo >= {stencil}.")


@functools.lru_cache(maxsize=32)
def _tile_batch_fn(tile_config, halo, step, solver, chunk, engine,
                   spectrum_solver, mask3d=None):
    """Cached jitted per-batch tile imager, keyed on the static parameters —
    a fresh @jax.jit per call would re-trace and recompile every invocation.
    socs/padded are jit ARGUMENTS, never closure captures: captured device
    arrays are lowered as constants (a rank-256 1024^2 kernel set is ~2 GB)
    and force a host readback at trace time."""
    n = tile_config.n

    @jax.jit
    def tile_batch(padded, socs, coord_block):
        def one(c):
            window = jax.lax.dynamic_slice(
                padded, (c[0] * step, c[1] * step), (n, n))
            if mask3d is not None:
                # per-window application is exact: the BL stencil is one
                # pixel wide, so the only deviation from a global apply is
                # the roll wraparound ring, which lies in the cropped halo
                window = mask3d.apply(window, tile_config)
            spectrum = mask_spectrum(window, tile_config, solver=spectrum_solver)
            img = socs_image(spectrum, socs, tile_config,
                             solver=solver, chunk=chunk, engine=engine)
            return img[halo : halo + step, halo : halo + step]

        return jax.lax.map(one, coord_block)

    return tile_batch


def tiled_socs_image(
    mask_big: jnp.ndarray,
    socs: SOCSKernels,
    tile_config: OpticsConfig,
    *,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    spectrum_solver: str = "gau23",
    tiles_per_dispatch: int = 8,
    progress_cb=None,
    mask3d=None,
) -> jnp.ndarray:
    """(M, M) aerial image of an arbitrarily large mask, tile by tile.
    ``progress_cb(fraction)`` (optional) is called after each dispatch
    batch — the serving jobs API polls it.

    ``socs`` must be built for ``tile_config`` (same optics every tile). The
    mask is zero-padded outside its boundary; each tile's core (tile minus
    halo ring) lands in the output.

    ``tiles_per_dispatch`` groups tiles into one compiled ``lax.map`` per
    dispatch: big enough to amortize host round-trips, small enough to stay
    under serving-tunnel dispatch limits (~8 x 0.2 s at 1024^2 tiles).
    """
    big_n = mask_big.shape[-1]
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    _check_mask3d_halo(mask3d, halo)

    # Pad so every tile window [t*step - halo, t*step - halo + n) is in range.
    pad_lo = halo
    pad_hi = tiles * step + halo - big_n + (n - step)  # generous upper guard
    padded = jnp.pad(mask_big, ((pad_lo, pad_hi), (pad_lo, pad_hi)))

    coords = np.stack(np.meshgrid(np.arange(tiles), np.arange(tiles),
                                  indexing="ij"), -1).reshape(-1, 2)
    total = len(coords)
    k = max(1, min(tiles_per_dispatch, total))
    pad_tiles = (-total) % k
    if pad_tiles:
        coords = np.concatenate([coords, np.zeros((pad_tiles, 2), coords.dtype)])

    tile_batch = _tile_batch_fn(tile_config, halo, step, solver, chunk,
                                engine, spectrum_solver, mask3d)

    cores = []
    n_batches = len(coords) // k
    for bi, start in enumerate(range(0, len(coords), k)):
        block = jnp.asarray(coords[start : start + k])
        cores.append(tile_batch(padded, socs, block))
        if progress_cb is not None:
            jax.block_until_ready(cores[-1])
            progress_cb((bi + 1) / n_batches)
    cores = jnp.concatenate(cores, axis=0)[:total]
    grid = cores.reshape(tiles, tiles, step, step)
    stitched = jnp.concatenate(
        [jnp.concatenate(list(row), axis=1) for row in grid], axis=0)
    return stitched[:big_n, :big_n]


@functools.lru_cache(maxsize=32)
def _window_batch_fn(tile_config, halo, step, solver, chunk, engine,
                     spectrum_solver, mask3d=None):
    """Jitted imager for a batch of pre-extracted tile windows (k, n, n):
    the streaming path's kernel — no full-chip array exists anywhere."""
    n = tile_config.n

    @jax.jit
    def window_batch(windows, socs):
        def one(window):
            if mask3d is not None:
                window = mask3d.apply(window, tile_config)
            spectrum = mask_spectrum(window, tile_config, solver=spectrum_solver)
            img = socs_image(spectrum, socs, tile_config,
                             solver=solver, chunk=chunk, engine=engine)
            return img[halo : halo + step, halo : halo + step]

        return jax.lax.map(one, windows)

    return window_batch


def tiled_socs_image_stream(
    window_fn,
    big_n: int,
    socs: SOCSKernels,
    tile_config: OpticsConfig,
    *,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    spectrum_solver: str = "gau23",
    tiles_per_dispatch: int = 8,
    mask3d=None,
) -> jnp.ndarray:
    """(M, M) aerial image of a chip that never exists as one array.

    ``window_fn(row0, col0) -> (n, n) float32`` supplies the mask window
    whose low corner sits at CHIP pixel (row0, col0) — both may be negative
    (halo outside the chip: return zeros there). Windows are produced on the
    host per dispatch batch, so peak memory is O(tiles_per_dispatch * n^2)
    regardless of chip size: a 65536^2 layout streams through a 1024^2
    optical field without a 17-gigapixel raster ever being materialized
    (pair with :func:`..io.layout.window_provider` to rasterize GDSII/OASIS
    polygons window by window)."""
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    _check_mask3d_halo(mask3d, halo)

    coords = np.stack(np.meshgrid(np.arange(tiles), np.arange(tiles),
                                  indexing="ij"), -1).reshape(-1, 2)
    total = len(coords)
    k = max(1, min(tiles_per_dispatch, total))
    pad_tiles = (-total) % k
    if pad_tiles:
        coords = np.concatenate([coords, np.zeros((pad_tiles, 2), coords.dtype)])

    batch_fn = _window_batch_fn(tile_config, halo, step, solver, chunk,
                                engine, spectrum_solver, mask3d)
    cores = []
    for start in range(0, len(coords), k):
        block = coords[start : start + k]
        windows = np.stack([
            np.asarray(window_fn(int(ti) * step - halo, int(tj) * step - halo),
                       np.float32)
            for ti, tj in block])
        cores.append(batch_fn(jnp.asarray(windows), socs))
    cores = jnp.concatenate(cores, axis=0)[:total]
    grid = cores.reshape(tiles, tiles, step, step)
    stitched = jnp.concatenate(
        [jnp.concatenate(list(row), axis=1) for row in grid], axis=0)
    return stitched[:big_n, :big_n]


def tiled_socs_image_field(
    mask_big: jnp.ndarray,
    tile_config: OpticsConfig,
    source_map,
    aberrations_fn,
    *,
    field_points: int = 3,
    rank: int = 64,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    spectrum_solver: str = "gau23",
    tiles_per_dispatch: int = 8,
    polarization=None,
    apodize: bool = True,
    chromatic=None,
    blend: str = "linear",
    mask3d=None,
) -> jnp.ndarray:
    """Full-chip image under FIELD-DEPENDENT aberrations: scanner optics
    aberrate differently across the slit/field, so one pupil cannot serve
    the whole chip. ``aberrations_fn(fx, fy) -> OSA coefficient vector``
    gives the wavefront at normalized field position (fx, fy) in [-1, 1]^2
    (chip center = (0, 0)).

    Field-point sampling (the standard production-OPC treatment, cf.
    field-dependent aberration metrology in Fourier-ptychography pupil
    estimation): the field is sampled on a ``field_points`` ^2 grid and one
    SOCS kernel set is built per sample (jitted builder, cached per config)
    — so the kernel-build cost is O(field_points^2), not O(tiles^2), while
    tiles at the field edge genuinely print with edge aberrations.
    ``field_points=1`` reduces exactly to :func:`tiled_socs_image` with
    center aberrations.

    ``blend`` controls how tiles between field samples are imaged:

    * ``"linear"`` (default): each tile's image is the separable-linear
      interpolation of its (up to 4) surrounding samples' images — the
      incoherent intensity interpolates exactly (kernels do not), so
      printed CDs vary CONTINUOUSLY across the chip instead of jumping at
      field-zone boundaries. Costs up to 4 imaging passes per interior
      tile.
    * ``"nearest"``: one kernel set per tile (the cheap discontinuous
      assignment; exact distance ties break toward the field center so the
      assignment stays mirror-symmetric).

    ``polarization``/``apodize`` switch the per-sample kernel builds to the
    polarized vector build (:func:`..ops.hopkins.randomized_socs_vector`),
    making the full-chip field-dependent image carry Jones-pupil physics;
    ``chromatic`` (a :class:`..config.LaserSpectrum`) to the polychromatic
    build (:func:`..ops.hopkins.randomized_socs_chromatic`) — both compose.
    """
    from ..simulate import _socs_build_with_channels

    if blend not in ("linear", "nearest"):
        raise ValueError(f"unknown blend mode {blend!r}")
    big_n = mask_big.shape[-1]
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    _check_mask3d_halo(mask3d, halo)
    pad_lo = halo
    pad_hi = tiles * step + halo - big_n + (n - step)
    padded = jnp.pad(jnp.asarray(mask_big, jnp.float32),
                     ((pad_lo, pad_hi), (pad_lo, pad_hi)))

    # field-sample centers in normalized coordinates
    if field_points < 1:
        raise ValueError("field_points must be >= 1")
    centers = (np.linspace(-1.0, 1.0, field_points + 2)[1:-1]
               if field_points > 1 else np.zeros(1))

    tile_centers = ((np.arange(tiles) + 0.5) * step / big_n) * 2.0 - 1.0

    def axis_weights(tc: float) -> list[tuple[int, float]]:
        """Per-axis (sample index, weight) pairs for one tile center."""
        if blend == "nearest" or len(centers) == 1:
            d = np.abs(tc - centers) + 1e-9 * np.abs(centers)
            return [(int(d.argmin()), 1.0)]
        if tc <= centers[0]:
            return [(0, 1.0)]
        if tc >= centers[-1]:
            return [(len(centers) - 1, 1.0)]
        i1 = int(np.searchsorted(centers, tc))
        i0 = i1 - 1
        a = float((tc - centers[i0]) / (centers[i1] - centers[i0]))
        if a < 1e-9:
            return [(i0, 1.0)]
        if a > 1.0 - 1e-9:
            return [(i1, 1.0)]
        return [(i0, 1.0 - a), (i1, a)]

    per_tile = [axis_weights(float(tc)) for tc in tile_centers]

    # (sample_iy, sample_ix) -> list of (ti, tj, weight); only referenced
    # samples get a kernel build
    groups: dict = {}
    for ti in range(tiles):
        for tj in range(tiles):
            for iy, wy in per_tile[ti]:
                for ix, wx in per_tile[tj]:
                    groups.setdefault((iy, ix), []).append(
                        (ti, tj, wy * wx))

    build = _socs_build_with_channels(tile_config, rank, polarization,
                                      apodize, chromatic)
    src_dev = jnp.asarray(np.asarray(source_map, np.float32))
    kernel_sets = {}
    for (i, j) in groups:
        coeffs = np.asarray(
            aberrations_fn(float(centers[j]), float(centers[i])), np.float32)
        kernel_sets[(i, j)] = build(jnp.asarray(coeffs), src_dev)[0]

    run = _tile_batch_fn(tile_config, halo, step, solver, chunk, engine,
                         spectrum_solver, mask3d)
    out = np.zeros((tiles, tiles, step, step), np.float32)
    for key, members in groups.items():
        socs = kernel_sets[key]
        members = np.asarray(members, np.float64)
        idx = members[:, :2].astype(np.int64)
        wts = members[:, 2].astype(np.float32)
        k = max(1, min(tiles_per_dispatch, len(members)))
        pad_t = (-len(idx)) % k
        batch = np.concatenate(
            [idx, np.zeros((pad_t, 2), idx.dtype)]) if pad_t else idx
        cores = []
        for start in range(0, len(batch), k):
            cores.append(run(padded, socs, jnp.asarray(batch[start:start + k])))
        cores = np.asarray(jnp.concatenate(cores, axis=0))[:len(idx)]
        np.add.at(out, (idx[:, 0], idx[:, 1]),
                  wts[:, None, None] * cores)
    stitched = out.transpose(0, 2, 1, 3).reshape(tiles * step, tiles * step)
    return jnp.asarray(stitched[:big_n, :big_n])


def array_window_fn(mask_big, n: int):
    """A ``window_fn`` over an in-memory chip array (zero-padded outside) —
    the streaming path's reference provider, used to cross-check against
    :func:`tiled_socs_image`. ``n`` is the tile/window size."""
    mask_big = np.asarray(mask_big, np.float32)
    big_n = mask_big.shape[-1]

    def window_fn(row0: int, col0: int) -> np.ndarray:
        out = np.zeros((n, n), np.float32)
        r_lo, r_hi = max(row0, 0), min(row0 + n, big_n)
        c_lo, c_hi = max(col0, 0), min(col0 + n, big_n)
        if r_lo < r_hi and c_lo < c_hi:
            out[r_lo - row0 : r_hi - row0, c_lo - col0 : c_hi - col0] = \
                mask_big[r_lo:r_hi, c_lo:c_hi]
        return out

    return window_fn


@functools.lru_cache(maxsize=16)
def _film_tile_batch_fn(tile_config, halo, step, solver, chunk, engine,
                        spectrum_solver, normalize, total_rank, mask3d=None):
    """Jitted per-batch tile imager for the film stack: one spectrum per
    window, then a ``lax.map`` over the per-slab SOCS kernel sets (stacked
    along a leading nz axis — same rank every slab, see
    :func:`..simulate.film_socs_kernels`). Kernels ride as jit ARGUMENTS
    (closure-captured device arrays lower as constants; CLAUDE.md)."""
    n = tile_config.n

    @jax.jit
    def tile_batch(padded, kernels_z, eigen_z, source_total, coord_block):
        def one(c):
            window = jax.lax.dynamic_slice(
                padded, (c[0] * step, c[1] * step), (n, n))
            if mask3d is not None:
                window = mask3d.apply(window, tile_config)
            spectrum = mask_spectrum(window, tile_config,
                                     solver=spectrum_solver)

            def slab(kz):
                k, e = kz
                img = socs_image(spectrum, SOCSKernels(k, e, total_rank),
                                 tile_config, solver=solver, chunk=chunk,
                                 engine=engine)
                if normalize:
                    img = img / jnp.maximum(source_total, 1e-30)
                return img[halo : halo + step, halo : halo + step]

            return jax.lax.map(slab, (kernels_z, eigen_z))

        return jax.lax.map(one, coord_block)  # (k, nz, step, step)

    return tile_batch


def tiled_film_stack(
    mask_big,
    kernels: list,
    tile_config: OpticsConfig,
    *,
    source_total=None,
    normalize: bool = True,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    spectrum_solver: str = "gau23",
    tiles_per_dispatch: int = 8,
    progress_cb=None,
    mask3d=None,
) -> jnp.ndarray:
    """(nz, M, M) rigorous in-film exposure of an arbitrarily large mask —
    the full-chip counterpart of :func:`..simulate.film_socs_stack`: each
    tile window is imaged once per resist slab with that slab's film-SOCS
    kernel set (:func:`..simulate.film_socs_kernels`), and the halo-free
    tile cores are stitched per slab.

    The imaging locality argument of :func:`tiled_socs_image` holds per
    slab unchanged — each slab's summed TCC is a fixed-size optical system
    whose coherent kernels decay over a few lambda/NA — so one halo serves
    every depth. Memory stays O(nz * tile^2) per dispatch regardless of
    chip size; feed the stitched stack to
    :meth:`..models.resist.DepthResist.develop_profile` (on a
    ``.rigorous()`` instance) for the full-chip 3-D develop.

    ``normalize=True`` needs ``source_total`` (sum of source weights), the
    exact-path scaling contract shared with ``film_socs_stack``.
    (Full-chip analog of the reference's single-field partial-coherence
    loop, /root/reference/imageformation.py:47-77; the reference has no
    resist/film or tiling capability — its README.md:19 roadmap.)
    """
    if not kernels:
        raise ValueError("kernels must be a non-empty list of per-slab "
                         "SOCSKernels (see film_socs_kernels)")
    if normalize and source_total is None:
        raise ValueError("normalize=True needs source_total (sum of source "
                         "weights) to match the exact path's scaling")
    ranks = {s.kernels.shape for s in kernels}
    if len(ranks) != 1:
        raise ValueError(f"per-slab kernel sets must share one shape, got "
                         f"{sorted(ranks)}")
    big_n = mask_big.shape[-1]
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    _check_mask3d_halo(mask3d, halo)

    pad_lo = halo
    pad_hi = tiles * step + halo - big_n + (n - step)
    padded = jnp.pad(jnp.asarray(mask_big, jnp.float32),
                     ((pad_lo, pad_hi), (pad_lo, pad_hi)))

    kernels_z = jnp.stack([s.kernels for s in kernels])      # (nz, r, n, n)
    eigen_z = jnp.stack([s.eigenvalues for s in kernels])    # (nz, r)
    total_rank = int(kernels[0].total_rank)
    total_w = jnp.float32(source_total if source_total is not None else 1.0)

    coords = np.stack(np.meshgrid(np.arange(tiles), np.arange(tiles),
                                  indexing="ij"), -1).reshape(-1, 2)
    total = len(coords)
    k = max(1, min(tiles_per_dispatch, total))
    pad_tiles = (-total) % k
    if pad_tiles:
        coords = np.concatenate([coords, np.zeros((pad_tiles, 2), coords.dtype)])

    run = _film_tile_batch_fn(tile_config, halo, step, solver, chunk, engine,
                              spectrum_solver, normalize, total_rank, mask3d)
    cores = []
    n_batches = len(coords) // k
    for bi, start in enumerate(range(0, len(coords), k)):
        block = jnp.asarray(coords[start : start + k])
        cores.append(run(padded, kernels_z, eigen_z, total_w, block))
        if progress_cb is not None:
            jax.block_until_ready(cores[-1])
            progress_cb((bi + 1) / n_batches)
    cores = jnp.concatenate(cores, axis=0)[:total]  # (tiles^2, nz, step, step)
    nz = cores.shape[1]
    grid = cores.reshape(tiles, tiles, nz, step, step)
    stitched = grid.transpose(2, 0, 3, 1, 4).reshape(
        nz, tiles * step, tiles * step)
    return stitched[:, :big_n, :big_n]


def tiled_socs_image_scan(
    mask_big: jnp.ndarray,
    socs: SOCSKernels,
    tile_config: OpticsConfig,
    *,
    halo: int | None = None,
    solver: str = "gau23",
    chunk: int = 4,
    engine: str = "auto",
    spectrum_solver: str = "gau23",
    mask3d=None,
) -> jnp.ndarray:
    """Same as :func:`tiled_socs_image` but with the tile loop inside one
    compiled ``lax.map`` — a single dispatch, best when the whole run fits
    the accelerator's dispatch budget."""
    big_n = mask_big.shape[-1]
    n = tile_config.n
    if halo is None:
        halo = default_halo(tile_config)
    tiles, step = tile_layout(big_n, n, halo)
    _check_mask3d_halo(mask3d, halo)
    pad_lo = halo
    pad_hi = tiles * step + halo - big_n + (n - step)
    padded = jnp.pad(mask_big, ((pad_lo, pad_hi), (pad_lo, pad_hi)))

    coords = np.stack(np.meshgrid(np.arange(tiles), np.arange(tiles),
                                  indexing="ij"), -1).reshape(-1, 2)

    run = _tile_batch_fn(tile_config, halo, step, solver, chunk, engine,
                         spectrum_solver, mask3d)
    cores = run(padded, socs, jnp.asarray(coords))  # (tiles^2, step, step)
    grid = cores.reshape(tiles, tiles, step, step)
    stitched = jnp.concatenate(
        [jnp.concatenate(list(row), axis=1) for row in grid], axis=0)
    return stitched[:big_n, :big_n]
