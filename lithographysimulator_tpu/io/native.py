"""ctypes bridge to the native C++ polygon rasterizer.

The shared library is built on demand from ``native/rasterizer.cpp`` with the
system toolchain and cached next to the source. A pure-numpy fallback with
identical semantics (pixel-center even-odd fill) keeps everything working
where no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SOURCE = _NATIVE_DIR / "rasterizer.cpp"
_LIB = _NATIVE_DIR / "librasterizer.so"

_lib_handle = None
_native_unavailable = False


def _cache_lib_path() -> Path:
    """Per-user build location for installs where the checkout's native/
    directory is read-only (site-packages, system installs)."""
    import os
    base = Path(os.environ.get("XDG_CACHE_HOME",
                               Path.home() / ".cache"))
    return base / "lithographysimulator_tpu" / "librasterizer.so"


def _build_library(target: Path) -> bool:
    try:
        target.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(target),
             str(_SOURCE)],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _resolve_lib_path():
    """Pick a usable .so: the checkout's, else a user-cache build, else
    None (callers fall back to the pure-numpy rasterizer)."""
    if not _SOURCE.exists():
        return _LIB if _LIB.exists() else None
    if _LIB.exists() and _SOURCE.stat().st_mtime <= _LIB.stat().st_mtime:
        return _LIB
    if _build_library(_LIB):
        return _LIB
    cached = _cache_lib_path()
    if cached.exists() and _SOURCE.stat().st_mtime <= cached.stat().st_mtime:
        return cached
    if _build_library(cached):
        return cached
    return None


def _get_lib():
    global _lib_handle, _native_unavailable
    if _lib_handle is not None or _native_unavailable:
        return _lib_handle
    lib_path = _resolve_lib_path()
    if lib_path is None:
        _native_unavailable = True
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        _native_unavailable = True
        return None
    for name in ("rasterize_polygons", "rasterize_polygons_aa",
                 "trace_loops"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
    lib.trace_loops.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,
    ]
    lib.rasterize_polygons.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.rasterize_polygons_aa.argtypes = lib.rasterize_polygons.argtypes[:7] + [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    _lib_handle = lib
    return lib


def native_available() -> bool:
    return _get_lib() is not None


def trace_loops_native(binary: np.ndarray):
    """Native boundary-loop tracing, or None when the library is
    unavailable: returns a list of (v, 2) int32 pixel-corner loops for a
    {0,1} uint8 raster (see ``native/rasterizer.cpp`` trace_loops; the
    pure-python equivalent lives in :mod:`.contours`)."""
    lib = _get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(binary.astype(np.uint8))
    h, w = arr.shape
    inner = arr.astype(bool)
    pad = np.zeros((h + 2, w + 2), bool)
    pad[1:-1, 1:-1] = inner
    n_edges = int((inner & ~pad[:-2, 1:-1]).sum()
                  + (inner & ~pad[2:, 1:-1]).sum()
                  + (inner & ~pad[1:-1, :-2]).sum()
                  + (inner & ~pad[1:-1, 2:]).sum())
    if n_edges == 0:
        return []
    out_xy = np.empty((n_edges, 2), np.int32)
    loop_sizes = np.empty(n_edges // 4 + 1, np.int32)
    rc = lib.trace_loops(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(h), np.int32(w),
        out_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.longlong(n_edges),
        loop_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.longlong(loop_sizes.size))
    if rc < 0:
        return None  # capacity miscount: fall back to python
    loops, off = [], 0
    for k in range(rc):
        m = int(loop_sizes[k])
        loops.append(out_xy[off:off + m].copy())
        off += m
    return loops


def _pack(polygons):
    sizes = np.asarray([len(p) for p in polygons], np.int32)
    if len(polygons):
        xy = np.concatenate([np.asarray(p, np.float64).reshape(-1, 2)
                             for p in polygons]).ravel()
    else:
        xy = np.zeros(0, np.float64)
    return np.ascontiguousarray(xy), sizes


def rasterize(polygons, *, origin=(0.0, 0.0), pixel_size: float, n: int,
              antialias: int = 0) -> np.ndarray:
    """Rasterize polygons (lists of (x, y) vertices, layout units) onto an
    (n, n) float32 grid. ``origin`` is the (x, y) of the grid's low corner;
    row iy samples y = origin[1] + (iy + 0.5) * pixel_size. ``antialias`` > 1
    enables ss x ss coverage sampling (gray-level output)."""
    grid = np.zeros((n, n), np.float32)
    xy, sizes = _pack(polygons)
    if len(sizes) == 0:
        return grid
    lib = _get_lib()
    if lib is not None:
        c_xy = xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        c_sizes = sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        c_grid = grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if antialias > 1:
            rc = lib.rasterize_polygons_aa(
                c_xy, c_sizes, len(sizes), float(origin[0]), float(origin[1]),
                float(pixel_size), n, int(antialias), c_grid)
        else:
            rc = lib.rasterize_polygons(
                c_xy, c_sizes, len(sizes), float(origin[0]), float(origin[1]),
                float(pixel_size), n, c_grid)
        if rc != 0:
            raise RuntimeError(f"native rasterizer failed (rc={rc})")
        return grid
    return _rasterize_numpy(polygons, origin, pixel_size, n, antialias)


def _rasterize_numpy(polygons, origin, pixel_size, n, antialias) -> np.ndarray:
    """Pure-numpy fallback: same pixel-center even-odd rule (vectorized
    crossing-number test per polygon bounding box)."""
    ss = max(1, int(antialias))
    nn = n * ss
    px = pixel_size / ss
    grid = np.zeros((nn, nn), np.float32)
    cx = origin[0] + (np.arange(nn) + 0.5) * px
    cy = origin[1] + (np.arange(nn) + 0.5) * px
    for poly in polygons:
        v = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(v) < 3:
            continue
        x1, y1 = v[:, 0], v[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        iy_lo = max(0, int(np.floor((y1.min() - origin[1]) / px - 0.5)))
        iy_hi = min(nn, int(np.ceil((y1.max() - origin[1]) / px)))
        for iy in range(iy_lo, iy_hi):
            y = cy[iy]
            crosses = (y1 <= y) != (y2 <= y)
            if not crosses.any():
                continue
            xs = x1[crosses] + (y - y1[crosses]) / (y2[crosses] - y1[crosses]) \
                * (x2[crosses] - x1[crosses])
            inside = (np.sum(cx[None, :] >= np.sort(xs)[:, None], axis=0) % 2) == 1
            grid[iy, inside] = 1.0
    if ss == 1:
        return grid
    coarse = grid.reshape(n, ss, n, ss).mean(axis=(1, 3))
    return np.minimum(coarse, 1.0).astype(np.float32)
