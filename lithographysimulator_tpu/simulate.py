"""High-level one-call simulation pipeline.

The TPU-native equivalent of the reference's end-to-end demo driver
(``imageformation.py:79-122``): build mask spectrum + pupil + source from
config, run the Abbe engine, return the aerial image and a structured run
report. Everything under the hood is jit-compiled; repeated calls with the
same static (config, solver, point-count) signature reuse the compiled
executable.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from .config import OpticsConfig
from .models.mask import Mask
from .models.pupil import pupil_function
from .ops.abbe import abbe_image_points, source_points
from .ops.fraunhofer import mask_spectrum
from .ops.hopkins import randomized_socs, socs_image


@dataclasses.dataclass(frozen=True)
class SimulationResult:
    image: jnp.ndarray
    spectrum: jnp.ndarray
    pupil: jnp.ndarray
    source_map: np.ndarray
    report: dict


@functools.lru_cache(maxsize=32)
def _compiled_pipeline(config: OpticsConfig, solver: str, chunk: int,
                       normalize: bool, max_abs_shift: int | None,
                       polarization=None, apodize: bool = True):
    @functools.partial(jax.jit)
    def run(geometry, aberrations, shifts, weights):
        spectrum = mask_spectrum(geometry, config, solver=solver)
        pupil = pupil_function(aberrations, config)
        if polarization is None:
            image = abbe_image_points(
                spectrum, pupil, shifts, weights, config,
                solver=solver, chunk=chunk, normalize=normalize,
                max_abs_shift=max_abs_shift,
            )
        else:
            from .ops.vector import vector_abbe_image

            image = vector_abbe_image(
                spectrum, pupil, shifts, weights, config,
                polarization=polarization, apodize=apodize,
                solver=solver, chunk=chunk, normalize=normalize,
                max_abs_shift=max_abs_shift,
            )
        return image, spectrum, pupil

    return run


@functools.lru_cache(maxsize=32)
def _compiled_socs_pipeline(config: OpticsConfig, chunk: int, normalize: bool,
                            rank: int):
    @functools.partial(jax.jit)
    def run(geometry, aberrations, source_map):
        spectrum = mask_spectrum(geometry, config, solver="gau23")
        pupil = pupil_function(aberrations, config)
        socs = randomized_socs(pupil, source_map, config, rank=rank)
        image = socs_image(spectrum, socs, config, chunk=chunk)
        if normalize:
            total = jnp.sum(source_map)
            image = jnp.where(total > 0,
                              image / jnp.maximum(total, 1e-30), 0.0)
        return image, spectrum, pupil

    return run


def simulate(
    mask: Mask,
    source_map,
    aberrations=None,
    *,
    solver: Literal["gau23", "direct", "socs"] = "gau23",
    chunk: int = 4,
    normalize: bool = False,
    block: bool = True,
    socs_rank: int = 128,
    polarization=None,
    apodize: bool = True,
) -> SimulationResult:
    """Run the full pipeline. ``source_map`` is a concrete (n, n) weight map
    (e.g. from :class:`..models.source.LightSource`).

    ``solver='socs'`` runs the Hopkins eigenkernel fast path (rank
    ``socs_rank``) — approximate to ~1e-4 relative but dramatically faster
    for dense sources; 'gau23'/'direct' are the exact Abbe solvers.

    ``polarization`` (None = scalar imaging): 'unpolarized', 'x', 'y', or a
    Jones 2-vector — switches to the vector/high-NA Jones-pupil engine
    (:mod:`.ops.vector`); ``apodize`` adds the 1/sqrt(cos theta) radiometric
    obliquity factor."""
    config = mask.config
    t0 = time.perf_counter()

    src_np = np.asarray(source_map)
    pts = source_points(src_np)
    pad = (-pts.live_count) % chunk
    shifts = np.concatenate([pts.shifts, np.zeros((pad, 2), np.int32)])
    weights = np.concatenate([pts.weights, np.zeros((pad,), np.float32)])

    if aberrations is None:
        aberrations = np.zeros((1,), np.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)

    if isinstance(polarization, (list, np.ndarray)):
        polarization = tuple(complex(v) for v in polarization)

    if solver == "socs":
        if polarization is not None:
            raise ValueError(
                "vector imaging (polarization=...) requires the exact Abbe "
                "solvers ('gau23'/'direct'), not 'socs'")
        run = _compiled_socs_pipeline(config, chunk, normalize, socs_rank)
        image, spectrum, pupil = run(mask.geometry, aberrations,
                                     jnp.asarray(src_np))
    else:
        max_abs_shift = int(np.abs(shifts).max()) if shifts.size else 0
        run = _compiled_pipeline(config, solver, chunk, normalize,
                                 max_abs_shift, polarization, apodize)
        image, spectrum, pupil = run(mask.geometry, aberrations,
                                     jnp.asarray(shifts), jnp.asarray(weights))
    if block:
        image = jax.block_until_ready(image)
    elapsed = time.perf_counter() - t0

    ws = config.wavelength_scaling()
    report = {
        "solver": solver,
        "pixel_number": config.n,
        "pixel_size_nm": config.pixel_size,
        "wavelength_nm": config.wavelength,
        "na": config.na,
        "beta": ws.beta,
        "fft_size": ws.fft_size,
        "epsilon": ws.epsilon,
        "source_points": pts.live_count,
        "polarization": (str(polarization) if polarization is not None
                         else "scalar"),
        "wall_clock_s": elapsed,
    }
    return SimulationResult(
        image=image, spectrum=spectrum, pupil=pupil,
        source_map=src_np, report=report,
    )
