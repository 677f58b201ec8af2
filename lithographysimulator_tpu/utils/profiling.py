"""Tracing and stage timing.

The reference's only observability is ``time.time()`` deltas printed per
demo stage (reference ``imageformation.py:104-122``). Here: structured stage
timers with device synchronization (so times mean what they say under async
dispatch), optional ``jax.profiler`` trace capture for xprof/TensorBoard, and
a plain-logging bridge.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("lithographysimulator_tpu")


class StageTimer:
    """Collects named stage wall-clock times with device sync at the edges.

    >>> timer = StageTimer()
    >>> with timer.stage("spectrum") as out:
    ...     out.append(mask_spectrum(geom, cfg))
    >>> timer.report()
    {'spectrum': 0.0123}
    """

    def __init__(self, *, sync: bool = True, log: bool = False):
        self.sync = sync
        self.log = log
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        """Times a block. Yields a list: append the block's device outputs to
        it so the exit barrier blocks on the *actual* stage work —

        >>> with timer.stage("spectrum") as out:
        ...     out.append(mask_spectrum(geom, cfg))

        With nothing appended, falls back to a generic barrier
        (``jax.effects_barrier`` + a dummy transfer), which may under-report
        stages whose async dispatches are still in flight.
        """
        outputs: list = []
        if self.sync:
            _sync()
        t0 = time.perf_counter()
        try:
            yield outputs
        finally:
            if self.sync:
                _sync(*outputs)
            elapsed = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + elapsed
            if self.log:
                logger.info("stage %s: %.4f s", name, elapsed)

    def report(self) -> dict:
        return dict(self.times)


def _sync(*outputs):
    """Barrier on device work: blocks on ``outputs`` when given (the only
    reliable completion signal under async dispatch), plus a best-effort
    global barrier."""
    try:
        if outputs:
            jax.block_until_ready(outputs)
        jax.effects_barrier()
        jax.block_until_ready(jax.device_put(0.0))
    except Exception:  # pragma: no cover - sync is best-effort
        pass


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace around a block (view with xprof /
    TensorBoard).

    >>> with trace("/tmp/litho-trace"):
    ...     image = simulate(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: label a function's device work in profiler traces."""

    def wrap(fn):
        def inner(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        inner.__name__ = getattr(fn, "__name__", name)
        return inner

    return wrap


def device_info() -> dict:
    """Which backend/devices jax selected — the analog of the
    reference's MPS -> CUDA -> CPU waterfall prints (reference
    ``mask.py:7-18`` etc., duplicated per module there; one place here)."""
    devices = jax.devices()
    return {
        "platform": devices[0].platform,
        "device_count": len(devices),
        "devices": [str(d) for d in devices],
        "default_backend": jax.default_backend(),
    }
