"""Test harness configuration.

Tests run on CPU with 8 virtual XLA host devices so multi-chip sharding
(`jax.sharding.Mesh` over ICI in production) is exercised without TPU
hardware. Must be set before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize pins JAX_PLATFORMS to the TPU tunnel; the
# config update below overrides it reliably even after that.
jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_memory_mappings():
    """XLA:CPU keeps ~5-10 virtual-memory mappings alive per compiled
    executable held in jit caches. At this suite's scale (604 tests,
    thousands of compiled programs) the process crosses the kernel's
    vm.max_map_count (65530 default) and LLVM segfaults inside a later
    compile — observed as a deterministic 'Fatal Python error:
    Segmentation fault' in backend_compile_and_load at ~95% of the full
    suite (test_vector_socs), while the same test passes standalone.
    Dropping compiled programs after every test module keeps the mapping
    count bounded; modules rarely share traced programs, so the recompile
    cost is noise (measured: clear_caches releases the mappings)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def golden():
    """Loader for reference-generated golden fixtures."""

    def load(name: str) -> np.ndarray:
        path = GOLDEN_DIR / f"{name}.npy"
        if not path.exists():
            pytest.skip(f"golden fixture {name} missing — run tools/gen_golden.py")
        return np.load(path)

    return load


def normalized_rms(a: np.ndarray, b: np.ndarray) -> float:
    """RMS difference after normalizing both arrays by b's peak magnitude
    (the reference's outputs are unnormalized — SURVEY §2.2.4)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if np.iscomplexobj(a) or np.iscomplexobj(b):
        a = a.astype(np.complex128)
        b = b.astype(np.complex128)
    else:
        a = a.astype(np.float64)
        b = b.astype(np.float64)
    scale = np.max(np.abs(b))
    if scale == 0:
        return float(np.sqrt(np.mean(np.abs(a) ** 2)))
    return float(np.sqrt(np.mean(np.abs(a - b) ** 2)) / scale)


@pytest.fixture
def rms():
    return normalized_rms
