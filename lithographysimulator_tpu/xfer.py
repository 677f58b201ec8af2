"""Host <-> device transfer helpers.

Some serving backends (e.g. the axon TPU tunnel) cannot serialize complex
dtypes across the host/device boundary: uploads and readbacks of complex64
arrays fail with UNIMPLEMENTED. These helpers route complex data through
real/imaginary float32 planes. Dependency-free leaf module so every layer can
use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_device_complex(array) -> jnp.ndarray:
    """Host array -> device; complex input is shipped as re/im f32 planes."""
    if isinstance(array, jnp.ndarray) and not isinstance(array, np.ndarray):
        return array  # already a device array
    arr = np.asarray(array)
    if not np.iscomplexobj(arr):
        return jnp.asarray(arr)
    re = jnp.asarray(arr.real.astype(np.float32))
    im = jnp.asarray(arr.imag.astype(np.float32))
    return jax.lax.complex(re, im)


def to_host_complex(array) -> np.ndarray:
    """Device array -> host numpy; complex is read back as re/im planes."""
    arr = jnp.asarray(array)
    if jnp.issubdtype(arr.dtype, jnp.complexfloating):
        re = np.asarray(jnp.real(arr))
        im = np.asarray(jnp.imag(arr))
        return re + 1j * im
    return np.asarray(arr)
