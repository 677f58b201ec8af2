"""Artifact persistence: aerial images, run reports, and cached SOCS kernels.

The reference recomputes everything on every run and serializes nothing
(SURVEY §5 'Checkpoint / resume': absent). Here, expensive reusable state —
above all the TCC/SOCS eigenkernels, which amortize across every mask imaged
under the same optics — round-trips through ``.npz`` files keyed by the
optical configuration.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig
from ..xfer import to_device_complex, to_host_complex
from ..ops.hopkins import SOCSKernels


def config_fingerprint(config: OpticsConfig, **extra) -> str:
    """Stable short hash of an optical configuration (plus any extra keys
    like source/pupil descriptors) for cache filenames."""
    payload = {"config": dataclasses.asdict(config), **extra}
    blob = json.dumps(payload, sort_keys=True, default=repr).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_image(path, image, report: dict | None = None) -> Path:
    """Save an aerial image (.npy) with an optional sidecar .json report."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, np.asarray(image))
    if report is not None:
        Path(str(path.with_suffix("")) + ".report.json").write_text(
            json.dumps(report, indent=2, default=repr))
    return path


def load_image(path) -> np.ndarray:
    return np.load(Path(path))


def save_socs(path, socs: SOCSKernels) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        kernels=to_host_complex(socs.kernels),
        eigenvalues=np.asarray(socs.eigenvalues),
        total_rank=np.asarray(socs.total_rank),
    )
    return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


def load_socs(path) -> SOCSKernels:
    with np.load(Path(path)) as data:
        return SOCSKernels(
            kernels=to_device_complex(data["kernels"]),
            eigenvalues=jnp.asarray(data["eigenvalues"]),
            total_rank=int(data["total_rank"]),
        )


class SOCSCache:
    """Disk cache of SOCS kernel sets keyed by optics+source fingerprints."""

    def __init__(self, directory):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)

    def path_for(self, fingerprint: str) -> Path:
        return self.directory / f"socs_{fingerprint}.npz"

    def get(self, fingerprint: str) -> SOCSKernels | None:
        path = self.path_for(fingerprint)
        return load_socs(path) if path.exists() else None

    def put(self, fingerprint: str, socs: SOCSKernels) -> Path:
        return save_socs(self.path_for(fingerprint), socs)
