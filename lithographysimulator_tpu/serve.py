"""Lightweight HTTP serving endpoint for the imaging pipeline.

A stdlib-only JSON-over-HTTP server for production-style deployment: one
process owns the accelerator, keeps jit caches and SOCS kernel sets warm
across requests, and serves imaging to many clients.

Endpoints (POST, JSON body; arrays as nested lists or base64 float32):

* ``/simulate`` — full pipeline. Body: config fields + ``mask`` (n x n),
  ``source`` spec (kind/sigmas/poles/rotation/shift), optional
  ``aberrations``, ``solver``, ``normalize``. Returns the aerial image
  (base64 float32) + the run report.
* ``/health`` — GET; device info + uptime.

Start: ``python -m lithographysimulator_tpu.serve --port 8100`` or
:func:`serve` programmatically. Single-threaded by design: requests
serialize onto the one device (jax dispatch is not thread-safe per device);
front with a load balancer across chips for scale-out.
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def _encode_array(arr: np.ndarray) -> dict:
    arr = np.ascontiguousarray(np.asarray(arr, np.float32))
    return {
        "shape": list(arr.shape),
        "dtype": "float32",
        "data_b64": base64.b64encode(arr.tobytes()).decode("ascii"),
    }


def _decode_array(obj) -> np.ndarray:
    if isinstance(obj, dict) and "data_b64" in obj:
        raw = base64.b64decode(obj["data_b64"])
        return np.frombuffer(raw, dtype=obj.get("dtype", "float32")).reshape(
            obj["shape"]).copy()
    return np.asarray(obj, np.float32)


class LithoService:
    """Request handling, separated from HTTP plumbing for testability."""

    # Request-body limits: a hostile/buggy pixel_number or socs_rank would
    # trigger multi-GB allocations and minutes-long compiles, wedging the
    # server. Out-of-range values are rejected with 400.
    MAX_PIXEL_NUMBER = 2048
    MAX_SOCS_RANK = 1024
    MAX_CHUNK = 64

    def __init__(self):
        self.started = time.time()
        self.requests_served = 0
        self._lock = threading.Lock()

    def health(self) -> dict:
        from .utils.profiling import device_info

        return {
            "status": "ok",
            "uptime_s": round(time.time() - self.started, 1),
            "requests_served": self.requests_served,
            **device_info(),
        }

    def simulate(self, body: dict) -> dict:
        from .config import OpticsConfig
        from .models.mask import from_array
        from .models.source import LightSource
        from .simulate import simulate

        pixel_number = int(body.get("pixel_number", 64))
        socs_rank = int(body.get("socs_rank", 128))
        chunk = int(body.get("chunk", 4))
        if not 8 <= pixel_number <= self.MAX_PIXEL_NUMBER:
            raise ValueError(
                f"pixel_number {pixel_number} out of range [8, {self.MAX_PIXEL_NUMBER}]")
        if not 1 <= socs_rank <= self.MAX_SOCS_RANK:
            raise ValueError(
                f"socs_rank {socs_rank} out of range [1, {self.MAX_SOCS_RANK}]")
        if not 1 <= chunk <= self.MAX_CHUNK:
            raise ValueError(f"chunk {chunk} out of range [1, {self.MAX_CHUNK}]")

        config = OpticsConfig(
            pixel_number=pixel_number,
            pixel_size=float(body.get("pixel_size", 25.0)),
            wavelength=float(body.get("wavelength", 193.0)),
            na=float(body.get("na", 0.7)),
        )
        mask = from_array(_decode_array(body["mask"]), config)

        src_spec = body.get("source", {})
        ls = LightSource(
            config,
            sigma_in=float(src_spec.get("sigma_in", 0.0)),
            sigma_out=float(src_spec.get("sigma_out", 0.6)),
            shift_x=float(src_spec.get("shift_x", 0.0)),
            shift_y=float(src_spec.get("shift_y", 0.0)),
        )
        kind = src_spec.get("kind", "classical")
        if kind == "annular":
            source = ls.annular()
        elif kind == "classical":
            source = ls.classical()
        elif kind == "quasar":
            source = ls.quasar(int(src_spec.get("poles", 4)),
                               float(src_spec.get("rotation", -np.pi / 8)))
        elif kind == "dipole":
            source = ls.dipole(float(src_spec.get("rotation", 0.0)))
        elif kind == "monopole":
            source = ls.monopole()
        else:
            raise ValueError(f"unknown source kind {kind!r}")

        with self._lock:  # one device, serialize jax dispatch
            result = simulate(
                mask, source, body.get("aberrations"),
                solver=body.get("solver", "gau23"),
                chunk=chunk,
                normalize=bool(body.get("normalize", False)),
                socs_rank=socs_rank,
            )
            self.requests_served += 1
        return {"image": _encode_array(result.image), "report": result.report}

    def dispatch(self, path: str, body: dict | None) -> tuple[int, dict]:
        try:
            if path == "/health":
                return 200, self.health()
            if path == "/simulate":
                return 200, self.simulate(body or {})
            return 404, {"error": f"unknown endpoint {path}"}
        except (KeyError, ValueError, TypeError) as exc:
            return 400, {"error": f"{type(exc).__name__}: {exc}"}
        except Exception as exc:  # noqa: BLE001 - surface as 500
            return 500, {"error": f"{type(exc).__name__}: {exc}"}


def make_server(host: str = "127.0.0.1", port: int = 8100) -> HTTPServer:
    service = LithoService()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status: int, payload: dict):
            blob = json.dumps(payload, default=repr).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):  # noqa: N802 (stdlib API)
            status, payload = service.dispatch(self.path, None)
            self._reply(status, payload)

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid JSON body"})
                return
            status, payload = service.dispatch(self.path, body)
            self._reply(status, payload)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    server = HTTPServer((host, port), Handler)
    server.service = service  # type: ignore[attr-defined]
    return server


def serve(host: str = "127.0.0.1", port: int = 8100):
    server = make_server(host, port)
    print(f"lithographysimulator_tpu serving on http://{host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8100)
    a = ap.parse_args()
    serve(a.host, a.port)
