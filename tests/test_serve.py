"""HTTP serving endpoint: drive it over a real socket."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from lithographysimulator_tpu import LightSource, OpticsConfig, demo_bars, simulate
from lithographysimulator_tpu.serve import _decode_array, _encode_array, make_server

CFG = OpticsConfig(pixel_number=32)


@pytest.fixture(scope="module")
def server():
    srv = make_server("127.0.0.1", 0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok" and payload["device_count"] >= 1


def test_simulate_endpoint_matches_local(server):
    mask = np.asarray(demo_bars(CFG).geometry)
    status, payload = _post(server, "/simulate", {
        "pixel_number": 32,
        "mask": _encode_array(mask),
        "source": {"kind": "classical", "sigma_out": 0.5},
        "normalize": True,
    })
    assert status == 200
    image = _decode_array(payload["image"])
    assert image.shape == (32, 32)
    local = np.asarray(simulate(
        demo_bars(CFG), LightSource(CFG, sigma_out=0.5).classical(),
        normalize=True).image)
    np.testing.assert_allclose(image, local, rtol=1e-6)
    assert payload["report"]["source_points"] > 0


def test_bad_requests(server):
    status, payload = _post(server, "/simulate", {"pixel_number": 32})
    assert status == 400 and "mask" in payload["error"]
    status, payload = _post(server, "/simulate", {
        "pixel_number": 32,
        "mask": _encode_array(np.zeros((32, 32))),
        "source": {"kind": "laser"},
    })
    assert status == 400 and "laser" in payload["error"]
    status, _ = _post(server, "/nope", {})
    assert status == 404


def test_resource_limits_rejected(server):
    # Oversized pixel_number / socs_rank must 400 before any allocation
    # or compile happens (ADVICE r1: a huge value would wedge the server).
    mask = _encode_array(np.zeros((32, 32)))
    for body in (
        {"pixel_number": 65536, "mask": mask},
        {"pixel_number": 4, "mask": mask},
        {"pixel_number": 32, "mask": mask, "socs_rank": 10**6},
        {"pixel_number": 32, "mask": mask, "chunk": 10**6},
    ):
        status, payload = _post(server, "/simulate", body)
        assert status == 400 and "out of range" in payload["error"]


def test_requests_counted(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as resp:
        payload = json.loads(resp.read())
    assert payload["requests_served"] >= 1
