"""The examples must keep running (the framework tour is user-facing)."""

import pytest

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_production_flow_example(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / "production_flow.py"),
         "--cpu", "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    for marker in ("MRC:", "ORC:", "FEM:", "stochastic:", "wrote"):
        assert marker in out, out
    assert (tmp_path / "printed_contours.gds").exists()
    assert (tmp_path / "corrected_mask.npy").exists()
