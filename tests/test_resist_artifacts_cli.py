"""Resist models, artifact persistence, and the CLI surface."""

import json

import jax
import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    ResistModel,
    critical_dimension,
    demo_bars,
    simulate,
)
from lithographysimulator_tpu.models.resist import exposure_latitude
from lithographysimulator_tpu.ops.hopkins import randomized_socs
from lithographysimulator_tpu.models.pupil import pupil_function
from lithographysimulator_tpu.utils.artifacts import (
    SOCSCache,
    config_fingerprint,
    load_image,
    load_socs,
    save_image,
    save_socs,
)

CFG = OpticsConfig(pixel_number=32)


@pytest.fixture(scope="module")
def aerial():
    src = LightSource(CFG, sigma_out=0.5).classical()
    return np.asarray(simulate(demo_bars(CFG), src, normalize=True).image)


# --- resist ---------------------------------------------------------------

def test_develop_binary_profile(aerial):
    model = ResistModel(threshold=0.4)
    profile = np.asarray(model.develop_binary(aerial, CFG))
    assert set(np.unique(profile)) <= {0.0, 1.0}
    assert 0 < profile.sum() < profile.size


def test_sigmoid_approaches_threshold(aerial):
    soft = ResistModel(threshold=0.4, steepness=5.0)
    hard = ResistModel(threshold=0.4, steepness=500.0)
    p_soft = np.asarray(soft.develop(aerial, CFG))
    p_hard = np.asarray(hard.develop(aerial, CFG))
    binary = np.asarray(hard.develop_binary(aerial, CFG))
    assert np.abs(p_hard - binary).mean() < np.abs(p_soft - binary).mean()


def test_diffusion_blur_smooths(aerial):
    sharp = ResistModel(diffusion_nm=0.0)
    blurred = ResistModel(diffusion_nm=40.0)
    a = np.asarray(sharp.blur(aerial, CFG))
    b = np.asarray(blurred.blur(aerial, CFG))
    # blur preserves total energy (DC) but reduces variation
    np.testing.assert_allclose(a.sum(), b.sum(), rtol=1e-4)
    assert b.std() < a.std()


def test_develop_differentiable(aerial):
    model = ResistModel(threshold=0.4, steepness=20.0, diffusion_nm=20.0)
    g = jax.grad(lambda im: model.develop(im, CFG).sum())(aerial)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_critical_dimension(aerial):
    model = ResistModel(threshold=0.5)
    profile = model.develop_binary(aerial, CFG)
    cd = critical_dimension(profile, CFG)
    assert 0 < cd < CFG.field_nm


def test_exposure_latitude_monotone_trend(aerial):
    model = ResistModel(threshold=0.3)
    cds = exposure_latitude(aerial / aerial.max(), CFG, model,
                            doses=[0.6, 1.0, 1.6])
    assert cds[0] <= cds[1] <= cds[2]  # more dose prints wider bright lines


# --- artifacts ------------------------------------------------------------

def test_image_roundtrip(tmp_path, aerial):
    p = save_image(tmp_path / "img.npy", aerial, {"note": "test"})
    np.testing.assert_array_equal(load_image(p), aerial)
    report = json.loads((tmp_path / "img.report.json").read_text())
    assert report["note"] == "test"


def test_socs_roundtrip(tmp_path):
    src = np.asarray(LightSource(CFG, sigma_out=0.5).classical())
    socs = randomized_socs(pupil_function(np.zeros(1), CFG), src, CFG, rank=8)
    save_socs(tmp_path / "k.npz", socs)
    loaded = load_socs(tmp_path / "k.npz")
    np.testing.assert_array_equal(np.asarray(loaded.kernels), np.asarray(socs.kernels))
    np.testing.assert_array_equal(np.asarray(loaded.eigenvalues),
                                  np.asarray(socs.eigenvalues))
    assert loaded.total_rank == socs.total_rank


def test_socs_cache(tmp_path):
    cache = SOCSCache(tmp_path)
    fp = config_fingerprint(CFG, source="classical", sigma_out=0.5)
    assert cache.get(fp) is None
    src = np.asarray(LightSource(CFG, sigma_out=0.5).classical())
    socs = randomized_socs(pupil_function(np.zeros(1), CFG), src, CFG, rank=4)
    cache.put(fp, socs)
    hit = cache.get(fp)
    assert hit is not None and hit.rank == 4


def test_fingerprint_sensitivity():
    a = config_fingerprint(CFG, sigma_out=0.5)
    b = config_fingerprint(CFG, sigma_out=0.6)
    c = config_fingerprint(OpticsConfig(pixel_number=64), sigma_out=0.5)
    assert len({a, b, c}) == 3


# --- CLI ------------------------------------------------------------------

def test_cli_simulate(tmp_path, capsys):
    from lithographysimulator_tpu.cli import main

    out = tmp_path / "a.npy"
    rc = main(["simulate", "--pixel-number", "32", "--source", "classical",
               "--sigma-out", "0.4", "--mask", "lines", "--out", str(out)])
    assert rc == 0 and out.exists()
    first_line = capsys.readouterr().out.splitlines()[0]
    report = json.loads(first_line)
    assert report["pixel_number"] == 32


def test_cli_socs(tmp_path, capsys):
    from lithographysimulator_tpu.cli import main

    out = tmp_path / "k.npz"
    rc = main(["socs", "--pixel-number", "32", "--source", "annular",
               "--sigma-in", "0.2", "--sigma-out", "0.6",
               "--rank", "8", "--out", str(out)])
    assert rc == 0 and out.exists()
    assert load_socs(out).rank == 8


def test_cli_resist3d(tmp_path, capsys):
    from lithographysimulator_tpu.cli import main

    out = tmp_path / "p.npz"
    fig = tmp_path / "p.png"
    rc = main(["resist3d", "--pixel-number", "32", "--source", "annular",
               "--sigma-in", "0.2", "--sigma-out", "0.6", "--mask", "lines",
               "--nz", "4", "--reflectivity", "0.2", "--peb", "10",
               "--out", str(out), "--plot", str(fig)])
    assert rc == 0 and out.exists() and fig.exists()
    report = json.loads(capsys.readouterr().out.splitlines()[0])
    assert report["nz"] == 4
    assert 0.0 < report["cleared_fraction"] < 1.0
    profile = np.load(out)["profile"]
    assert profile.shape == (4, 32, 32)


def test_cli_resist3d_film(tmp_path, capsys):
    """--film routes through the rigorous image-in-resist (film-stack)
    exposure; --reflectivity conflicts with it."""
    from lithographysimulator_tpu.cli import main

    out = tmp_path / "p.npz"
    rc = main(["resist3d", "--pixel-number", "32", "--source", "classical",
               "--sigma-out", "0.5", "--mask", "lines", "--nz", "4",
               "--film", "--substrate", "si", "--barc", "37",
               "--out", str(out)])
    assert rc == 0 and out.exists()
    report = json.loads(capsys.readouterr().out.splitlines()[0])
    assert report["exposure"] == "film"
    assert 0.0 < report["cleared_fraction"] < 1.0
    assert np.load(out)["profile"].shape == (4, 32, 32)
    # conflicting knobs rejected
    rc = main(["resist3d", "--pixel-number", "32", "--mask", "lines",
               "--film", "--reflectivity", "0.2"])
    assert rc == 2
    capsys.readouterr()


def test_cli_resist3d_film_volumetric_stochastic(capsys):
    """--film --trials runs the volumetric stochastic resist on the
    rigorous (nz, n, n) exposure and reports z-resolved per-slab
    LER/CD/defect statistics (round 5, VERDICT item 5)."""
    from lithographysimulator_tpu.cli import main

    rc = main(["resist3d", "--pixel-number", "32", "--source", "classical",
               "--sigma-out", "0.5", "--mask", "lines", "--nz", "3",
               "--film", "--substrate", "si", "--trials", "6",
               "--dose-photons", "40"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.splitlines()[0])
    sto = report["stochastic"]
    assert sto["trials"] == 6
    assert len(sto["slabs"]) == 3
    assert all(set(s) >= {"ler_nm", "mean_cd_nm", "break_rate",
                          "bridge_rate", "depth_nm"} for s in sto["slabs"])


def test_cli_vector_polarization(tmp_path, capsys):
    """--polarization routes through the Jones-pupil vector engine; at
    hyper-NA the x- and y-polarized images of an asymmetric mask differ."""
    from lithographysimulator_tpu.cli import main

    outs = {}
    for pol in ("x", "y"):
        out = tmp_path / f"{pol}.npy"
        rc = main(["simulate", "--pixel-number", "32", "--na", "1.35",
                   "--immersion-index", "1.437", "--source", "classical",
                   "--sigma-out", "0.5", "--mask", "lines",
                   "--polarization", pol, "--out", str(out)])
        assert rc == 0
        outs[pol] = np.load(out)
    capsys.readouterr()
    diff = np.abs(outs["x"] - outs["y"]).max() / outs["x"].max()
    assert diff > 1e-3  # polarization-dependent printing at NA 1.35


def test_cli_zernike_indexing(tmp_path, capsys):
    """--zernike-indexing noll reorders coefficients: Noll term 4 (defocus)
    equals OSA entry 4, so the two spellings produce identical images."""
    from lithographysimulator_tpu.cli import main

    out_noll = tmp_path / "noll.npy"
    out_osa = tmp_path / "osa.npy"
    common = ["simulate", "--pixel-number", "32", "--source", "classical",
              "--sigma-out", "0.4", "--mask", "lines"]
    assert main(common + ["--zernike-indexing", "noll",
                          "--aberrations", "0", "0", "0", "80",
                          "--out", str(out_noll)]) == 0
    assert main(common + ["--aberrations", "0", "0", "0", "0", "80",
                          "--out", str(out_osa)]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(np.load(out_noll), np.load(out_osa))


def test_cli_rejects_bad_source():
    from lithographysimulator_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["simulate", "--source", "laser"])


def test_simulate_socs_solver_matches_abbe():
    cfg = OpticsConfig(pixel_number=32)
    src = LightSource(cfg, sigma_out=0.5).classical()
    a = np.asarray(simulate(demo_bars(cfg), src, normalize=True).image)
    b = np.asarray(simulate(demo_bars(cfg), src, solver="socs", socs_rank=64,
                            normalize=True).image)
    assert np.sqrt(np.mean((a - b) ** 2)) / a.max() < 2e-4


def test_simulate_socs_auto_rank_default():
    """solver='socs' defaults to auto rank (99.9% captured energy) and
    reports what it picked; repeated calls reuse the cached build."""
    import time

    cfg = OpticsConfig(pixel_number=32)
    src = LightSource(cfg, sigma_out=0.5).classical()
    a = np.asarray(simulate(demo_bars(cfg), src, normalize=True).image)
    res = simulate(demo_bars(cfg), src, solver="socs", normalize=True)
    assert res.report["socs_energy_captured"] >= 0.999
    assert res.report["socs_rank"] >= 1
    b = np.asarray(res.image)
    assert np.sqrt(np.mean((a - b) ** 2)) / a.max() < 2e-3
    t0 = time.perf_counter()
    simulate(demo_bars(cfg), src, solver="socs", normalize=True)
    assert time.perf_counter() - t0 < 2.0  # cached build + compiled apply


def test_device_info():
    from lithographysimulator_tpu.utils import device_info

    info = device_info()
    assert info["device_count"] >= 1 and info["platform"]


def test_cli_enables_persistent_compile_cache(monkeypatch):
    import jax

    from lithographysimulator_tpu.cli import _enable_compile_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    _enable_compile_cache()
    assert str(jax.config.jax_compilation_cache_dir).endswith(".jax_cache")


def test_cli_stochastic_psd_out_implies_psd(tmp_path, capsys):
    """--psd-out without --psd still runs the PSD analysis and writes the
    spectrum (ADVICE r3: it used to be silently ignored)."""
    from lithographysimulator_tpu.cli import main

    out = tmp_path / "spec.npz"
    rc = main(["stochastic", "--pixel-number", "32", "--source", "classical",
               "--trials", "4", "--diffusion", "8",
               "--psd-out", str(out)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.splitlines()[0])
    assert "psd_n_edges" in report
    data = np.load(out)
    assert "psd_nm3" in data and "freq_per_nm" in data
    assert data["psd_nm3"].ndim == 1
