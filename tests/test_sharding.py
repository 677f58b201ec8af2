"""Multi-chip sharding on the 8-virtual-device CPU mesh: sharded results
must equal the single-device engine bit-for-bit-ish."""

import jax
import numpy as np
import pytest

from lithographysimulator_tpu import (
    LightSource,
    OpticsConfig,
    abbe_image,
    demo_bars,
    pupil_function,
    spectrum_fft,
)
from lithographysimulator_tpu.ops.focus import (
    focus_stack_aberrations,
    through_focus_images,
)
from lithographysimulator_tpu.parallel import (
    abbe_image_sharded,
    focus_source_mesh,
    padded_source_arrays,
    source_mesh,
    through_focus_sharded,
)

CFG = OpticsConfig(pixel_number=32)


@pytest.fixture(scope="module")
def setup():
    spec = spectrum_fft(demo_bars(CFG).geometry, CFG)
    pup = pupil_function(np.array([0, 0, 0, 0, 30], np.float32), CFG)
    src = np.asarray(LightSource(CFG, sigma_in=0.2, sigma_out=0.6).annular())
    return spec, pup, src


def test_eight_devices_visible():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(setup):
    spec, pup, src = setup
    mesh = source_mesh()
    chunk = 8
    shifts, weights, live = padded_source_arrays(src, mesh.shape["source"] * chunk)
    sharded = np.asarray(
        abbe_image_sharded(spec, pup, shifts, weights, CFG, mesh, chunk=chunk)
    )
    single = np.asarray(abbe_image(spec, pup, src, CFG, chunk=chunk))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5 * single.max())


def test_sharded_under_jit(setup):
    spec, pup, src = setup
    mesh = source_mesh()
    shifts, weights, _ = padded_source_arrays(src, mesh.shape["source"] * 8)

    @jax.jit
    def run(spec, pup, s, w):
        return abbe_image_sharded(spec, pup, s, w, CFG, mesh, chunk=8)

    out = np.asarray(run(spec, pup, shifts, weights))
    single = np.asarray(abbe_image(spec, pup, src, CFG, chunk=8))
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-5 * single.max())


@pytest.mark.slow
def test_device_count_invariance(setup):
    """2-device and 8-device meshes produce the same image."""
    spec, pup, src = setup
    results = []
    for ndev in (2, 8):
        mesh = source_mesh(ndev)
        shifts, weights, _ = padded_source_arrays(src, ndev * 4)
        results.append(np.asarray(
            abbe_image_sharded(spec, pup, shifts, weights, CFG, mesh, chunk=4)
        ))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5,
                               atol=1e-5 * results[0].max())


@pytest.mark.slow
def test_through_focus_sharded_matches_vmap(setup):
    spec, _, src = setup
    base = np.array([0, 0, 0.01, 0, 0], np.float32)
    defocus = np.array([-60.0, -20.0, 20.0, 60.0], np.float32)
    stack_ab = focus_stack_aberrations(base, defocus)

    mesh = focus_source_mesh(focus=4, source=2)
    shifts, weights, _ = padded_source_arrays(src, mesh.shape["source"] * 8)

    sharded = np.asarray(through_focus_sharded(
        spec, stack_ab, shifts, weights, CFG, mesh, chunk=8))
    local = np.asarray(through_focus_images(
        spec, stack_ab, shifts, weights, CFG, chunk=8))
    assert sharded.shape == (4, 32, 32)
    np.testing.assert_allclose(sharded, local, rtol=1e-5, atol=1e-5 * local.max())


def test_focus_stack_monotone_blur(setup):
    """Physics sanity: larger |defocus| lowers image contrast."""
    spec, _, src = setup
    defocus = np.array([0.0, 120.0], np.float32)
    stack_ab = focus_stack_aberrations(np.zeros(5, np.float32), defocus)
    shifts, weights, _ = padded_source_arrays(src, 8)
    stack = np.asarray(through_focus_images(
        spec, stack_ab, shifts, weights, CFG, chunk=8, normalize=True))

    def contrast(im):
        # central pattern region, away from the epsilon-resample zero border
        c = im[8:24, 8:24]
        return (c.max() - c.min()) / (c.max() + c.min())

    assert contrast(stack[1]) < contrast(stack[0])


def test_through_focus_socs_matches_abbe(setup):
    from lithographysimulator_tpu.ops.focus import through_focus_socs

    spec, _, src = setup
    defocus = np.array([0.0, 60.0], np.float32)
    base = np.zeros(5, np.float32)
    shifts, weights, _ = padded_source_arrays(src, 8)
    abbe_stack = np.asarray(through_focus_images(
        spec, focus_stack_aberrations(base, defocus), shifts, weights, CFG,
        chunk=8))
    socs_stack = np.asarray(through_focus_socs(
        spec, base, defocus, src, CFG, rank=96))
    assert socs_stack.shape == abbe_stack.shape
    err = np.sqrt(np.mean((socs_stack - abbe_stack) ** 2)) / abbe_stack.max()
    assert err < 5e-4


def test_sharded_windowed_matches_dense(setup):
    """The windowed zoom-DFT contraction works inside shard_map too."""
    spec, pup, src = setup
    mesh = source_mesh()
    shifts, weights, _ = padded_source_arrays(src, mesh.shape["source"] * 4)
    ms = int(np.abs(np.asarray(shifts)).max())
    a = np.asarray(abbe_image_sharded(spec, pup, shifts, weights, CFG, mesh,
                                      chunk=4, engine="matmul"))
    b = np.asarray(abbe_image_sharded(spec, pup, shifts, weights, CFG, mesh,
                                      chunk=4, engine="matmul",
                                      max_abs_shift=ms))
    # The windowed path is the phase-free 3M (Karatsuba) contraction: same
    # math as the dense complex matmul but different rounding order, so
    # tight-tolerance rather than bit-equal.
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6 * np.abs(a).max())


@pytest.mark.slow
def test_socs_image_sharded_matches_local():
    """Rank-sharded SOCS imaging (kernel shards + one psum) equals the
    local kernel-stack image, including a rank that does not divide
    devices * chunk (zero-kernel padding)."""
    import numpy as np
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, pupil_function,
        randomized_socs, socs_image, spectrum_fft)
    from lithographysimulator_tpu.parallel import socs_image_sharded, source_mesh

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    socs = randomized_socs(pupil_function(np.zeros(1), cfg), src, cfg,
                           rank=27, oversample=16, power_iters=2, lean=False)
    mesh = source_mesh()
    sharded = np.asarray(socs_image_sharded(spec, socs, cfg, mesh, chunk=2))
    local = np.asarray(socs_image(spec, socs, cfg, chunk=2))
    np.testing.assert_allclose(sharded, local, rtol=1e-5,
                               atol=1e-5 * local.max())


@pytest.mark.slow
def test_socs_build_sharded_matches_local():
    """Mesh-sharded randomized SOCS kernel BUILD (collective pattern #5:
    row-sharded FFT matvecs + column-sharded whitening grams with psum)
    reproduces the local build's image and eigenvalues at equal seed."""
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, pupil_function,
        randomized_socs, socs_image, spectrum_fft)
    from lithographysimulator_tpu.parallel import (
        randomized_socs_sharded, source_mesh)

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_in=0.2, sigma_out=0.6).annular())
    pup = pupil_function(np.array([0, 0, 0, 0, 30], np.float32), cfg)
    kw = dict(rank=24, oversample=16, power_iters=2, seed=3)
    local = randomized_socs(pup, src, cfg, lean=False, **kw)
    sharded = randomized_socs_sharded(pup, src, cfg, source_mesh(), **kw)
    assert sharded.kernels.shape == local.kernels.shape
    np.testing.assert_allclose(
        np.asarray(sharded.eigenvalues), np.asarray(local.eigenvalues),
        rtol=1e-4, atol=1e-6 * float(local.eigenvalues[0]))
    img_l = np.asarray(socs_image(spec, local, cfg, chunk=4))
    img_s = np.asarray(socs_image(spec, sharded, cfg, chunk=4))
    nrms = np.sqrt(np.mean((img_s - img_l) ** 2)) / img_l.max()
    assert nrms < 1e-5, nrms


def test_socs_build_sharded_nystrom_matches_local():
    """The sharded Nystrom build (one fewer sharded block matvec than RR)
    matches the LOCAL Nystrom build's image and eigenvalues at equal seed —
    the same parity contract as the RR twin above."""
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, pupil_function,
        randomized_socs, socs_image, spectrum_fft)
    from lithographysimulator_tpu.parallel import (
        randomized_socs_sharded, source_mesh)

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_in=0.2, sigma_out=0.6).annular())
    pup = pupil_function(np.array([0, 0, 0, 0, 30], np.float32), cfg)
    kw = dict(rank=24, oversample=16, power_iters=1, seed=3, method="nystrom")
    local = randomized_socs(pup, src, cfg, lean=False, **kw)
    sharded = randomized_socs_sharded(pup, src, cfg, source_mesh(), **kw)
    np.testing.assert_allclose(
        np.asarray(sharded.eigenvalues), np.asarray(local.eigenvalues),
        rtol=1e-4, atol=1e-6 * float(local.eigenvalues[0]))
    img_l = np.asarray(socs_image(spec, local, cfg, chunk=4))
    img_s = np.asarray(socs_image(spec, sharded, cfg, chunk=4))
    nrms = np.sqrt(np.mean((img_s - img_l) ** 2)) / img_l.max()
    assert nrms < 1e-5, nrms


@pytest.mark.slow
def test_socs_build_sharded_device_count_invariance():
    """2-device and 8-device sharded builds agree (collective correctness
    does not depend on the shard count)."""
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, pupil_function, socs_image,
        spectrum_fft)
    from lithographysimulator_tpu.parallel import (
        randomized_socs_sharded, source_mesh)

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    pup = pupil_function(np.zeros(1, np.float32), cfg)
    images = []
    for ndev in (2, 8):
        socs = randomized_socs_sharded(
            pup, src, cfg, source_mesh(ndev), rank=16, oversample=8,
            power_iters=1, seed=0)
        images.append(np.asarray(socs_image(spec, socs, cfg, chunk=4)))
    np.testing.assert_allclose(images[0], images[1], rtol=1e-5,
                               atol=1e-5 * images[0].max())


@pytest.mark.slow
def test_socs_build_sharded_warm_start_interchange():
    """A LOCAL build's Ritz basis warm-starts the SHARDED build (and the
    sharded basis round-trips): power_iters=0 from a warm basis matches the
    cold power_iters=2 build's image."""
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, pupil_function,
        randomized_socs, socs_image, spectrum_fft)
    from lithographysimulator_tpu.parallel import (
        randomized_socs_sharded, source_mesh)

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.6).classical())
    pup = pupil_function(np.array([0, 0, 0, 0, 20], np.float32), cfg)
    kw = dict(rank=20, oversample=12, seed=1)
    cold, basis = randomized_socs(pup, src, cfg, lean=False, power_iters=2,
                                  return_basis=True, **kw)
    warm = randomized_socs_sharded(pup, src, cfg, source_mesh(),
                                   power_iters=0, init_basis=basis, **kw)
    img_c = np.asarray(socs_image(spec, cold, cfg, chunk=4))
    img_w = np.asarray(socs_image(spec, warm, cfg, chunk=4))
    nrms = np.sqrt(np.mean((img_w - img_c) ** 2)) / img_c.max()
    assert nrms < 1e-4, nrms


@pytest.mark.slow
def test_socs_components_build_sharded_matches_local():
    """Mesh-sharded frequency-side summed-TCC build (vector/chromatic
    component stacks) matches the local components build."""
    from lithographysimulator_tpu import OpticsConfig, LightSource, demo_bars, spectrum_fft
    from lithographysimulator_tpu import pupil_function, socs_image
    from lithographysimulator_tpu.ops.hopkins import (
        randomized_socs_components, vector_component_stack)
    from lithographysimulator_tpu.parallel import (
        randomized_socs_components_sharded, source_mesh)

    cfg = OpticsConfig(pixel_number=32, na=0.9)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    pup = pupil_function(np.array([0, 0, 0, 0, 15], np.float32), cfg)
    comps, q = vector_component_stack(pup, cfg, polarization="unpolarized")
    kw = dict(rank=20, oversample=12, power_iters=2, seed=2)
    local = randomized_socs_components(comps, q, src, cfg, **kw)
    sharded = randomized_socs_components_sharded(
        comps, q, src, cfg, source_mesh(), **kw)
    np.testing.assert_allclose(
        np.asarray(sharded.eigenvalues), np.asarray(local.eigenvalues),
        rtol=1e-4, atol=1e-6 * float(local.eigenvalues[0]))
    img_l = np.asarray(socs_image(spec, local, cfg, chunk=4))
    img_s = np.asarray(socs_image(spec, sharded, cfg, chunk=4))
    nrms = np.sqrt(np.mean((img_s - img_l) ** 2)) / img_l.max()
    assert nrms < 1e-5, nrms


def test_fem_cd_matrix_sharded_matches_host(setup):
    """Device-side (focus x dose) FEM cell pass on the 2-D mesh equals the
    same math computed from the host focal stack, and CD grows with dose."""
    from lithographysimulator_tpu.models.resist import ResistModel
    from lithographysimulator_tpu.parallel import fem_cd_matrix_sharded

    spec, _, src = setup
    mesh = focus_source_mesh(focus=2, source=4)
    shifts, weights, _ = padded_source_arrays(src, mesh.shape["source"] * 4)
    base = np.zeros(5, np.float32)
    defocus = np.array([0.0, 80.0], np.float32)
    doses = np.array([0.8, 1.0, 1.2], np.float32)
    resist = ResistModel(threshold=0.3, steepness=60.0, diffusion_nm=10.0)

    cds = np.asarray(fem_cd_matrix_sharded(
        spec, base, defocus, doses, shifts, weights, CFG, mesh,
        resist=resist, chunk=4))
    assert cds.shape == (2, 3)

    stack = np.asarray(through_focus_images(
        spec, focus_stack_aberrations(base, defocus), shifts, weights, CFG,
        chunk=4))
    norm = stack / stack.max()
    import jax.numpy as jnp
    blurred = np.stack([np.asarray(resist.blur(jnp.asarray(im), CFG))
                        for im in norm])
    cut = blurred[:, CFG.n // 2]
    expect = np.stack([
        (1.0 / (1.0 + np.exp(-resist.steepness * (cut * d - resist.threshold)))
         ).sum(axis=-1) * CFG.pixel_size
        for d in doses], axis=1)
    np.testing.assert_allclose(cds, expect, rtol=1e-4, atol=1e-3)
    # more dose -> more printed width, at every focus
    assert (np.diff(cds, axis=1) > 0).all()


@pytest.mark.slow
def test_fem_cd_matrix_sharded_grad():
    """The sharded FEM matrix is differentiable in the aberrations
    (process-window-aware SMO objective)."""
    import jax
    import jax.numpy as jnp
    from lithographysimulator_tpu import (
        LightSource, OpticsConfig, demo_bars, spectrum_fft)
    from lithographysimulator_tpu.parallel import (
        fem_cd_matrix_sharded, focus_source_mesh, padded_source_arrays)

    cfg = OpticsConfig(pixel_number=32)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    mesh = focus_source_mesh(focus=2, source=4)
    shifts, weights, _ = padded_source_arrays(src, mesh.shape["source"] * 4)

    def loss(base):
        cds = fem_cd_matrix_sharded(
            spec, base, jnp.array([0.0, 60.0]), jnp.array([1.0]),
            shifts, weights, cfg, mesh, chunk=4)
        return jnp.var(cds)

    g = jax.grad(loss)(jnp.zeros(5, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_stochastic_band_sharded_matches_host():
    """Trial-sharded print-probability band (4th collective pattern): one
    global key split sharded over 8 devices equals the single-device
    ensemble mean bit-for-bit (up to f32 sum order)."""
    from lithographysimulator_tpu.models.stochastic import (StochasticResist,
                                                            exposure_trials)
    from lithographysimulator_tpu.parallel.mesh import source_mesh
    from lithographysimulator_tpu.parallel.stochastic_sharded import (
        print_probability_sharded)

    cfg = OpticsConfig(pixel_number=32, pixel_size=5.0)
    rng = np.random.default_rng(0)
    image = np.abs(np.fft.ifft2(np.fft.fft2(rng.random((32, 32))) *
                                np.exp(-0.05 * np.arange(32)[:, None])))
    image = image / image.max()
    model = StochasticResist(dose_photons_per_nm2=8.0, diffusion_nm=6.0,
                             threshold=0.4)
    mesh = source_mesh(8)
    band = np.asarray(print_probability_sharded(
        image, cfg, model, mesh, trials_per_device=4, seed=5))
    host = np.asarray(exposure_trials(image, cfg, model, trials=32, seed=5,
                                      trial_chunk=32)).mean(axis=0)
    np.testing.assert_allclose(band, host, atol=1e-6)
    assert 0.0 <= band.min() and band.max() <= 1.0


def test_stochastic_volume_band_sharded_matches_host():
    """Trial-sharded VOLUMETRIC print-probability == the single-device
    ensemble's (nz, n, n) band over the same seed (one global key split,
    sharded over the mesh — bit parity up to f32 sum order)."""
    from lithographysimulator_tpu.models.stochastic import (
        StochasticResist, stochastic_volume_ensemble)
    from lithographysimulator_tpu.parallel import (
        print_probability_volume_sharded)
    from lithographysimulator_tpu.parallel.mesh import source_mesh

    cfg = OpticsConfig(pixel_number=32, pixel_size=5.0)
    rng = np.random.default_rng(1)
    base = np.abs(np.fft.ifft2(np.fft.fft2(rng.random((32, 32))) *
                               np.exp(-0.05 * np.arange(32)[:, None])))
    stack = np.stack([base, 0.7 * base, 0.5 * base]).astype(np.float32)
    stack = stack / stack.max()
    model = StochasticResist(dose_photons_per_nm2=8.0, diffusion_nm=6.0,
                             threshold=0.4)
    mesh = source_mesh(8)
    band = np.asarray(print_probability_volume_sharded(
        stack, cfg, model, mesh, dz_nm=40.0, trials_per_device=2, seed=5))
    host = stochastic_volume_ensemble(stack, cfg, model, dz_nm=40.0,
                                      trials=16, seed=5)
    np.testing.assert_allclose(band, host["print_probability"], atol=1e-6)
    assert band.shape == stack.shape
    assert 0.0 <= band.min() and band.max() <= 1.0


def test_film_stack_sharded_matches_local():
    """Source-psum film stack == single-chip film_stack_images, scalar and
    vector, including under an M3D boundary layer."""
    import lithographysimulator_tpu as lt
    from lithographysimulator_tpu import BoundaryLayer, WaferStack
    from lithographysimulator_tpu.parallel import film_stack_sharded
    from lithographysimulator_tpu.parallel.mesh import source_mesh

    cfg = OpticsConfig(pixel_number=32, na=0.85)
    mask = demo_bars(cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.6).classical())
    wafer = WaferStack(n_resist=1.71 + 0.01j, thickness_nm=120.0,
                       under_layers=((37.0, 1.82 + 0.39j),))
    mesh = source_mesh()
    depths = [20.0, 60.0, 100.0]
    for pol, m3d in ((None, None),
                     ("unpolarized", None),
                     (None, BoundaryLayer(width_nm=8.0, beta_h=-0.2,
                                          beta_v=-0.2 + 0.05j))):
        local = np.asarray(lt.film_stack_images(
            mask, src, config=cfg, wafer_stack=wafer, depths_nm=depths,
            polarization=pol, mask3d=m3d, normalize=True))
        sharded = np.asarray(film_stack_sharded(
            mask, src, config=cfg, wafer_stack=wafer, mesh=mesh,
            depths_nm=depths, polarization=pol, mask3d=m3d, normalize=True))
        assert sharded.shape == (3, cfg.n, cfg.n)
        np.testing.assert_allclose(sharded, local, rtol=1e-5,
                                   atol=1e-5 * local.max())
