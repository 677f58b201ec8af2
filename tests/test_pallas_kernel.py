"""Fused int8-limb Pallas kernels (interpret mode on CPU).

The int8 engine emulates fp32 contractions with radix-256 limb dots
(ops/kernels/intensity_int8.py); these tests pin its accuracy against the
f32 'highest' implementations and check gradients flow through the
custom-vjp f32 backward path.
"""

import jax
import jax.numpy as jnp
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
from lithographysimulator_tpu.ops.abbe import (
    _intensity_windowed_3m,
    _intensity_windowed_int8,
    _window_size,
    _windowed_products,
    _zoom_dft_window,
    _tiled,
)
from lithographysimulator_tpu.ops.kernels.intensity_int8 import (
    column_intensity_int8,
    fused_window_intensity_int8,
    prepare_t0_limbs,
    quantize_rows,
    reference_window_intensity_int8,
    row_transform_int8,
)


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(0)
    a = (rng.normal(size=(5, 64)) * 10.0 ** rng.integers(-3, 4, (5, 1))).astype(
        np.float32)
    limbs, scale = quantize_rows(jnp.asarray(a))
    limbs = np.asarray(limbs, np.float64)
    back = (limbs[0] + limbs[1] / 256.0 + limbs[2] / 65536.0) * np.asarray(
        scale)[..., None]
    err = np.abs(back - a).max(axis=-1)
    rowmax = np.abs(a).max(axis=-1)
    assert (err <= rowmax * 2.0 ** -23).all()


def test_col_kernel_matches_f32_reference():
    rng = np.random.default_rng(1)
    b, n, w = 3, 64, 40
    yr = rng.normal(size=(b, n, w)).astype(np.float32)
    yi = rng.normal(size=(b, n, w)).astype(np.float32)
    t0 = np.exp(1j * rng.normal(size=(n, w))).astype(np.complex64)
    t0r = jnp.asarray(t0.real)
    t0i = jnp.asarray(t0.imag)
    weights = rng.random(b).astype(np.float32)

    t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)
    out = np.asarray(fused_window_intensity_int8(
        jnp.asarray(yr), jnp.asarray(yi), t_limbs, t_scales,
        jnp.asarray(weights), interpret=True))
    ref = np.asarray(reference_window_intensity_int8(
        jnp.asarray(yr), jnp.asarray(yi), t_limbs, t_scales,
        jnp.asarray(weights)))
    # kernel vs XLA impl of the SAME limb math: tight
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6 * ref.max())

    # limb math vs true f32: limb quantization error only
    hi = jax.lax.Precision.HIGHEST
    er = (jnp.einsum("biw,jw->bij", yr, t0r, precision=hi)
          - jnp.einsum("biw,jw->bij", yi, t0i, precision=hi))
    ei = (jnp.einsum("biw,jw->bij", yr, t0i, precision=hi)
          + jnp.einsum("biw,jw->bij", yi, t0r, precision=hi))
    f32 = np.asarray(jnp.sum(
        jnp.asarray(weights)[:, None, None] * (er * er + ei * ei), axis=0))
    rms = np.sqrt(np.mean((out - f32) ** 2)) / np.abs(f32).max()
    assert rms < 1e-6


def test_row_kernel_matches_f32(rms):
    rng = np.random.default_rng(2)
    b, n, w = 2, 128, 72
    x = (rng.normal(size=(b, w, w)) + 1j * rng.normal(size=(b, w, w))).astype(
        np.complex64)
    t0 = np.exp(1j * rng.normal(size=(n, w))).astype(np.complex64)
    t0r = jnp.asarray(t0.real)
    t0i = jnp.asarray(t0.imag)
    t_limbs, t_scales = prepare_t0_limbs(t0r, t0i)

    ylr, yli, yls, ysc = row_transform_int8(
        jnp.asarray(x), t_limbs, t_scales, interpret=True)
    # dequantize the row-kernel outputs and compare to the f32 transform
    def deq(limbs, s):
        limbs = np.asarray(limbs, np.float64)
        return (limbs[0] + limbs[1] / 256.0
                + limbs[2] / 65536.0) * np.asarray(s)[..., None]
    yr = deq(ylr, ysc[0])
    yi = deq(yli, ysc[1])
    y_f32 = np.einsum("iw,bwv->biv", t0, np.asarray(x))
    assert rms(yr + 1j * yi, y_f32) < 1e-6
    # the 's' plane must equal yr + yi (within its own quantization)
    assert rms(deq(yls, ysc[2]), yr + yi) < 1e-6


def test_row_kernel_splitk_matches_f32(rms):
    """Split-K row kernel (mid-size windows): k-blocked contraction with
    VMEM accumulators agrees with the dense transform, including an uneven
    tile_k that does not divide 512."""
    from lithographysimulator_tpu.ops.kernels.intensity_int8 import (
        row_transform_int8_splitk)

    rng = np.random.default_rng(3)
    b, n, w = 2, 128, 96
    x = (rng.normal(size=(b, w, w)) + 1j * rng.normal(size=(b, w, w))).astype(
        np.complex64)
    t0 = np.exp(1j * rng.normal(size=(n, w))).astype(np.complex64)
    t_limbs, t_scales = prepare_t0_limbs(jnp.asarray(t0.real),
                                         jnp.asarray(t0.imag))

    def deq(limbs, s):
        limbs = np.asarray(limbs, np.float64)
        return (limbs[0] + limbs[1] / 256.0
                + limbs[2] / 65536.0) * np.asarray(s)[..., None]

    y_f32 = np.einsum("iw,bwv->biv", t0, np.asarray(x))
    # 3 k-steps, a padded contraction (96 -> 128), and the degenerate
    # single-block case (tile sizes below 128 are interpret-mode-only)
    for tile_k in (32, 64, 96):
        ylr, yli, yls, ysc = row_transform_int8_splitk(
            jnp.asarray(x), t_limbs, t_scales, tile_k=tile_k, interpret=True)
        yr = deq(ylr, ysc[0])
        yi = deq(yli, ysc[1])
        assert rms(yr + 1j * yi, y_f32) < 1e-6
        assert rms(deq(yls, ysc[2]), yr + yi) < 1e-6


CFG = OpticsConfig(pixel_number=32)


def _setup():
    spec = spectrum_fft(demo_bars(CFG).geometry, CFG)
    pup = pupil_function(np.zeros(1), CFG)
    src = np.asarray(LightSource(CFG, sigma_out=0.4).classical())
    return spec, pup, src


def test_int8_engine_end_to_end():
    spec, pup, src = _setup()
    a = np.asarray(abbe_image(spec, pup, src, CFG, engine="fft"))
    b = np.asarray(abbe_image(spec, pup, src, CFG, engine="int8"))
    rms = np.sqrt(np.mean((b - a) ** 2)) / a.max()
    assert rms < 1e-5


def test_matmul_windowed_phase_free_end_to_end():
    spec, pup, src = _setup()
    a = np.asarray(abbe_image(spec, pup, src, CFG, engine="fft"))
    b = np.asarray(abbe_image(spec, pup, src, CFG, engine="matmul"))
    rms = np.sqrt(np.mean((b - a) ** 2)) / a.max()
    assert rms < 1e-6


def test_pallas_alias_resolves_to_int8():
    from lithographysimulator_tpu.ops.abbe import resolve_engine

    assert resolve_engine("pallas") == "int8"
    with pytest.raises(ValueError):
        resolve_engine("warp9")


@pytest.mark.slow
def test_int8_gradients_flow_through_f32_vjp():
    n = CFG.n
    fft_size = CFG.wavelength_scaling().fft_size
    w = _window_size(n)
    t0 = _zoom_dft_window(n, fft_size)
    t0r = jnp.asarray(t0.real, jnp.float32)
    t0i = jnp.asarray(t0.imag, jnp.float32)
    t0_c = jnp.asarray(t0, jnp.complex64)

    spec, pup, _ = _setup()
    pupil_tiled = _tiled(pup)
    shifts = jnp.asarray([[0, 1], [2, -1]], jnp.int32)
    weights = jnp.asarray([1.0, 0.5], jnp.float32)

    def loss_int8(spectrum):
        x = _windowed_products(pupil_tiled, spectrum, shifts, w, n // 4 - 1)
        return jnp.sum(_intensity_windowed_int8(x, t0r, t0i, weights))

    def loss_f32(spectrum):
        x = _windowed_products(pupil_tiled, spectrum, shifts, w, n // 4 - 1)
        return jnp.sum(_intensity_windowed_3m(x, t0_c, weights))

    g8 = np.asarray(jax.grad(loss_int8)(spec))
    g32 = np.asarray(jax.grad(loss_f32)(spec))
    scale = np.abs(g32).max()
    np.testing.assert_allclose(g8, g32, atol=1e-6 * scale)


@pytest.mark.slow
def test_int8_fast_mode_accuracy_classes():
    """The opt-in 2-limb 'int8_fast' engine: ~1e-5 RMS vs f32 (vs ~1e-7 for
    the exact 6-pass engine), never auto-selected."""
    import numpy as np
    from lithographysimulator_tpu import (LightSource, OpticsConfig,
                                          demo_bars, pupil_function,
                                          spectrum_fft)
    from lithographysimulator_tpu.ops.abbe import (abbe_image_points,
                                                   resolve_engine)
    from lithographysimulator_tpu.parallel import padded_source_arrays

    cfg = OpticsConfig(pixel_number=256)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(np.zeros(5, np.float32), cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    shifts, weights, _ = padded_source_arrays(src, 4)
    ms = int(np.abs(np.asarray(shifts)).max())
    sh, w = shifts[:8], weights[:8]

    def img(engine):
        return np.asarray(abbe_image_points(
            spec, pup, sh, w, cfg, engine=engine, max_abs_shift=ms))

    f32 = img("matmul")
    exact = img("int8")
    fast = img("int8_fast")

    def nrms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)) / b.max())

    assert nrms(exact, f32) < 1e-6      # measured 6.7e-8
    assert 1e-6 < nrms(fast, f32) < 1e-4  # measured 1.2e-5: its own class
    # 'auto' must never pick the reduced-accuracy mode
    assert resolve_engine("auto") in ("fft", "matmul", "int8")
    assert resolve_engine("int8_fast") == "int8_fast"


@pytest.mark.slow
def test_int8_fast_socs_image():
    import numpy as np
    from lithographysimulator_tpu import (LightSource, OpticsConfig,
                                          demo_bars, pupil_function,
                                          randomized_socs, socs_image,
                                          spectrum_fft)

    cfg = OpticsConfig(pixel_number=256)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    socs = randomized_socs(pupil_function(np.zeros(1), cfg), src, cfg,
                           rank=16, power_iters=1, lean=False)
    a = np.asarray(socs_image(spec, socs, cfg, engine="matmul"))
    b = np.asarray(socs_image(spec, socs, cfg, engine="int8_fast"))
    assert float(np.sqrt(np.mean((a - b) ** 2)) / a.max()) < 1e-4
