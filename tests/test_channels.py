"""Principal-channel compression of weighted component SOCS stacks.

The summed TCC T = sum_i q_i T_i depends on the component stack only
through the frequency-wise outer products x(k) x(k)^H of the weighted
components x_i(k) = sqrt(q_i) C_i(k): T is invariant under unitary channel
mixing, and truncating the mixed stack to the top-K eigenchannels of the
channel Gram drops exactly the discarded eigenvalue share of trace(T).
These tests pin the invariance (full rotation is exact), the truncation
bound, the static-channels jit path, and end-to-end image parity for the
vector and chromatic builds. No reference counterpart (the reference is
scalar + monochromatic, pupil.py:6); the oracle is the uncompressed build.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lithographysimulator_tpu import (
    LaserSpectrum,
    LightSource,
    OpticsConfig,
    demo_bars,
    principal_channel_rotation,
    pupil_function,
    randomized_socs_chromatic,
    randomized_socs_vector,
    socs_image,
    spectrum_fft,
)
from lithographysimulator_tpu.ops.hopkins import (
    apply_channel_rotation,
    channel_gram,
    compress_components,
    dedup_polarization_factors,
)

ABERR = np.asarray([0, 0, 0.02, 0, 30.0, 0.01], np.float32)
BUILD = dict(rank=48, oversample=24, power_iters=3)


def _setup(na=0.9, n=32):
    cfg = OpticsConfig(pixel_number=n, na=na)
    spec = spectrum_fft(demo_bars(cfg).geometry, cfg)
    pup = pupil_function(ABERR, cfg)
    src = np.asarray(LightSource(cfg, sigma_out=0.5).classical())
    return cfg, spec, pup, src


def _nrms(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / b.max())


def _component_stack(pup, cfg, polarization="unpolarized"):
    factors = dedup_polarization_factors(cfg, polarization)
    comps = jnp.stack(
        [jnp.asarray(f, jnp.complex64) * pup for _, f in factors])
    q = np.asarray([w for w, _ in factors], np.float32)
    return comps, q


def test_gram_trace_is_component_energy():
    """trace(S) equals sum_i q_i sum_k |C_i(k)|^2 (the r0 the auto-rank
    energy accounting uses)."""
    cfg, _, pup, _ = _setup()
    comps, q = _component_stack(pup, cfg)
    s_pair = np.asarray(channel_gram(comps, q))
    s = s_pair[0] + 1j * s_pair[1]
    np.testing.assert_allclose(np.abs(s - s.conj().T).max(), 0, atol=1e-3)
    energy = float(np.sum(q[:, None, None] * np.abs(np.asarray(comps)) ** 2))
    np.testing.assert_allclose(np.trace(s).real, energy, rtol=1e-5)


def test_full_rotation_is_exact():
    """Keeping ALL channels is a pure unitary mixing: the build's image
    matches the uncompressed build to float noise."""
    cfg, spec, pup, src = _setup()
    comps, _ = _component_stack(pup, cfg)
    c = comps.shape[0]
    plain = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                   **BUILD)
    rot, captured = principal_channel_rotation(comps, np.full(c, 0.2), channels=c)
    assert captured == pytest.approx(1.0, abs=1e-12)
    full = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                  channel_rotation=rot, **BUILD)
    img_a = np.asarray(socs_image(spec, plain, cfg))
    img_b = np.asarray(socs_image(spec, full, cfg))
    assert _nrms(img_b, img_a) < 2e-4
    np.testing.assert_allclose(np.asarray(full.eigenvalues),
                               np.asarray(plain.eigenvalues),
                               rtol=1e-3, atol=1e-5)


def test_auto_refuses_to_compress_incompressible_vector_stack():
    """At hyper-NA the 5 deduped unpolarized components are genuinely
    diverse (z- and cross-pol channels carry ~NA^2-scale energy, far above
    the 1e-6 trace tolerance): 'auto' keeps all channels — compression never
    silently trades accuracy. A LOOSER explicit tolerance does compress,
    with image error at the corresponding scale."""
    cfg, spec, pup, src = _setup()
    comps, q = _component_stack(pup, cfg)
    rot, captured = principal_channel_rotation(comps, q)
    assert rot.shape[2] == comps.shape[0]  # tight tol: no-op at NA 0.9
    # NA 0.6: six deduped components, one EXACTLY redundant (zero channel
    # eigenvalue) — auto finds the dependence even at tight tolerance, and
    # a loose 3e-3 tolerance keeps 4 of 6.
    cfg6, spec6, pup6, src6 = (lambda t: t)(_setup(na=0.6))
    comps6, q6 = _component_stack(pup6, cfg6)
    rot_t, _ = principal_channel_rotation(comps6, q6)
    assert rot_t.shape[2] == comps6.shape[0] - 1
    rot3, captured3 = principal_channel_rotation(comps6, q6, tol=3e-3)
    assert rot3.shape[2] <= comps6.shape[0] - 2
    plain = randomized_socs_vector(pup6, src6, cfg6,
                                   polarization="unpolarized", **BUILD)
    loose = randomized_socs_vector(pup6, src6, cfg6,
                                   polarization="unpolarized",
                                   channel_rotation=rot3, **BUILD)
    assert _nrms(np.asarray(socs_image(spec6, loose, cfg6)),
                 np.asarray(socs_image(spec6, plain, cfg6))) < 30 * (1 - captured3)


def test_scalar_limit_channel_capture_grows_as_na_shrinks():
    """The first principal channel (the common co-pol ~ P field) captures
    1 - O(NA^2): ~99% at NA 0.2, more at NA 0.1 — the quantitative scalar
    limit of the channel spectrum."""
    caps = {}
    for na in (0.2, 0.1):
        cfg, _, pup, _ = _setup(na=na)
        comps, q = _component_stack(pup, cfg)
        _, caps[na] = principal_channel_rotation(comps, q, channels=1)
    assert caps[0.2] > 0.98
    assert caps[0.1] > caps[0.2]
    assert caps[0.1] > 0.997


@pytest.mark.slow
def test_truncation_error_tracks_dropped_trace():
    """Image error decreases monotonically-ish with kept channels and the
    K=C image is exact; a hard 1-channel truncation at hyper-NA leaves a
    visibly larger (but bounded) residual."""
    cfg, spec, pup, src = _setup()
    comps, q = _component_stack(pup, cfg)
    c = comps.shape[0]
    plain = np.asarray(socs_image(
        spec, randomized_socs_vector(pup, src, cfg,
                                     polarization="unpolarized", **BUILD),
        cfg))
    errs = {}
    for k in (1, 2, c):
        rot, captured = principal_channel_rotation(comps, q, channels=k)
        socs = randomized_socs_vector(pup, src, cfg,
                                      polarization="unpolarized",
                                      channel_rotation=rot, **BUILD)
        errs[k] = (_nrms(np.asarray(socs_image(spec, socs, cfg)), plain),
                   1 - captured)
    assert errs[c][0] < 2e-4
    assert errs[2][0] < errs[1][0] + 1e-6
    # dropped trace fraction bounds the scale of the image residual
    for k in (1, 2):
        err, dropped = errs[k]
        assert err < 50 * max(dropped, 1e-7)


def test_static_channels_matches_host_rotation():
    """The pure-jit path (static int channels, device eigh + unitarity
    polish) agrees with the host-side rotation path."""
    cfg, spec, pup, src = _setup()
    comps, q = _component_stack(pup, cfg)
    rot, _ = principal_channel_rotation(comps, q, channels=3)
    host = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                  channel_rotation=rot, **BUILD)
    dev = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                 channels=3, **BUILD)
    assert _nrms(np.asarray(socs_image(spec, dev, cfg)),
                 np.asarray(socs_image(spec, host, cfg))) < 2e-4


def test_static_channels_traceable():
    """compress_components works under jit (the channel count is static) —
    the production path for builds living entirely inside a jitted fn."""
    cfg, spec, pup, src = _setup()

    @jax.jit
    def build_image(pup, src):
        socs = randomized_socs_vector(pup, src, cfg,
                                      polarization="unpolarized",
                                      channels=2, **BUILD)
        return socs_image(spec, socs, cfg)

    jitted = np.asarray(build_image(pup, jnp.asarray(src)))
    eager = np.asarray(socs_image(spec, randomized_socs_vector(
        pup, src, cfg, polarization="unpolarized", channels=2, **BUILD), cfg))
    assert _nrms(jitted, eager) < 1e-5


def test_auto_under_jit_raises():
    cfg, _, pup, src = _setup()

    @jax.jit
    def bad(pup, src):
        return randomized_socs_vector(pup, src, cfg,
                                      polarization="unpolarized",
                                      channels="auto", **BUILD).eigenvalues

    with pytest.raises(ValueError, match="concrete components"):
        bad(pup, jnp.asarray(src))


def test_chromatic_stack_compresses_hard():
    """A narrow-bandwidth 5-sample polychromatic stack is nearly parallel:
    2-3 principal channels carry 1 - 1e-6 of the energy, and the compressed
    build reproduces the uncompressed polychromatic image."""
    cfg, spec, _, src = _setup(na=0.7)
    laser = LaserSpectrum(bandwidth_pm=0.6, focus_nm_per_pm=-250.0, samples=5)
    plain = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser, **BUILD)
    auto = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser,
                                     channels="auto", **BUILD)
    from lithographysimulator_tpu import chromatic_aberrations

    stack_ab, q_f = chromatic_aberrations(ABERR, laser)
    pupils = jax.vmap(lambda ab: pupil_function(ab, cfg))(stack_ab)
    rot, captured = principal_channel_rotation(pupils, q_f)
    assert captured >= 1 - 1e-6
    assert rot.shape[2] <= 3
    assert _nrms(np.asarray(socs_image(spec, auto, cfg)),
                 np.asarray(socs_image(spec, plain, cfg))) < 5e-4


def test_product_stack_compression():
    """Polarization x spectrum product stacks compress multiplicatively-ish:
    the 5-sample x V-component product collapses to roughly
    (spectral channels) x (vector channels), and the compressed build
    matches the uncompressed one."""
    cfg, spec, _, src = _setup(na=0.7)
    laser = LaserSpectrum(bandwidth_pm=0.6, focus_nm_per_pm=-250.0,
                          samples=5)
    from lithographysimulator_tpu.ops.hopkins import chromatic_component_stack

    comps, q = chromatic_component_stack(ABERR, cfg, spectrum=laser,
                                         polarization="unpolarized")
    c = comps.shape[0]
    assert c >= 25  # V >= 5 vector components x 5 focus samples
    rot, captured = principal_channel_rotation(comps, q)
    assert captured >= 1 - 1e-6
    assert rot.shape[2] <= 15  # ~K_v * K_chrom, far below C (measured 13)
    plain = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser,
                                      polarization="unpolarized", **BUILD)
    comp = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser,
                                     polarization="unpolarized",
                                     channel_rotation=rot, **BUILD)
    assert _nrms(np.asarray(socs_image(spec, comp, cfg)),
                 np.asarray(socs_image(spec, plain, cfg))) < 5e-4


def test_nystrom_method_on_component_builds():
    """method='nystrom' reaches the vector and chromatic builds through
    randomized_socs_components: image parity with the RR build at one fewer
    block matvec per build."""
    cfg, spec, pup, src = _setup()
    plain = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                   **BUILD)
    ny = randomized_socs_vector(pup, src, cfg, polarization="unpolarized",
                                rank=48, oversample=24, power_iters=2,
                                method="nystrom")
    assert _nrms(np.asarray(socs_image(spec, ny, cfg)),
                 np.asarray(socs_image(spec, plain, cfg))) < 2e-4

    laser = LaserSpectrum(bandwidth_pm=0.6, focus_nm_per_pm=-250.0, samples=3)
    plain_c = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser,
                                        **BUILD)
    ny_c = randomized_socs_chromatic(ABERR, src, cfg, spectrum=laser,
                                     rank=48, oversample=24, power_iters=2,
                                     method="nystrom")
    assert _nrms(np.asarray(socs_image(spec, ny_c, cfg)),
                 np.asarray(socs_image(spec, plain_c, cfg))) < 2e-4


def test_simulate_layer_rotation_cache():
    """The simulate-layer cache compresses chromatic stacks (the rotation is
    aberration-independent, computed once per optics setup), declines
    scalar configs, and keeps hyper-NA vector stacks uncompressed."""
    from lithographysimulator_tpu.simulate import _channel_rotation_cached

    cfg = OpticsConfig(pixel_number=32, na=0.7)
    laser = LaserSpectrum(bandwidth_pm=0.6, focus_nm_per_pm=-250.0,
                          samples=5)
    assert _channel_rotation_cached(cfg, None, True, None) is None
    rot = _channel_rotation_cached(cfg, None, True, laser)
    assert rot is not None and rot.shape == (2, 5, rot.shape[2])
    assert rot.shape[2] <= 3
    # same object on a second call (lru) — the build pays the eigh once
    assert _channel_rotation_cached(cfg, None, True, laser) is rot


def test_config_channel_tol_knob():
    """OpticsConfig.channel_tol reaches the simulate-layer rotation cache:
    a loose tolerance compresses the NA-0.6 vector stack harder than the
    default; invalid tolerances are rejected at construction."""
    from lithographysimulator_tpu.simulate import _channel_rotation_cached

    tight = OpticsConfig(pixel_number=32, na=0.6)
    loose = OpticsConfig(pixel_number=32, na=0.6, channel_tol=3e-3)
    rot_t = _channel_rotation_cached(tight, "unpolarized", True, None)
    rot_l = _channel_rotation_cached(loose, "unpolarized", True, None)
    assert rot_l is not None and rot_t is not None
    assert rot_l.shape[2] < rot_t.shape[2]
    with pytest.raises(ValueError):
        OpticsConfig(pixel_number=32, channel_tol=1.5)


def test_apply_rotation_identity_roundtrip():
    """A (C, C) identity rotation only absorbs sqrt(q) into the stack."""
    cfg, _, pup, _ = _setup()
    comps, q = _component_stack(pup, cfg)
    c = comps.shape[0]
    eye = np.stack([np.eye(c, dtype=np.float32),
                    np.zeros((c, c), np.float32)])
    y, w = apply_channel_rotation(comps, q, eye)
    np.testing.assert_allclose(np.asarray(w), 1.0)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(comps) * np.sqrt(q)[:, None, None],
        atol=1e-6)


def test_compress_components_noop_when_k_ge_c():
    cfg, _, pup, _ = _setup()
    comps, q = _component_stack(pup, cfg)
    y, w = compress_components(comps, q, comps.shape[0] + 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(comps), atol=0)
    np.testing.assert_allclose(np.asarray(w), q)
