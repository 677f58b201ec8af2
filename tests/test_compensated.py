"""Compensated (double-float) matmul: accuracy vs an fp64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from lithographysimulator_tpu.ops.compensated import matmul_compensated, two_sum


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)  # vanishes in plain fp32 addition
    s, e = two_sum(a, b)
    assert float(s) == 1.0
    assert float(e) == np.float32(1e-8)


def test_two_sum_complex():
    a = jnp.complex64(1.0 + 1.0j)
    b = jnp.complex64(1e-8 - 1e-8j)
    s, e = two_sum(a, b)
    # b vanishes from the rounded sum but is preserved exactly in the error
    # term (TwoSum holds componentwise on re/im)
    assert complex(s) == complex(a)
    assert complex(e) == complex(np.complex64(1e-8 - 1e-8j))


def _gram_errors(k: int, m: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    a64 = (rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k)))
    a64 /= np.sqrt(k)
    ref = a64 @ a64.conj().T
    a32 = jnp.asarray(a64, jnp.complex64)
    plain = np.asarray(jnp.matmul(a32, a32.conj().T,
                                  precision=jax.lax.Precision.HIGHEST))
    comp = np.asarray(matmul_compensated(a32, a32.conj().T))
    den = np.abs(ref).max()
    return (np.abs(plain - ref).max() / den, np.abs(comp - ref).max() / den)


def test_compensated_at_representation_floor():
    """Compensated stays at the complex64 input floor regardless of K; the
    exact plain-fp32 error depends on the backend's accumulation blocking,
    so only the compensated result is pinned tightly."""
    for k in (128 * 128, 512 * 512):
        plain_err, comp_err = _gram_errors(k)
        assert comp_err < 2e-7
        assert comp_err <= plain_err * 1.05


def test_compensated_matches_plain_small_k():
    """K <= chunk short-circuits to a plain HIGHEST matmul."""
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(matmul_compensated(a, b)),
        np.asarray(jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)))


def test_non_divisible_k_padding():
    rng = np.random.default_rng(2)
    k = 1000  # not a multiple of the 512 chunk
    a64 = rng.standard_normal((8, k))
    b64 = rng.standard_normal((k, 8))
    ref = a64 @ b64
    out = np.asarray(matmul_compensated(jnp.asarray(a64, jnp.float32),
                                        jnp.asarray(b64, jnp.float32)))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-6


def test_rowdot_matches_matmul():
    """rowdot (transpose-free) equals matmul against the explicit .T, and
    hits the same accuracy floor."""
    from lithographysimulator_tpu.ops.compensated import rowdot_compensated

    rng = np.random.default_rng(4)
    k = 3000
    a64 = (rng.standard_normal((12, k)) + 1j * rng.standard_normal((12, k)))
    b64 = (rng.standard_normal((10, k)) + 1j * rng.standard_normal((10, k)))
    ref = a64 @ b64.conj().T
    a = jnp.asarray(a64, jnp.complex64)
    b = jnp.asarray(b64, jnp.complex64)
    out = np.asarray(rowdot_compensated(a, jnp.conj(b)))
    via_mm = np.asarray(matmul_compensated(a, jnp.conj(b).T))
    np.testing.assert_allclose(out, via_mm, rtol=0, atol=1e-5 * np.abs(ref).max())
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-7


def test_jit_and_shape_mismatch():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((4, 2048)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2048, 4)), jnp.float32)
    jitted = jax.jit(matmul_compensated)
    np.testing.assert_allclose(np.asarray(jitted(a, b)),
                               np.asarray(matmul_compensated(a, b)), rtol=0)
    import pytest

    with pytest.raises(ValueError):
        matmul_compensated(a, a)
