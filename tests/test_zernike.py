"""Zernike basis: golden parity vs the reference + analytic properties."""

import numpy as np
import pytest

from lithographysimulator_tpu import DEMO_CONFIG, Grid, osa_index_to_mn, zernike_basis
from lithographysimulator_tpu.ops.zernike import (
    mn_to_osa_index,
    radial_polynomial,
    wavefront_error,
    zernike_term,
)


def test_osa_indexing_roundtrip():
    expected = [(0, 0), (-1, 1), (1, 1), (-2, 2), (0, 2), (2, 2), (-3, 3),
                (-1, 3), (1, 3), (3, 3)]
    for j, (m, n) in enumerate(expected):
        assert osa_index_to_mn(j) == (m, n)
        assert mn_to_osa_index(m, n) == j


@pytest.mark.parametrize("j", range(15))
def test_zernike_terms_match_reference(golden, rms, j):
    # Reference computes in fp16 (pupil.py:53-74); tolerance covers that.
    ref = golden(f"zernike_term_{j}")
    m, n = osa_index_to_mn(j)
    ours = zernike_term(m, n, Grid(DEMO_CONFIG))
    assert rms(ours, ref) < 2e-3


def test_radial_polynomial_closed_forms():
    r = np.linspace(0, 1, 101)
    np.testing.assert_allclose(radial_polynomial(0, 0, r), np.ones_like(r))
    np.testing.assert_allclose(radial_polynomial(1, 1, r), r)
    np.testing.assert_allclose(radial_polynomial(0, 2, r), 2 * r**2 - 1, atol=1e-12)
    np.testing.assert_allclose(radial_polynomial(0, 4, r), 6 * r**4 - 6 * r**2 + 1,
                               atol=1e-12)


def test_zernike_orthogonality_on_disk():
    """Discrete orthogonality of the first 10 terms over the unit disk.

    With the reference's N_mn = sqrt((2n+1)/(1+delta_m0)) convention (Lin eq.
    4.37; pupil.py:69), (1/pi) ∫ Z_i Z_j over the disk = delta_ij *
    (2n+1)/(2n+2) — orthogonal, but not unit-norm."""
    cfg = DEMO_CONFIG.__class__(pixel_number=256)
    basis = zernike_basis(cfg, 10)
    area_element = cfg.delta_sigma**2
    gram = np.einsum("ixy,jxy->ij", basis, basis) * area_element / np.pi
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 0.02
    expected_diag = [(2 * n + 1) / (2 * n + 2)
                     for n in (osa_index_to_mn(j)[1] for j in range(10))]
    np.testing.assert_allclose(np.diag(gram), expected_diag, atol=0.05)


def test_wavefront_error_golden(golden, rms):
    ref = golden("pupildemo_wavefront_error")  # complex64, imag = 0
    cfg = DEMO_CONFIG.__class__(na=0.6)
    ab = np.array([0, 0, 0, 1, 3, 0, 0, 1, 0, 0], np.float32)
    ours = np.asarray(wavefront_error(ab, cfg))
    assert np.abs(ref.imag).max() == 0
    assert rms(ours, ref.real) < 2e-3


def test_defocus_not_mutated():
    ab = np.array([0, 0, 0, 0, 100.0], np.float32)
    ab_copy = ab.copy()
    wavefront_error(ab, DEMO_CONFIG)
    np.testing.assert_array_equal(ab, ab_copy)  # reference mutates (pupil.py:92)


def test_exactly_four_coefficients_ok():
    # The reference IndexErrors on exactly-4-element input (pupil.py:91).
    ab = np.array([0.0, 0.1, 0.2, 0.3], np.float32)
    out = wavefront_error(ab, DEMO_CONFIG)
    assert out.shape == (64, 64)


def test_noll_indexing_table():
    from lithographysimulator_tpu.ops.zernike import noll_index_to_mn

    table = {1: (0, 0), 2: (1, 1), 3: (-1, 1), 4: (0, 2), 5: (-2, 2),
             6: (2, 2), 7: (-1, 3), 8: (1, 3), 9: (-3, 3), 10: (3, 3),
             11: (0, 4), 12: (2, 4), 13: (-2, 4), 14: (4, 4), 15: (-4, 4)}
    for j, mn in table.items():
        assert noll_index_to_mn(j) == mn


def test_fringe_indexing_table():
    from lithographysimulator_tpu.ops.zernike import fringe_index_to_mn

    # standard Fringe/UA ordering incl. the 'order' regrouping at j=10
    table = {1: (0, 0), 2: (1, 1), 3: (-1, 1), 4: (0, 2), 5: (2, 2),
             6: (-2, 2), 7: (1, 3), 8: (-1, 3), 9: (0, 4), 10: (3, 3),
             11: (-3, 3), 12: (2, 4), 13: (-2, 4), 14: (1, 5), 15: (-1, 5),
             16: (0, 6)}
    for j, mn in table.items():
        assert fringe_index_to_mn(j) == mn


def test_to_osa_coefficients_same_wavefront():
    """A Noll-ordered coefficient vector re-ordered to OSA produces the same
    wavefront as assembling the named terms directly."""
    from lithographysimulator_tpu.ops.zernike import (mn_to_osa_index,
                                                      noll_index_to_mn,
                                                      to_osa_coefficients)

    noll_coeffs = np.array([0.0, 0.3, 0.0, 0.0, 0.5, 0.0, 0.0, 0.2])
    osa = to_osa_coefficients(noll_coeffs, "noll")
    direct = np.zeros_like(osa)
    for j, c in enumerate(noll_coeffs, start=1):
        m, n = noll_index_to_mn(j)
        direct[mn_to_osa_index(m, n)] += c
    np.testing.assert_array_equal(osa, direct)
    # OSA slot 4 is defocus-in-nm by pipeline convention; these test values
    # keep it zero so wavefront comparison is scheme-independent
    w = np.asarray(wavefront_error(osa.astype(np.float32), DEMO_CONFIG))
    assert np.isfinite(w).all() and np.abs(w).max() > 0


def test_bad_indexing_rejected():
    import pytest

    from lithographysimulator_tpu.ops.zernike import (fringe_index_to_mn,
                                                      noll_index_to_mn,
                                                      to_osa_coefficients)

    with pytest.raises(ValueError):
        to_osa_coefficients([1.0], "zemax")
    with pytest.raises(ValueError):
        noll_index_to_mn(0)
    with pytest.raises(ValueError):
        fringe_index_to_mn(0)
