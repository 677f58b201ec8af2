"""Illumination source maps: exact golden parity + geometry properties."""

import numpy as np

from lithographysimulator_tpu import DEMO_CONFIG, LightSource


def test_quasar_matches_reference(golden):
    ref = golden("demo_source_quasar")
    ours = np.asarray(LightSource(DEMO_CONFIG, sigma_in=0.4, sigma_out=0.8)
                      .quasar(4, -np.pi / 8))
    np.testing.assert_array_equal(ours, ref)
    assert int(ours.sum()) == 184  # verified reference count (SURVEY §2 #9)


def test_annular_matches_reference(golden):
    ref = golden("demo_source_annular")
    ours = np.asarray(LightSource(DEMO_CONFIG, sigma_in=0.4, sigma_out=0.8).annular())
    np.testing.assert_array_equal(ours, ref)
    assert int(ours.sum()) == 380


def test_classical_matches_reference(golden):
    ref = golden("demo_source_classical")
    ours = np.asarray(LightSource(DEMO_CONFIG, sigma_out=0.6).classical())
    np.testing.assert_array_equal(ours, ref)


def test_shifted_annular_matches_reference(golden):
    ref = golden("demo_source_shifted")
    ours = np.asarray(LightSource(DEMO_CONFIG, sigma_in=0.2, sigma_out=0.7,
                                  shift_x=0.25, shift_y=-0.5).annular())
    np.testing.assert_array_equal(ours, ref)


def test_classical_is_degenerate_annulus():
    ls = LightSource(DEMO_CONFIG, sigma_in=0.0, sigma_out=0.5)
    np.testing.assert_array_equal(np.asarray(ls.classical()),
                                  np.asarray(ls.annular()))


def test_quasar_subset_of_annulus():
    ls = LightSource(DEMO_CONFIG, sigma_in=0.4, sigma_out=0.8)
    ann = np.asarray(ls.annular())
    qua = np.asarray(ls.quasar(4, -np.pi / 8))
    assert np.all(qua <= ann)


def test_source_within_sigma_bounds():
    ls = LightSource(DEMO_CONFIG, sigma_in=0.3, sigma_out=0.9)
    src = np.asarray(ls.annular())
    from lithographysimulator_tpu import Grid
    r = Grid(DEMO_CONFIG).radius()
    on = src > 0
    assert r[on].min() >= 0.3 and r[on].max() <= 0.9


def test_monopole_single_center_point():
    src = np.asarray(LightSource(DEMO_CONFIG).monopole())
    assert src.sum() == 1 and src[32, 32] == 1
