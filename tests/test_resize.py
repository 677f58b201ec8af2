"""Matmul bilinear resize vs torch F.interpolate (the parity-critical op)."""

import numpy as np
import pytest

from lithographysimulator_tpu.ops.resize import bilinear_resize, output_size

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("n,scale", [
    (64, 1.0362694300518136),   # demo epsilon upsample (mask.py:77)
    (64, 1 / 1.0362694300518136),  # demo 1/eps downsample (imageformation.py:71)
    (32, 1.3), (48, 0.7), (16, 2.0), (64, 1.0),
])
def test_matches_torch_interpolate(n, scale):
    rng = np.random.default_rng(42)
    img = rng.random((n, n)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(img)[None, None], scale_factor=scale, mode="bilinear"
    ).squeeze().numpy()
    ours = np.asarray(bilinear_resize(img, scale))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_output_size_floor():
    assert output_size(64, 1.0362694300518136) == 66
    assert output_size(64, 1 / 1.0362694300518136) == 61


def test_batched_resize():
    rng = np.random.default_rng(0)
    imgs = rng.random((3, 32, 32)).astype(np.float32)
    out = np.asarray(bilinear_resize(imgs, 1.5))
    assert out.shape == (3, 48, 48)
    single = np.asarray(bilinear_resize(imgs[1], 1.5))
    np.testing.assert_allclose(out[1], single, rtol=1e-6)
