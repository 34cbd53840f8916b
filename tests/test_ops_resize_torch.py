"""Golden tests: torch-exact resize helpers vs F.interpolate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from enhax.ops import (resize_bicubic_torch, resize_nearest_torch,  # noqa: E402
                       resize_nearest_exact_torch)


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1))


@pytest.mark.parametrize("size,align", [((16, 24), False), ((16, 24), True),
                                        ((5, 7), False), ((30, 30), True)])
def test_bicubic_matches_torch(size, align):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 9, 11, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        _nchw(x), size, mode="bicubic", align_corners=align).numpy()
    got = np.moveaxis(np.asarray(resize_bicubic_torch(x, size, align)), -1, 1)
    assert np.max(np.abs(ref - got)) < 1e-5


def test_bicubic_scale_factor_form():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 37, 37, 4)).astype(np.float32)
    sf = (4.1 / 37, 4.1 / 37)
    ref = torch.nn.functional.interpolate(
        _nchw(x), scale_factor=sf, mode="bicubic",
        recompute_scale_factor=False).numpy()
    got = np.moveaxis(np.asarray(
        resize_bicubic_torch(x, (4, 4), scale_factor=sf)), -1, 1)
    assert ref.shape == got.shape
    assert np.max(np.abs(ref - got)) < 1e-5


@pytest.mark.parametrize("size", [(16, 24), (5, 7), (12, 12)])
def test_nearest_matches_torch(size):
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 9, 11, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(_nchw(x), size,
                                          mode="nearest").numpy()
    got = np.moveaxis(np.asarray(resize_nearest_torch(x, size)), -1, 1)
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("size", [(16, 24), (5, 7), (18, 22)])
def test_nearest_exact_matches_torch(size):
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 9, 11, 3)).astype(np.float32)
    ref = torch.nn.functional.interpolate(_nchw(x), size,
                                          mode="nearest-exact").numpy()
    got = np.moveaxis(np.asarray(resize_nearest_exact_torch(x, size)), -1, 1)
    assert np.array_equal(ref, got)
