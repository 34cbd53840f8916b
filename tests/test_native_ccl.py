"""C++ connected-components labeling tests (native + fallback parity)."""

import numpy as np
import pytest

from enhax.native import ccl


@pytest.fixture
def mask():
    m = np.zeros((12, 12), np.uint8)
    m[1:4, 1:4] = 1      # 9-px island
    m[6:11, 6:11] = 1    # 25-px island
    m[8, 8] = 0          # 1-px hole inside it
    m[0, 11] = 1         # single pixel
    return m


def test_native_builds():
    assert ccl.native_available(), "C++ CCL failed to build/load"


def test_label_counts(mask):
    labels, n = ccl.connected_components(mask)
    assert n == 3
    assert labels.shape == mask.shape
    assert labels[mask == 0].max() == 0
    # all three components have distinct labels
    assert {labels[2, 2], labels[7, 7], labels[0, 11]} == {1, 2, 3}


def test_native_matches_numpy(mask, rng):
    rnd = (rng.uniform(size=(32, 33)) > 0.6).astype(np.uint8)
    la, na = ccl.connected_components(rnd)
    lb, nb = ccl._ccl_numpy(rnd)
    assert na == nb
    # same partition (labels may renumber identically due to row-major order)
    np.testing.assert_array_equal(la, lb)


def test_remove_small_islands(mask):
    out, removed = ccl.remove_small_regions(mask.copy(), area_thresh=5,
                                            mode="islands")
    assert removed == 1           # only the single pixel is < 5
    assert not out[0, 11]
    assert out[2, 2] and out[7, 7]


def test_fill_small_holes(mask):
    out, removed = ccl.remove_small_regions(mask.copy(), area_thresh=4,
                                            mode="holes")
    assert removed == 1           # the 1-px hole gets filled
    assert out[8, 8]


def test_bad_mode(mask):
    with pytest.raises(ValueError, match="islands"):
        ccl.remove_small_regions(mask, 5, mode="nope")


def test_large_mask_native_fast(rng):
    big = (rng.uniform(size=(512, 512)) > 0.5).astype(np.uint8)
    import time
    t0 = time.perf_counter()
    labels, n = ccl.connected_components(big)
    dt = time.perf_counter() - t0
    assert n > 0
    assert dt < 1.0  # native path must be fast (numpy fallback would be ~10s)


def test_native_nms():
    from enhax.native import nms
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # overlaps box 0 heavily -> suppressed
        [50, 50, 60, 60, 0.7],
        [0, 0, 10, 10, 0.1],   # below score thresh
    ], np.float32)
    keep = nms(dets, iou_thresh=0.5, score_thresh=0.2)
    assert list(keep) == [0, 2]


def test_nms_native_matches_fallback(rng):
    import importlib
    mod = importlib.import_module("enhax.native.nms")
    dets = rng.uniform(0, 100, (50, 5)).astype(np.float32)
    dets[:, 2:4] = dets[:, :2] + rng.uniform(5, 30, (50, 2))
    a = mod.nms(dets, 0.4)
    saved_lib, saved_failed = mod._lib, mod._build_failed
    mod._lib, mod._build_failed = None, True  # force numpy fallback
    try:
        b = mod.nms(dets, 0.4)
    finally:
        mod._lib, mod._build_failed = saved_lib, saved_failed
    np.testing.assert_array_equal(a, b)


def test_islands_keep_largest_when_all_small():
    """All regions below threshold: keep the largest instead of erasing
    the whole mask (reference amg.py:289-291; r3 review)."""
    from enhax.native.ccl import remove_small_regions
    m = np.zeros((16, 16), bool)
    m[1:4, 1:4] = True     # area 9
    m[10:12, 10:12] = True  # area 4
    out, removed = remove_small_regions(m, area_thresh=50, mode="islands")
    assert out.sum() == 9 and removed == 1  # largest kept


def test_eight_connectivity_diagonal_region():
    """A diagonally-connected chain is ONE component (cv2 connectivity=8),
    so it survives a threshold its 4-connected fragments would not."""
    from enhax.native.ccl import connected_components, remove_small_regions
    m = np.zeros((8, 8), bool)
    for i in range(6):
        m[i, i] = True  # 6-px diagonal chain
    labels, n = connected_components(m)
    assert n == 1
    out, removed = remove_small_regions(m, area_thresh=4, mode="islands")
    assert removed == 0 and out.sum() == 6


def test_numpy_fallback_matches_native():
    """The pure-python fallback agrees with the C++ path on random masks."""
    from enhax.native import ccl
    rng = np.random.default_rng(3)
    m = rng.random((24, 24)) > 0.6
    lib_labels, lib_n = ccl.connected_components(m)
    np_labels, np_n = ccl._ccl_numpy(m.astype(np.uint8))
    assert lib_n == np_n
    # same partition (label ids may differ): compare co-label structure
    for c in range(1, lib_n + 1):
        sel = lib_labels == c
        ids = np.unique(np_labels[sel])
        assert len(ids) == 1 and ids[0] != 0
