"""Connected-components labeling: ctypes binding + numpy fallback.

Mirrors the reference SAM2 post-processing contract
(sam2/utils/misc.py:47-63 ``remove_small_regions``): given a binary mask,
remove islands or fill holes whose area is below a threshold.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libenhax_ccl.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.enhax_ccl_label.restype = ctypes.c_int32
        lib.enhax_ccl_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.enhax_remove_small_regions.restype = ctypes.c_int32
        lib.enhax_remove_small_regions.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def connected_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Label 8-connected components (cv2.connectedComponentsWithStats
    connectivity=8, as the reference's remove_small_regions uses —
    amg.py:281). mask: (H, W) bool/uint8.
    Returns (labels int32 (H, W), n_components)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    lib = _load()
    if lib is not None:
        labels = np.zeros((h, w), np.int32)
        n = lib.enhax_ccl_label(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return labels, int(n)
    return _ccl_numpy(m)


def remove_small_regions(mask: np.ndarray, area_thresh: int,
                         mode: str = "islands") -> tuple[np.ndarray, int]:
    """Remove small foreground islands or fill small background holes.

    mode: "islands" (drop foreground blobs < thresh) | "holes" (fill
    background blobs < thresh). Returns (mask, n_removed) — same contract
    as SAM2's remove_small_regions.
    """
    if mode not in ("islands", "holes"):
        raise ValueError(f"mode must be 'islands' or 'holes', got {mode!r}")
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    lib = _load()
    if lib is not None:
        n = lib.enhax_remove_small_regions(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            int(area_thresh), 0 if mode == "islands" else 1)
        return m.astype(bool), int(n)
    # numpy fallback
    work = m if mode == "islands" else (1 - m)
    labels, n_comp = _ccl_numpy(work)
    areas = np.bincount(labels.ravel(), minlength=n_comp + 1)
    small = [c for c in range(1, n_comp + 1) if areas[c] < area_thresh]
    if mode == "islands" and n_comp and len(small) == n_comp:
        # all below threshold: keep the largest (reference amg.py:289-291)
        small.remove(int(np.argmax(areas[1:])) + 1)
    removed = 0
    for c in small:
        m[labels == c] = 0 if mode == "islands" else 1
        removed += 1
    return m.astype(bool), removed


def _ccl_numpy(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Two-pass union-find in numpy/python (fallback)."""
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    next_label = 0
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            neigh = []
            if x > 0 and mask[y, x - 1]:
                neigh.append(labels[y, x - 1])
            if y > 0:
                if mask[y - 1, x]:
                    neigh.append(labels[y - 1, x])
                if x > 0 and mask[y - 1, x - 1]:
                    neigh.append(labels[y - 1, x - 1])
                if x + 1 < w and mask[y - 1, x + 1]:
                    neigh.append(labels[y - 1, x + 1])
            if neigh:
                labels[y, x] = min(neigh)
                for a in neigh[1:]:
                    union(neigh[0], a)
            else:
                next_label += 1
                parent[next_label] = next_label
                labels[y, x] = next_label

    remap = {}
    n = 0
    out = np.zeros_like(labels)
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if not l:
                continue
            r = find(l)
            if r not in remap:
                n += 1
                remap[r] = n
            out[y, x] = remap[r]
    return out, n
