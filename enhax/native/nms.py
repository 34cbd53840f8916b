"""Greedy NMS: ctypes binding over native/nms.cpp with a numpy fallback."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libenhax_nms.so"
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
        lib.enhax_nms.restype = ctypes.c_int32
        lib.enhax_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def nms(dets: np.ndarray, iou_thresh: float = 0.5, score_thresh: float = 0.0,
        max_keep: int = 300) -> np.ndarray:
    """dets: (N, >=5) [x1,y1,x2,y2,score,...]. Returns kept row indices
    (descending score)."""
    d = np.ascontiguousarray(np.asarray(dets, np.float32)[:, :5])
    n = len(d)
    if n == 0:
        return np.zeros((0,), np.int32)
    lib = _load()
    if lib is not None:
        keep = np.zeros(n, np.int32)
        k = lib.enhax_nms(d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, float(iou_thresh), float(score_thresh),
                          int(max_keep), keep.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_int32)))
        return keep[:k]
    # numpy fallback
    order = np.argsort(-d[:, 4])
    kept: list[int] = []
    for i in order:
        if d[i, 4] < score_thresh or len(kept) >= max_keep:
            break
        ok = True
        for j in kept:
            xx1 = max(d[i, 0], d[j, 0]); yy1 = max(d[i, 1], d[j, 1])
            xx2 = min(d[i, 2], d[j, 2]); yy2 = min(d[i, 3], d[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            ai = max(0, d[i, 2] - d[i, 0]) * max(0, d[i, 3] - d[i, 1])
            aj = max(0, d[j, 2] - d[j, 0]) * max(0, d[j, 3] - d[j, 1])
            if ai + aj - inter > 0 and inter / (ai + aj - inter) >= iou_thresh:
                ok = False
                break
        if ok:
            kept.append(int(i))
    return np.asarray(kept, np.int32)
