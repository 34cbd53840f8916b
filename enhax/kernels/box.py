"""MXU banded-matmul box filter for TLC local statistics.

The border-truncated window sum along one axis is a contraction with a
banded 0/1 matrix: ``out[i] = sum_j band[i, j] * x[j]`` with
``band[i, j] = |i - j| <= r``. On TPU that beats every cumsum scheme at
NAFNet-TLC shapes: XLA's cumsum costs ~log2(n) full-tensor HBM passes,
Pallas carry-cumsum kernels (tried in r3) still paid ~15 ms in grid and
combine overhead, while the two banded matmuls run on the MXU
(~240 GFLOP at the 1280x736x32 stage-0 shape ≈ 1.4 ms at bf16 peak) and
XLA fuses the count divide into the epilogue. Accumulation is f32
(``preferred_element_type``), so bf16 activations get *exact* f32 window
sums — better than cascading cumsum differences.

Used by the fused NAFBlock kernels (enhax/kernels/nafblock.py) for TLC
(reference: local_arch.py:20-55 AvgPool2d local statistics); numerically
equal to ``ops.filtering.box_filter`` — asserted by
tests/test_kernels_nafblock.py.

``interpret`` is accepted for API compatibility with the Pallas kernels
(tests run both paths on CPU); this implementation is pure XLA, so the
flag is a no-op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _band(n: int, r: int):
    """(n, n) float32 0/1 matrix: band[i, j] = |i - j| <= r (numpy: this
    is lru_cached; a traced jnp constant would leak across traces)."""
    i = np.arange(n)
    return (np.abs(i[None, :] - i[:, None]) <= r).astype(np.float32)


def box_sum_fast(x, radius: int, interpret: bool = False):
    """Border-truncated (2r+1)^2 window SUM, f32, == box_filter_sum."""
    del interpret
    b, h, w, c = x.shape
    r = int(radius)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    bw = jnp.asarray(_band(w, r), x.dtype)
    y = jnp.einsum("bhwc,vw->bhvc", x, bw, precision=prec,
                   preferred_element_type=jnp.float32)
    # second contraction keeps the f32 partial sums (downcasting ~128-
    # magnitude bf16 sums would cost ~0.4% relative); on TPU an f32
    # matmul at DEFAULT precision runs as bf16x3 passes — plenty exact
    bh = jnp.asarray(_band(h, r), jnp.float32)
    return jnp.einsum("bhwc,uh->buwc", y, bh, precision=prec,
                      preferred_element_type=jnp.float32)


def box_mean_fast(x, radius: int, interpret: bool = False):
    """Border-truncated window MEAN == ops.filtering.box_filter, output in
    x.dtype (f32 accumulation internally)."""
    from enhax.ops.filtering import box_window_count
    b, h, w, c = x.shape
    n = box_window_count((h, w), int(radius))[None]
    return (box_sum_fast(x, radius) / n).astype(x.dtype)
