"""Differentiable classical filters: box, guided, Gaussian, Sobel.

Rebuild of reference ``src/mon/vision/filtering/`` — ``BoxFilter``
(box_filter.py, diff-of-cumsum), ``GuidedFilter``/``FastGuidedFilter``
(guided_filter.py:35-488, used inside GCENet at gcenet.py:486) and
``SobelFilter`` (sobel_filter.py).

The cumsum (integral-image) box filter is the TPU-idiomatic form: two
cumulative sums + shifts vectorize on the VPU with no windowed gathers, so a
guided filter at 4K costs a handful of memory-bound elementwise passes.
All ops take (..., H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from enhax.ops.resize import resize


def box_filter_sum(x, radius: int):
    """Sum over a (2r+1)^2 window, truncated at borders (box_filter.py diff-of-cumsum)."""
    r = int(radius)

    def _edge(c, axis, k):
        last = jax.lax.slice_in_dim(c, c.shape[axis] - 1, c.shape[axis],
                                    axis=axis)
        reps = [1] * c.ndim
        reps[axis] = k
        return jnp.tile(last, reps)

    def _1d(v, axis):
        # out[i] = c[min(i+r, n-1)] - (c[i-r-1] if i-r-1 >= 0 else 0)
        # Shifted slices + concat instead of jnp.take: clipped-iota gathers
        # don't fuse on TPU, slice/concat do (one pass, no gather).
        n = v.shape[axis]
        c = jnp.cumsum(v, axis=axis)
        if r >= n:
            hi = _edge(c, axis, n)
        else:
            hi = jnp.concatenate(
                [jax.lax.slice_in_dim(c, r, n, axis=axis),
                 _edge(c, axis, r)], axis=axis)
        if r + 1 >= n:
            return hi
        pad_shape = list(c.shape)
        pad_shape[axis] = r + 1
        lo = jnp.concatenate(
            [jnp.zeros(pad_shape, c.dtype),
             jax.lax.slice_in_dim(c, 0, n - r - 1, axis=axis)], axis=axis)
        return hi - lo

    return _1d(_1d(x, axis=-3), axis=-2)


def box_window_count(shape_hw: tuple[int, int], radius: int, dtype=jnp.float32):
    """Per-pixel truncated-window pixel count (the guided filter's N)."""
    h, w = shape_hw
    ones = jnp.ones((h, w, 1), dtype)
    return box_filter_sum(ones, radius)


def box_filter(x, radius: int):
    """Window *mean* with border-truncated windows."""
    n = box_window_count((x.shape[-3], x.shape[-2]), radius, x.dtype)
    return box_filter_sum(x, radius) / n


def guided_filter(image, guide, radius: int = 1, eps: float = 1e-8):
    """Edge-preserving guided filter (guided_filter.py:35 ``guided_filter`` fn).

    ``image`` is filtered using ``guide``'s structure; per-channel independent
    (the reference uses the same diff-of-cumsum box filter).
    """
    x, y = guide, image
    n = box_window_count((x.shape[-3], x.shape[-2]), radius, x.dtype)
    mean_x = box_filter_sum(x, radius) / n
    mean_y = box_filter_sum(y, radius) / n
    cov_xy = box_filter_sum(x * y, radius) / n - mean_x * mean_y
    var_x = box_filter_sum(x * x, radius) / n - mean_x * mean_x
    a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x
    mean_a = box_filter_sum(a, radius) / n
    mean_b = box_filter_sum(b, radius) / n
    return mean_a * x + mean_b


def fast_guided_filter(image_lr, guide_lr, guide_hr, radius: int = 1, eps: float = 1e-8):
    """FastGuidedFilter (guided_filter.py:150): fit (a, b) at low res, apply at high res."""
    x, y = guide_lr, image_lr
    n = box_window_count((x.shape[-3], x.shape[-2]), radius, x.dtype)
    mean_x = box_filter_sum(x, radius) / n
    mean_y = box_filter_sum(y, radius) / n
    cov_xy = box_filter_sum(x * y, radius) / n - mean_x * mean_y
    var_x = box_filter_sum(x * x, radius) / n - mean_x * mean_x
    a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x
    hr_size = (guide_hr.shape[-3], guide_hr.shape[-2])
    mean_a = resize(a, hr_size, method="bilinear")
    mean_b = resize(b, hr_size, method="bilinear")
    return mean_a * guide_hr + mean_b


def fast_guided_filter_bicubic(x_lr, y_lr, x_hr, radius: int = 1,
                               eps: float = 1e-8):
    """FastGuidedFilter (guided_filter.py:150-203): cumsum box filter,
    A/b upsampled with torch-exact BICUBIC align_corners=True (used by
    CoLIE and Zero-MIE filter_up)."""
    from enhax.ops.resize import resize_bicubic_torch
    n = box_window_count((x_lr.shape[-3], x_lr.shape[-2]), radius,
                         x_lr.dtype)
    mean_x = box_filter_sum(x_lr, radius) / n
    mean_y = box_filter_sum(y_lr, radius) / n
    cov_xy = box_filter_sum(x_lr * y_lr, radius) / n - mean_x * mean_y
    var_x = box_filter_sum(x_lr * x_lr, radius) / n - mean_x * mean_x
    a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x
    hr = (x_hr.shape[-3], x_hr.shape[-2])
    mean_a = resize_bicubic_torch(a, hr, align_corners=True)
    mean_b = resize_bicubic_torch(b, hr, align_corners=True)
    return mean_a * x_hr + mean_b


def gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    """Separable 1D Gaussian kernel (host-side constant)."""
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter(x, kernel_size: int = 5, sigma: float = 1.0):
    """Separable Gaussian blur with reflect padding."""
    k = jnp.asarray(gaussian_kernel(kernel_size, sigma))
    p = kernel_size // 2

    def _conv_axis(v, axis):
        vp = jnp.pad(
            v,
            [(0, 0)] * (v.ndim + axis) + [(p, p)] + [(0, 0)] * (-axis - 1),
            mode="reflect",
        )
        out = 0.0
        for i in range(kernel_size):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + v.shape[axis])
            out = out + k[i] * vp[tuple(sl)]
        return out

    return _conv_axis(_conv_axis(x, -3), -2)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T


def sobel_filter(x, normalized: bool = True, eps: float = 1e-6):
    """Sobel gradient magnitude (sobel_filter.py). Returns same-shaped array."""
    kx = jnp.asarray(_SOBEL_X / (8.0 if normalized else 1.0))
    ky = jnp.asarray(_SOBEL_Y / (8.0 if normalized else 1.0))
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)], mode="reflect")

    gx = jnp.zeros_like(x)
    gy = jnp.zeros_like(x)
    h, w = x.shape[-3], x.shape[-2]
    for i in range(3):
        for j in range(3):
            patch = xp[..., i : i + h, j : j + w, :]
            gx = gx + kx[i, j] * patch
            gy = gy + ky[i, j] * patch
    return jnp.sqrt(gx * gx + gy * gy + eps)


def conv_guided_filter_module(radius: int = 1, features: int = 32):
    """Learned guided filter (reference guided_filter.py:300 ConvGuidedFilter):
    the box-filter statistics are kept, but the (a, b) solve is replaced by a
    small conv net over [cov, var]. Returns a flax module."""
    from flax import linen as nn
    import jax.numpy as jnp

    class ConvGuidedFilter(nn.Module):
        @nn.compact
        def __call__(self, x_lr, y_lr, x_hr):
            from enhax.ops.resize import resize as _resize
            n = box_window_count((x_lr.shape[-3], x_lr.shape[-2]), radius, x_lr.dtype)
            mean_x = box_filter_sum(x_lr, radius) / n
            mean_y = box_filter_sum(y_lr, radius) / n
            cov = box_filter_sum(x_lr * y_lr, radius) / n - mean_x * mean_y
            var = box_filter_sum(x_lr * x_lr, radius) / n - mean_x * mean_x
            z = jnp.concatenate([cov, var], axis=-1)
            z = nn.relu(nn.Conv(features, (1, 1), name="a1")(z))
            z = nn.relu(nn.Conv(features, (1, 1), name="a2")(z))
            a = nn.Conv(x_lr.shape[-1], (1, 1), name="a3")(z)
            b = mean_y - a * mean_x
            hr = (x_hr.shape[-3], x_hr.shape[-2])
            return _resize(a, hr) * x_hr + _resize(b, hr)

    return ConvGuidedFilter()


def deep_guided_filter_module(radius: int = 1, features: int = 24):
    """DeepGuidedFilter (guided_filter.py:400): a small conv net produces the
    guidance map before the (learned) guided filter — end-to-end trainable
    joint upsampling. Returns a flax module mapping (lr_in, lr_out, hr_in)."""
    from flax import linen as nn

    class DeepGuidedFilter(nn.Module):
        @nn.compact
        def __call__(self, x_lr, y_lr, x_hr):
            def guide(v, name):
                g = nn.relu(nn.Conv(features, (3, 3), name=f"{name}_c1")(v))
                return nn.Conv(v.shape[-1], (1, 1), name=f"{name}_c2")(g)
            gf = conv_guided_filter_module(radius, features)
            return gf(guide(x_lr, "glr"), y_lr, guide(x_hr, "ghr"))

    return DeepGuidedFilter()


def bilateral_blur(x, kernel_size: tuple[int, int] = (3, 3),
                   sigma_color: float = 0.5,
                   sigma_space: tuple[float, float] = (1.5, 1.5)):
    """Bilateral blur with kornia semantics (kornia.filters.bilateral_blur,
    reflect padding, L1 color distance) — used by ZeroMIE_MS's optional
    ``use_denoise`` path (reference zero_mie_ms.py:304-305, default off).

    NHWC. joint weight = gaussian(space) * exp(-0.5/sigma_c^2 * d(p,q)^2)
    with d = per-pixel L1 distance summed over channels, normalized by the
    total weight. Static kernel size -> fully XLA-unrollable.
    """
    kh, kw = int(kernel_size[0]), int(kernel_size[1])
    ph, pw = kh // 2, kw // 2
    sy, sx = float(sigma_space[0]), float(sigma_space[1])
    gy = np.exp(-0.5 * ((np.arange(kh) - ph) / sy) ** 2)
    gx = np.exp(-0.5 * ((np.arange(kw) - pw) / sx) ** 2)
    space = np.outer(gy, gx)
    space = jnp.asarray(space / space.sum(), dtype=x.dtype)

    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    h, w = x.shape[1], x.shape[2]
    num = jnp.zeros_like(x)
    den = jnp.zeros(x.shape[:3] + (1,), dtype=x.dtype)
    for dy in range(kh):
        for dx in range(kw):
            nb = xp[:, dy:dy + h, dx:dx + w, :]
            dist = jnp.sum(jnp.abs(nb - x), axis=-1, keepdims=True)
            wgt = space[dy, dx] * jnp.exp(-0.5 * (dist / sigma_color) ** 2)
            num = num + wgt * nb
            den = den + wgt
    return num / den
