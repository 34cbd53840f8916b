"""Colorspace conversions in pure JAX (channels-last, float in [0,1]).

Rebuild of reference ``core/image/color.py:60-965`` (which dispatches to
kornia/cv2). Conventions follow kornia so converted checkpoints see the same
numerics: HSV hue in [0, 2pi], Lab with D65 white point, YCbCr full-range.
HVI follows HVI-CIDNet (color.py:313 RGBToHVI) with a configurable density_k.

All functions take/return ``(..., H, W, 3)`` (or ``(..., 1)`` for gray) and
are differentiable; branchy per-pixel logic is expressed with jnp.where so
XLA fuses everything into elementwise kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.141592653589793


def _split(image):
    return image[..., 0], image[..., 1], image[..., 2]


def bgr_to_rgb(image):
    return image[..., ::-1]


def rgb_to_bgr(image):
    return image[..., ::-1]


def rgb_to_grayscale(image, weights=(0.299, 0.587, 0.114)):
    """ITU-R 601 luma (kornia default). Returns (..., H, W, 1)."""
    r, g, b = _split(image)
    w = weights
    return (w[0] * r + w[1] * g + w[2] * b)[..., None]


def grayscale_to_rgb(image):
    return jnp.repeat(image, 3, axis=-1)


# ---------------------------------------------------------------------------
# HSV (kornia convention: H in [0, 2pi], S/V in [0,1])
# ---------------------------------------------------------------------------

def rgb_to_hsv(image, eps: float = 1e-8):
    r, g, b = _split(image)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = deltac / (v + eps)
    dd = deltac + (deltac == 0)  # avoid 0/0; hue is 0 where delta==0 anyway
    rc = (maxc - r) / dd
    gc = (maxc - g) / dd
    bc = (maxc - b) / dd
    h = jnp.where(maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    h = 2.0 * _PI * h
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(image):
    h, s, v = _split(image)
    h = h / (2.0 * _PI)
    hi = jnp.floor(h * 6.0) % 6
    f = h * 6.0 - jnp.floor(h * 6.0)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    r = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4, hi == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# HVI (HVI-CIDNet; reference core/image/color.py:313-447)
# ---------------------------------------------------------------------------

def rgb_to_hvi(image, density_k: float = 0.2, eps: float = 1e-8):
    """RGB -> HVI (horizontal/vertical/intensity) colorspace.

    Matches reference ``RGBToHVI.rgb_to_hvi`` (color.py:333-365): hue/sat/val
    computed HSV-style, then polar (cos, sin) of hue scaled by a
    value-dependent "color sensitivity" sin(v*pi/2)^k.
    Returns channels (X=H, Y=V, Z=I) stacked last.
    """
    r, g, b = _split(image)
    value = jnp.maximum(jnp.maximum(r, g), b)
    img_min = jnp.minimum(jnp.minimum(r, g), b)
    dd = value - img_min + eps
    # priority of branches mirrors the reference's sequential masked writes:
    # b==max written first, then g==max, then r==max (later wins) — so test
    # r first, then g, then b in a select chain.
    hue = jnp.where(r == value, ((g - b) / dd) % 6,
          jnp.where(g == value, 2.0 + (b - r) / dd,
                                4.0 + (r - g) / dd))
    hue = jnp.where(img_min == value, 0.0, hue)
    hue = hue / 6.0
    saturation = jnp.where(value == 0, 0.0, (value - img_min) / (value + eps))
    color_sensitive = jnp.power(jnp.sin(value * 0.5 * _PI) + eps, density_k)
    cx = jnp.cos(2.0 * _PI * hue)
    cy = jnp.sin(2.0 * _PI * hue)
    x = color_sensitive * saturation * cx
    y = color_sensitive * saturation * cy
    return jnp.stack([x, y, value], axis=-1)


def hvi_to_rgb(image, density_k: float = 0.2, eps: float = 1e-8):
    """HVI -> RGB. Matches reference ``RGBToHVI.hvi_to_rgb`` (color.py:367-447)."""
    h, v, i = _split(image)
    h = jnp.clip(h, -1, 1)
    v = jnp.clip(v, -1, 1)
    i = jnp.clip(i, 0, 1)
    val = i
    color_sensitive = jnp.power(jnp.sin(val * 0.5 * _PI) + eps, density_k)
    h = jnp.clip(h / (color_sensitive + eps), -1, 1)
    v = jnp.clip(v / (color_sensitive + eps), -1, 1)
    hue = (jnp.arctan2(v, h) / (2 * _PI)) % 1.0
    sat = jnp.clip(jnp.sqrt(h * h + v * v), 0, 1)
    val = jnp.clip(val, 0, 1)
    hsv = jnp.stack([hue * 2.0 * _PI, sat, val], axis=-1)
    return hsv_to_rgb(hsv)


# ---------------------------------------------------------------------------
# YCbCr / YUV (kornia full-range conventions)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(image):
    r, g, b = _split(image)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(image):
    y, cb, cr = _split(image)
    cb = cb - 0.5
    cr = cr - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_yuv(image):
    r, g, b = _split(image)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.147 * r - 0.289 * g + 0.436 * b
    v = 0.615 * r - 0.515 * g - 0.100 * b
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(image):
    y, u, v = _split(image)
    r = y + 1.14 * v
    g = y - 0.396 * u - 0.581 * v
    b = y + 2.029 * u
    return jnp.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# sRGB <-> linear
# ---------------------------------------------------------------------------

def rgb_to_linear(image):
    """sRGB EOTF (gamma expand)."""
    return jnp.where(image > 0.04045,
                     jnp.power((image + 0.055) / 1.055, 2.4),
                     image / 12.92)


def linear_to_rgb(image):
    """sRGB OETF (gamma compress)."""
    im = jnp.maximum(image, 1e-12)
    return jnp.where(image > 0.0031308,
                     1.055 * jnp.power(im, 1 / 2.4) - 0.055,
                     image * 12.92)


# ---------------------------------------------------------------------------
# XYZ / Lab / Luv (D65)
# ---------------------------------------------------------------------------

_D65 = (0.95047, 1.0, 1.08883)


def rgb_to_xyz(image):
    """kornia convention: applied to (possibly non-linearized) rgb directly."""
    r, g, b = _split(image)
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    return jnp.stack([x, y, z], axis=-1)


def xyz_to_rgb(image):
    x, y, z = _split(image)
    r = 3.2404813432005266 * x - 1.5371515162713185 * y - 0.4985363261688878 * z
    g = -0.9692549499965682 * x + 1.8759900014898907 * y + 0.0415559265582928 * z
    b = 0.0556466391351772 * x - 0.2040413383665112 * y + 1.0573110696453443 * z
    return jnp.stack([r, g, b], axis=-1)


def _lab_f(t):
    delta = 6.0 / 29.0
    return jnp.where(t > delta**3, jnp.cbrt(t), t / (3 * delta**2) + 4.0 / 29.0)


def _lab_f_inv(t):
    delta = 6.0 / 29.0
    return jnp.where(t > delta, t**3, 3 * delta**2 * (t - 4.0 / 29.0))


def rgb_to_lab(image):
    """CIE Lab, D65, from sRGB (linearized first, kornia convention).
    L in [0,100], a/b roughly [-128,127]."""
    xyz = rgb_to_xyz(rgb_to_linear(image))
    x, y, z = _split(xyz)
    fx = _lab_f(x / _D65[0])
    fy = _lab_f(y / _D65[1])
    fz = _lab_f(z / _D65[2])
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def lab_to_rgb(image, clip: bool = True):
    l, a, b = _split(image)
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    x = _lab_f_inv(fx) * _D65[0]
    y = _lab_f_inv(fy) * _D65[1]
    z = _lab_f_inv(fz) * _D65[2]
    rgb = linear_to_rgb(xyz_to_rgb(jnp.stack([x, y, z], axis=-1)))
    return jnp.clip(rgb, 0, 1) if clip else rgb


def rgb_to_luv(image, eps: float = 1e-12):
    """CIE Luv, D65, from sRGB (linearized first)."""
    xyz = rgb_to_xyz(rgb_to_linear(image))
    x, y, z = _split(xyz)
    l = jnp.where(y > (6.0 / 29.0) ** 3, 116.0 * jnp.cbrt(y) - 16.0,
                  (29.0 / 3.0) ** 3 * y)
    d = x + 15.0 * y + 3.0 * z + eps
    u_p = 4.0 * x / d
    v_p = 9.0 * y / d
    xn, yn, zn = _D65
    dn = xn + 15.0 * yn + 3.0 * zn
    un = 4.0 * xn / dn
    vn = 9.0 * yn / dn
    u = 13.0 * l * (u_p - un)
    v = 13.0 * l * (v_p - vn)
    return jnp.stack([l, u, v], axis=-1)


def luv_to_rgb(image, eps: float = 1e-12):
    l, u, v = _split(image)
    xn, yn, zn = _D65
    dn = xn + 15.0 * yn + 3.0 * zn
    un = 4.0 * xn / dn
    vn = 9.0 * yn / dn
    y = jnp.where(l > 8.0, yn * ((l + 16.0) / 116.0) ** 3,
                  yn * l * (3.0 / 29.0) ** 3)
    ld = 13.0 * l + eps
    u_p = u / ld + un
    v_p = v / ld + vn
    x = y * 9.0 * u_p / (4.0 * v_p + eps)
    z = y * (12.0 - 3.0 * u_p - 20.0 * v_p) / (4.0 * v_p + eps)
    return linear_to_rgb(xyz_to_rgb(jnp.stack([x, y, z], axis=-1)))


# ---------------------------------------------------------------------------
# HLS
# ---------------------------------------------------------------------------

def rgb_to_hls(image, eps: float = 1e-8):
    """kornia convention: H in [0, 2pi], L/S in [0,1]."""
    r, g, b = _split(image)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    deltac = maxc - minc
    s = jnp.where(deltac == 0, 0.0,
                  deltac / (1.0 - jnp.abs(2.0 * l - 1.0) + eps))
    dd = deltac + (deltac == 0)
    h = jnp.where(maxc == r, ((g - b) / dd) % 6,
        jnp.where(maxc == g, (b - r) / dd + 2.0, (r - g) / dd + 4.0))
    h = jnp.where(deltac == 0, 0.0, h)
    h = h * (_PI / 3.0)
    return jnp.stack([h, l, s], axis=-1)


def hls_to_rgb(image):
    h, l, s = _split(image)
    h = h / (2.0 * _PI)  # -> [0,1]

    def f(n):
        k = (n + h * 12.0) % 12.0
        a = s * jnp.minimum(l, 1.0 - l)
        return l - a * jnp.maximum(-1.0, jnp.minimum(jnp.minimum(k - 3.0, 9.0 - k), 1.0))

    return jnp.stack([f(0.0), f(8.0), f(4.0)], axis=-1)


# ---------------------------------------------------------------------------
# Sepia
# ---------------------------------------------------------------------------

def rgb_to_sepia(image, rescale: bool = True):
    r, g, b = _split(image)
    r2 = 0.393 * r + 0.769 * g + 0.189 * b
    g2 = 0.349 * r + 0.686 * g + 0.168 * b
    b2 = 0.272 * r + 0.534 * g + 0.131 * b
    out = jnp.stack([r2, g2, b2], axis=-1)
    if rescale:
        mx = jnp.max(out, axis=(-3, -2, -1), keepdims=True)
        out = out / jnp.maximum(mx, 1e-8)
    return jnp.clip(out, 0, 1)
