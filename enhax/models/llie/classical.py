"""Classical (non-learned) LLIE methods: LIME / DUAL and PIE, TPU-native.

Rebuilds of the reference's vendored classical baselines:

  * LIME / DUAL (mon_extra/vision/enhance/llie/lime/exposure_enhancement.py):
    refine the max-channel illumination by solving
    (Id + lambda * F) l = l0 where F is a spatially-inhomogeneous 5-point
    Laplacian with LIME's affinity weights (:32-49). The reference builds a
    scipy CSR matrix and calls spsolve on the host; by default the same
    f64 direct solve runs through a pure_callback (the weights span ~1e6,
    beyond f32 iterative accuracy), with an optional fully-on-device
    Jacobi-BiCGStab stencil solver (`exact=False`). DUAL additionally
    corrects over-exposure on the inverted image and Mertens-fuses
    (:52-72, :180-190).
  * PIE (mon_extra/vision/enhance/llie/pie/pie.py): ADMM Retinex
    decomposition of the HSV V channel with FFT solves for the R and I
    subproblems (:62-134), gamma-corrected recombination R * I^(1/2.2).

Both are parameter-free models (registered like any other; `init` returns
an empty pytree), so the Predictor/CLI machinery works unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.color import hsv_to_rgb, rgb_to_hsv

# ---------------------------------------------------------------------------
# LIME / DUAL
# ---------------------------------------------------------------------------


def _gaussian_affinity_kernel(sigma: float, size: int = 15):
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    c = size // 2
    k = np.exp(-0.5 * ((yy - c) ** 2 + (xx - c) ** 2) / sigma ** 2)
    return jnp.asarray(k.astype(np.float32))


def _conv2_constant(x, kernel):
    """scipy.ndimage.convolve(mode='constant'): zero-padded correlation with
    the FLIPPED kernel (convolution proper)."""
    k = kernel[::-1, ::-1][:, :, None, None]
    p = kernel.shape[0] // 2
    xp = jnp.pad(x, ((p, p), (p, p)))
    return jax.lax.conv_general_dilated(
        xp[None, :, :, None], k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _sobel1(L, horizontal: bool):
    """cv2.Sobel ksize=1 ([-1, 0, 1]), reflect-101 border."""
    if horizontal:
        Lp = jnp.pad(L, ((0, 0), (1, 1)), mode="reflect")
        return Lp[:, 2:] - Lp[:, :-2]
    Lp = jnp.pad(L, ((1, 1), (0, 0)), mode="reflect")
    return Lp[2:, :] - Lp[:-2, :]


def _smooth_weights(L, horizontal: bool, kernel, eps: float = 1e-3):
    Lp = _sobel1(L, horizontal)
    T = _conv2_constant(jnp.ones_like(L), kernel)
    T = T / (jnp.abs(_conv2_constant(Lp, kernel)) + eps)
    return T / (jnp.abs(Lp) + eps)


def _spsolve_host(L64, w_up, w_down, w_left, w_right, lambda_):
    """Host f64 sparse direct solve (the reference's spsolve path). The
    affinity weights span ~6 orders of magnitude, so f32 iterative solvers
    bottom out ~0.5 off the true solution; exact parity needs f64."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    n, m = L64.shape
    N = n * m
    idx = np.arange(N).reshape(n, m)
    rows, cols, data = [np.arange(N)], [np.arange(N)], [
        1.0 + lambda_ * (w_up + w_down + w_left + w_right).reshape(-1)]
    for wgt, (di, dj) in ((w_up, (-1, 0)), (w_down, (1, 0)),
                          (w_left, (0, -1)), (w_right, (0, 1))):
        src = idx[max(0, -di): n - max(0, di), max(0, -dj): m - max(0, dj)]
        dst = idx[max(0, di): n + min(0, di) or n, max(0, dj): m + min(0, dj) or m]
        wv = wgt[max(0, -di): n - max(0, di), max(0, -dj): m - max(0, dj)]
        rows.append(src.reshape(-1))
        cols.append(dst.reshape(-1))
        data.append(-lambda_ * wv.reshape(-1))
    A = sp.csr_matrix((np.concatenate(data),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(N, N))
    return spla.spsolve(A, L64.reshape(-1)).reshape(n, m).astype(np.float32)


def refine_illumination_lime(L, gamma: float = 0.6, lambda_: float = 0.15,
                             sigma: float = 3.0, eps: float = 1e-3,
                             cg_tol: float = 1e-6, cg_maxiter: int = 2000,
                             exact: bool = False):
    """(Id + lambda*F) l = L. Default: on-device Jacobi-BiCGStab with a
    stencil matvec (approximate in f32 — the system's conditioning exceeds
    f32 precision); ``exact=True`` routes the solve through a host f64
    spsolve (bit-matching the reference)."""
    kernel = _gaussian_affinity_kernel(sigma)
    wx = _smooth_weights(L, True, kernel, eps)
    wy = _smooth_weights(L, False, kernel, eps)

    def shift(t, dy, dx):
        return jnp.roll(t, (dy, dx), axis=(0, 1))

    # neighbor weights, zeroed where the neighbor falls outside the image
    n, m = L.shape
    row = jnp.arange(n)[:, None]
    col = jnp.arange(m)[None, :]
    w_up = jnp.where(row - 1 >= 0, shift(wy, 1, 0), 0.0)      # wy[i-1, j]
    w_down = jnp.where(row + 1 < n, shift(wy, -1, 0), 0.0)    # wy[i+1, j]
    w_left = jnp.where(col - 1 >= 0, shift(wx, 0, 1), 0.0)    # wx[i, j-1]
    w_right = jnp.where(col + 1 < m, shift(wx, 0, -1), 0.0)   # wx[i, j+1]
    diag = w_up + w_down + w_left + w_right

    def matvec(l):
        acc = diag * l
        acc = acc - w_up * jnp.where(row - 1 >= 0, shift(l, 1, 0), 0.0)
        acc = acc - w_down * jnp.where(row + 1 < n, shift(l, -1, 0), 0.0)
        acc = acc - w_left * jnp.where(col - 1 >= 0, shift(l, 0, 1), 0.0)
        acc = acc - w_right * jnp.where(col + 1 < m, shift(l, 0, -1), 0.0)
        return l + lambda_ * acc

    if exact:
        l_ref = jax.pure_callback(
            lambda L_, wu, wd, wl, wr: _spsolve_host(
                np.asarray(L_, np.float64), np.asarray(wu, np.float64),
                np.asarray(wd, np.float64), np.asarray(wl, np.float64),
                np.asarray(wr, np.float64), lambda_),
            jax.ShapeDtypeStruct(L.shape, jnp.float32),
            L, w_up, w_down, w_left, w_right,
            vmap_method="sequential")
    else:
        # F is NOT symmetric (each off-diagonal is the affinity of the
        # NEIGHBOR pixel, exposure_enhancement.py:100-106), so CG is
        # invalid — Jacobi-preconditioned BiCGStab on the stencil instead.
        inv_diag = 1.0 / (1.0 + lambda_ * diag)
        l_ref, _ = jax.scipy.sparse.linalg.bicgstab(
            matvec, L, x0=L, tol=cg_tol, maxiter=cg_maxiter,
            M=lambda r: inv_diag * r)
    return jnp.clip(l_ref, eps, 1.0) ** gamma


def mertens_fusion(images, bc: float = 1.0, bs: float = 1.0, be: float = 1.0,
                   levels: int | None = None):
    """Mertens exposure fusion (contrast/saturation/well-exposedness weights
    + Laplacian-pyramid blending), the DUAL paper's merge step."""
    imgs = [jnp.clip(im, 0.0, 1.0) for im in images]
    weights = []
    lap = jnp.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)

    def conv1(x, k):
        xp = jnp.pad(x, ((1, 1), (1, 1)), mode="reflect")
        return jax.lax.conv_general_dilated(
            xp[None, :, :, None], k[:, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    for im in imgs:
        gray = jnp.mean(im, axis=-1)
        contrast = jnp.abs(conv1(gray, lap)) ** bc
        saturation = jnp.std(im, axis=-1) ** bs
        wellexp = jnp.prod(jnp.exp(-((im - 0.5) ** 2) / 0.08), axis=-1) ** be
        weights.append(contrast * saturation * wellexp + 1e-12)
    wsum = sum(weights)
    weights = [w / wsum for w in weights]

    h, w = imgs[0].shape[:2]
    if levels is None:
        levels = max(int(np.floor(np.log2(min(h, w)))) - 3, 1)

    def down(x):
        return jax.image.resize(x, (max(x.shape[0] // 2, 1),
                                    max(x.shape[1] // 2, 1)) + x.shape[2:],
                                "linear", antialias=True)

    def up(x, shape):
        return jax.image.resize(x, shape, "linear", antialias=False)

    fused = None
    for im, wgt in zip(imgs, weights):
        # build pyramids
        gp_w = [wgt]
        gp_i = [im]
        for _ in range(levels):
            gp_w.append(down(gp_w[-1]))
            gp_i.append(down(gp_i[-1]))
        lp_i = [gp_i[k] - up(gp_i[k + 1], gp_i[k].shape)
                for k in range(levels)] + [gp_i[-1]]
        contrib = [lp_i[k] * gp_w[k][..., None] for k in range(levels + 1)]
        fused = contrib if fused is None else [
            f + c for f, c in zip(fused, contrib)]

    out = fused[-1]
    for k in range(levels - 1, -1, -1):
        out = up(out, fused[k].shape) + fused[k]
    return jnp.clip(out, 0.0, 1.0)


class LIMEModule(nn.Module):
    """Parameter-free; `dual=True` = DUAL method, else plain LIME.

    ``exact=True`` (default) solves the illumination system with the host
    f64 direct solve, like the reference — the system's conditioning
    (affinity weights span ~1e6) exceeds f32 iterative accuracy. The
    device BiCGStab path (`exact=False`) stays for fully-on-device
    pipelines that tolerate an approximate illumination.
    """
    gamma: float = 0.6
    lambda_: float = 0.15
    sigma: float = 3.0
    dual: bool = True
    exact: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, image):
        def correct(im):
            L = jnp.max(im, axis=-1)
            l_ref = refine_illumination_lime(L, self.gamma, self.lambda_,
                                             self.sigma, exact=self.exact)
            return im / l_ref[..., None]

        def one(im):
            under = correct(im)
            if not self.dual:
                return jnp.clip(under, 0.0, 1.0)
            over = 1.0 - correct(1.0 - im)
            return mertens_fusion([im, under, over])

        out = jax.vmap(one)(image)
        return {"enhanced": out}


# ---------------------------------------------------------------------------
# PIE
# ---------------------------------------------------------------------------

def _psf2otf_1d(psf_h, psf_w, shape):
    """pie.py:22-45 EXACT construction: OTFs computed on the enlarged
    (H+1, W)/(H, W+1) grids, then sliced ([1:, :] / [:, 1:])."""
    h, w = shape
    fv = np.zeros((h, w + 1), np.float64)
    fv[0, 0], fv[0, 1] = 1.0, -1.0
    fv = np.roll(fv, -1, axis=1)
    fdV = np.fft.fft2(fv)[:, 1:]
    fh = np.zeros((h + 1, w), np.float64)
    fh[0, 0], fh[1, 0] = 1.0, -1.0
    fh = np.roll(fh, -1, axis=0)
    fdH = np.fft.fft2(fh)[1:, :]
    return jnp.asarray(fdH.astype(np.complex64)), \
        jnp.asarray(fdV.astype(np.complex64))


def _gaussian_blur5(x):
    """cv2.GaussianBlur(ksize=5, sigma=0): cv2 uses FIXED small-kernel
    coefficients [1,4,6,4,1]/16, reflect-101 border."""
    k1 = np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32)
    k = jnp.asarray(np.outer(k1, k1))
    xp = jnp.pad(x, ((2, 2), (2, 2)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp[None, :, :, None], k[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _sobel3(x, horizontal: bool):
    """cv2.Sobel 3x3 (default ksize), reflect-101."""
    d = np.array([-1.0, 0.0, 1.0], np.float32)
    s = np.array([1.0, 2.0, 1.0], np.float32)
    k = np.outer(s, d) if horizontal else np.outer(d, s)
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp[None, :, :, None], jnp.asarray(k)[:, :, None, None], (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def pie_enhance_v(v, alpha=1000.0, beta=0.01, lam=10.0, gama=0.1,
                  iters: int = 2):
    """pie.py:93-134 optimizAlgo on a [0,255] V channel (2 ADMM iters)."""
    eps = 1e-10
    h, w = v.shape
    fdH, fdV = _psf2otf_1d(None, None, (h, w))
    fdHcj, fdVcj = jnp.conj(fdH), jnp.conj(fdV)
    I = _gaussian_blur5(v)
    I0 = jnp.mean(v)
    R = jnp.zeros_like(v)
    bv = jnp.zeros_like(v)
    bh = jnp.zeros_like(v)

    def shrink(x, t):
        return x / (jnp.abs(x) + eps) * jnp.maximum(jnp.abs(x) - t, 0.0)

    for _ in range(iters):
        dv = shrink(_sobel3(R, True) + bv, 1.0 / (2 * lam))
        dh = shrink(_sobel3(R, False) + bh, 1.0 / (2 * lam))
        difv, difh = dv - bv, dh - bh
        ahp = beta * lam
        Fi = fdVcj * jnp.fft.fft2(difv) + fdHcj * jnp.fft.fft2(difh)
        f1 = jnp.fft.fft2(v / (I + eps)) + ahp * Fi
        f2 = (jnp.abs(fdH) ** 2 + jnp.abs(fdV) ** 2) * ahp + 1.0
        R = jnp.clip(jnp.abs(jnp.fft.ifft2(f1 / f2)), 0.0, 1.0).astype(v.dtype)
        bv = _sobel3(R, True) - difv
        bh = _sobel3(R, False) - difh
        f1 = jnp.fft.fft2(gama * I0 + v / (R + eps))
        f2 = alpha * (jnp.abs(fdH) ** 2 + jnp.abs(fdV) ** 2) + gama + 1.0
        I = jnp.abs(jnp.fft.ifft2(f1 / f2))
        I = jnp.maximum(jnp.clip(I, 0.0, 255.0), v).astype(v.dtype)

    I = 255.0 * jnp.power(I / 255.0, 1.0 / 2.2)
    return R * I


class PIEModule(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, image):
        hsv = rgb_to_hsv(image)
        v255 = hsv[..., 2] * 255.0

        def one(v):
            return pie_enhance_v(v)

        v_new = jax.vmap(one)(v255) / 255.0
        out = hsv_to_rgb(jnp.concatenate(
            [hsv[..., 0:2], jnp.clip(v_new, 0.0, 1.0)[..., None]], axis=-1))
        return {"enhanced": jnp.clip(out, 0.0, 1.0)}


@MODELS.register(name="lime", arch="lime", aliases=["dual"],
                 tasks=(Task.LLIE,), schemes=(Scheme.TRADITIONAL,))
def lime(gamma: float = 0.6, lambda_: float = 0.15, sigma: float = 3.0,
         dual: bool = True, exact: bool = True, **kwargs) -> Model:
    return Model(
        name="lime", arch="lime",
        module=LIMEModule(gamma=gamma, lambda_=lambda_, sigma=sigma, dual=dual,
                          exact=exact),
        tasks=(Task.LLIE,), schemes=(Scheme.TRADITIONAL,),
        required_inputs=("image",),
        size_divisor=1,
    )


@MODELS.register(name="pie", arch="pie", tasks=(Task.LLIE,),
                 schemes=(Scheme.TRADITIONAL,))
def pie(**kwargs) -> Model:
    return Model(
        name="pie", arch="pie",
        module=PIEModule(),
        tasks=(Task.LLIE,), schemes=(Scheme.TRADITIONAL,),
        required_inputs=("image",),
        size_divisor=1,
    )
