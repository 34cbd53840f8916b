"""Image quality metrics in pure JAX (NHWC, [0, data_range]).

Rebuild of reference ``src/mon/nn/metric/`` (base.py:38, image.py:63-410
PSNR/SSIM/MS-SSIM + CustomSSIM, efficiency.py:29 efficiency score). SSIM
follows the pytorch-msssim convention the reference's ``CustomSSIM`` wraps:
Gaussian window (11, 1.5), *valid* convolution (no padding), k1=0.01,
k2=0.03; MS-SSIM uses the standard 5-scale weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from enhax.constants import METRICS

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _fspecial_gauss_1d(size: int, sigma: float):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return jnp.asarray((g / g.sum()).astype(np.float32))


def _gaussian_filter_valid(x, win):
    """Separable Gaussian filter, VALID padding, on (N, H, W, C)."""
    size = win.shape[0]

    def conv_axis(v, axis):
        n = v.shape[axis]
        out = 0.0
        for i in range(size):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + n - size + 1)
            out = out + win[i] * v[tuple(sl)]
        return out

    return conv_axis(conv_axis(x, -3), -2)


@METRICS.register(name="psnr", aliases=["peak_signal_noise_ratio"])
def psnr(input, target, data_range: float = 1.0, eps: float = 1e-12):
    """Peak signal-to-noise ratio over the whole batch (torchmetrics default)."""
    mse = jnp.mean((input.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / (mse + eps))


def psnr_per_image(input, target, data_range: float = 1.0, eps: float = 1e-12):
    """Per-image PSNR, reduced over H/W/C only. Input (N, H, W, C) -> (N,)."""
    mse = jnp.mean((input - target) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / (mse + eps))


def _ssim_components(x, y, data_range, window_size, sigma, k):
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _fspecial_gauss_1d(window_size, sigma)
    mu_x = _gaussian_filter_valid(x, win)
    mu_y = _gaussian_filter_valid(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _gaussian_filter_valid(x * x, win) - mu_xx
    sigma_yy = _gaussian_filter_valid(y * y, win) - mu_yy
    sigma_xy = _gaussian_filter_valid(x * y, win) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


@METRICS.register(name="ssim", aliases=["structural_similarity_index_measure"])
def ssim(input, target, data_range: float = 1.0, window_size: int = 11,
         sigma: float = 1.5, k: tuple = (0.01, 0.03), non_negative: bool = False):
    """Structural similarity (pytorch-msssim parity; reference image.py:316-410)."""
    x = input.astype(jnp.float32)
    y = target.astype(jnp.float32)
    ssim_map, _ = _ssim_components(x, y, data_range, window_size, sigma, k)
    if non_negative:
        ssim_map = jax.nn.relu(ssim_map)
    return jnp.mean(ssim_map)


def _avg_pool2(x):
    h, w = x.shape[-3] // 2, x.shape[-2] // 2
    x = x[..., : h * 2, : w * 2, :]
    return x.reshape(*x.shape[:-3], h, 2, w, 2, x.shape[-1]).mean(axis=(-4, -2))


@METRICS.register(name="ms_ssim",
                  aliases=["multiscale_ssim",
                           "multiscale_structural_similarity_index_measure"])
def ms_ssim(input, target, data_range: float = 1.0, window_size: int = 11,
            sigma: float = 1.5, weights=None, k: tuple = (0.01, 0.03)):
    """Multi-scale SSIM with the standard 5-scale weights."""
    w = list(weights if weights is not None else _MSSSIM_WEIGHTS)
    x = input.astype(jnp.float32)
    y = target.astype(jnp.float32)
    # trim scales the image is too small for (needs win px after k halvings)
    min_side = min(x.shape[-3], x.shape[-2])
    max_levels = max(1, int(np.floor(np.log2(min_side / window_size))) + 1)
    if len(w) > max_levels:
        w = w[:max_levels]
        w = [wi / sum(w) for wi in w]
    w = jnp.asarray(w)
    levels = w.shape[0]
    mcs = []
    val = None
    for i in range(levels):
        ssim_map, cs = _ssim_components(x, y, data_range, window_size, sigma, k)
        if i < levels - 1:
            mcs.append(jax.nn.relu(jnp.mean(cs)))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        else:
            val = jax.nn.relu(jnp.mean(ssim_map))
    stack = jnp.stack(mcs + [val])
    return jnp.prod(stack ** w)


@METRICS.register(name="mae")
def mae(input, target, **_):
    return jnp.mean(jnp.abs(input - target))


@METRICS.register(name="mse")
def mse(input, target, **_):
    return jnp.mean((input - target) ** 2)


@METRICS.register(name="rmse")
def rmse(input, target, **_):
    return jnp.sqrt(jnp.mean((input - target) ** 2))


# ---------------------------------------------------------------------------
# Efficiency score (reference nn/metric/efficiency.py:29-74)
# ---------------------------------------------------------------------------

def compute_efficiency_score(apply_fn, params, datapoint, runs: int = 20):
    """(flops_G, params_M, avg_seconds) of a jitted forward.

    FLOPs come from XLA's cost analysis of the compiled HLO — the TPU-native
    replacement for thop/fvcore (reference core/thop.py:20).
    """
    import jax

    jitted = jax.jit(apply_fn)
    lowered = jitted.lower(params, datapoint)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = float("nan")
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    from enhax.utils.timer import time_device_fn
    avg_s = time_device_fn(jitted, params, datapoint, warmup=2, repeats=runs)
    return flops / 1e9, n_params / 1e6, avg_s


# ---------------------------------------------------------------------------
# LPIPS (reference wraps torchmetrics LPIPS, nn/metric/image.py:63-83).
# The metric needs pretrained AlexNet + linear-head weights; this provides the
# architecture and scoring given a converted params pytree (use
# enhax.convert.torch_weights on a local torchmetrics/lpips checkpoint —
# this image has no network egress to download them).
# ---------------------------------------------------------------------------

class _LPIPSAlexFeatures:
    """AlexNet conv trunk tapped at the 5 LPIPS layers (relu1..relu5)."""

    def __init__(self):
        from flax import linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                taps = []
                x = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4),
                                    padding=((2, 2), (2, 2)), name="conv1")(x))
                taps.append(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                x = nn.relu(nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)),
                                    name="conv2")(x))
                taps.append(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                x = nn.relu(nn.Conv(384, (3, 3), name="conv3")(x))
                taps.append(x)
                x = nn.relu(nn.Conv(256, (3, 3), name="conv4")(x))
                taps.append(x)
                x = nn.relu(nn.Conv(256, (3, 3), name="conv5")(x))
                taps.append(x)
                return taps

        self.net = Net()

    def init(self, rng, x):
        return self.net.init(rng, x)

    def __call__(self, params, x):
        return self.net.apply(params, x)


def lpips(input, target, params: dict, lin_weights: list,
          normalize: bool = True, shift=None, scale=None):
    """Learned perceptual image patch similarity (AlexNet backbone).

    Args:
        input/target: (N, H, W, 3) in [0, 1].
        params: converted AlexNet feature params (flax pytree).
        lin_weights: list of 5 (C,) arrays — the LPIPS linear head weights.
        shift/scale: scaling-layer constants; None uses the published
            values (converted checkpoints carry them as buffers — see
            enhax.convert.metric_weights.load_lpips_checkpoint).
    """
    feat = _LPIPSAlexFeatures()
    shift = jnp.asarray([-0.030, -0.088, -0.188] if shift is None else shift)
    scale = jnp.asarray([0.458, 0.448, 0.450] if scale is None else scale)

    def prep(x):
        if normalize:
            x = 2.0 * x - 1.0
        return (x - shift) / scale

    fx = feat(params, prep(input))
    fy = feat(params, prep(target))
    total = 0.0
    for f1, f2, w in zip(fx, fy, lin_weights):
        # lpips/pretrained_networks.py normalize_tensor: x / (||x|| + eps)
        n1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-10)
        n2 = f2 / (jnp.linalg.norm(f2, axis=-1, keepdims=True) + 1e-10)
        d = (n1 - n2) ** 2
        w = jnp.asarray(w).reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


METRICS.register(name="lpips", obj=lpips,
                 aliases=["learned_perceptual_image_patch_similarity"])


class SegmentationMetric:
    """Confusion-matrix segmentation scorer across a result set.

    Rebuild of the reference's darkcityscapes harness
    (project/runml/metric_darkcityscapes.py:21-75): accumulate per-image
    label maps with ``add_batch`` and read ``mean_iou`` / pixel-accuracy
    aggregates, with identical numpy semantics (nanmean over absent
    classes; out-of-range labels masked out).
    """

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class))

    def add_batch(self, pred, label):
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        label = np.asarray(label).reshape(-1).astype(np.int64)
        assert pred.shape == label.shape
        mask = (label >= 0) & (label < self.num_class)
        idx = self.num_class * label[mask] + pred[mask]
        count = np.bincount(idx, minlength=self.num_class ** 2)
        self.confusion_matrix += count.reshape(self.num_class, self.num_class)

    def pixel_accuracy(self) -> float:
        cm = self.confusion_matrix
        return float(np.diag(cm).sum() / cm.sum())

    def mean_pixel_accuracy(self) -> float:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            class_acc = np.diag(cm) / cm.sum(axis=0)
        return float(np.nanmean(class_acc))

    def mean_iou(self) -> float:
        cm = self.confusion_matrix
        inter = np.diag(cm)
        union = cm.sum(axis=1) + cm.sum(axis=0) - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = inter / union
        return float(np.nanmean(iou))

    def frequency_weighted_iou(self) -> float:
        cm = self.confusion_matrix
        freq = cm.sum(axis=1) / cm.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            iu = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return float((freq[freq > 0] * iu[freq > 0]).sum())

    def reset(self):
        self.confusion_matrix = np.zeros((self.num_class, self.num_class))


@METRICS.register(name="miou")
def miou(pred_labels, target_labels, num_classes: int, ignore_index: int | None = 255):
    """Mean intersection-over-union for segmentation label maps.

    Rebuild of the reference's darkcityscapes mIoU harness
    (project/runml/metric_darkcityscapes.py). Inputs: int label maps
    (N, H, W) or (N, H, W, 1).
    """
    p = pred_labels.reshape(-1).astype(jnp.int32)
    t = target_labels.reshape(-1).astype(jnp.int32)
    if ignore_index is not None:
        valid = t != ignore_index
    else:
        valid = jnp.ones_like(t, dtype=bool)
    ious = []
    for c in range(num_classes):
        pi = (p == c) & valid
        ti = (t == c) & valid
        inter = jnp.sum(pi & ti)
        union = jnp.sum(pi | ti)
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
    ious = jnp.stack(ious)
    return jnp.nanmean(ious)
