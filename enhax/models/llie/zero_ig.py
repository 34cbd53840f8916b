"""Zero-IG: zero-shot illumination-guided joint denoising and enhancement.

Rebuild of reference ``vision/enhance/llie/zero_ig/zero_ig.py:56-520``
(CVPR'24): an illumination estimator (residual conv stack, sigmoid-clamped),
Denoise1 on the low-light input (ZSN2N-style) and Denoise2 on the
illumination-normalized image; trained per image with the paper's composite
loss (enhance + paired-downsample residual/consistency + color blur + TV +
bilateral smoothness).

Loss parity (zero_ig.py:164-256): enhance, res-1/res-2 pair-downsample,
color-blur, illumination-consistency, TV, bilateral SmoothLoss,
texture-gated local-mean consistency (Loss_cons) and local-variance
matching (Loss_Var) are all implemented. Remaining deviation: the
stage-2 cross-predictions (h3_pred/h4_pred on [h, s] concatenations,
zero_ig.py:230-234) are folded into the per-half full-pipeline residual
terms — same self-supervision signal through a simpler graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.filtering import gaussian_filter
from enhax.ops.geometry import pair_downsample


class DenoiseNet(nn.Module):
    """3-conv LeakyReLU noise predictor (Denoise1/Denoise2, zero_ig.py:257)."""
    embed_channels: int = 48
    in_out: int = 3

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(nn.Conv(self.embed_channels, (3, 3), name="conv1")(x), 0.2)
        y = nn.leaky_relu(nn.Conv(self.embed_channels, (3, 3), name="conv2")(y), 0.2)
        return nn.Conv(self.in_out, (1, 1), name="conv3")(y)


class Enhance(nn.Module):
    """Residual conv illumination estimator (zero_ig.py:305-345)."""
    layers: int = 3
    channels: int = 64

    @nn.compact
    def __call__(self, x):
        fea = nn.relu(nn.Conv(self.channels, (3, 3), name="in_conv")(x))
        # reference reuses ONE conv block for all residual steps
        block = nn.Conv(self.channels, (3, 3), name="block")
        for _ in range(self.layers):
            fea = fea + nn.relu(block(fea))
        out = jax.nn.sigmoid(nn.Conv(3, (3, 3), name="out_conv")(fea))
        return jnp.clip(out, 1e-4, 1.0)


class ZeroIGModule(nn.Module):
    num_channels: int = 64
    embed_channels: int = 48

    @nn.compact
    def __call__(self, x):
        eps = 1e-9
        noise1 = DenoiseNet(self.embed_channels, name="denoise1")(x)
        l2 = jnp.clip(x - noise1, 0.0, 1.0)             # denoised low-light
        s2 = Enhance(channels=self.num_channels, name="enhance")(l2)  # illumination
        h2 = l2 / jnp.maximum(s2, eps)                   # enhanced (pre-denoise)
        h2 = jnp.clip(h2, 0.0, 1.0)
        noise2 = DenoiseNet(self.embed_channels, name="denoise2")(h2)
        h3 = jnp.clip(h2 - noise2, 0.0, 1.0)             # final enhanced
        return {"l2": l2, "s2": s2, "h2": h2, "enhanced": h3,
                "noise1": noise1, "noise2": noise2}


def _mean5_zero(x):
    """5x5 sliding mean, zero padding, fixed /25 (AvgPool2d semantics with
    count_include_pad=True; zero_ig.py:41-53)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME")
    return s / 25.0


def _local_var5(x):
    """Reference calculate_local_variance: windowed mean of (x - avg)^2
    where avg is the 5x5 zero-pad sliding mean (zero_ig.py:41-53)."""
    d = x - _mean5_zero(x)
    return _mean5_zero(d * d)


def _local_mean5(x):
    """5x5 sliding mean with reflect padding (core ImageLocalMean)."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "VALID")
    return s / 25.0


def _zero_ig_forward_loss(model, variables, datapoint, rngs):
    image = datapoint["image"] + 1e-9
    f = lambda img: model.apply(variables, {"image": img}, rngs=rngs)
    out = f(image)
    l2, s2, h2, h3 = out["l2"], out["s2"], out["h2"], out["enhanced"]

    mse = lambda a, b: jnp.mean((a - b) ** 2)
    sg = jax.lax.stop_gradient

    # Enhance loss: push brightness toward adaptive target (zero_ig.py:205-221)
    input_y = (0.299 * l2[..., 0] + 0.587 * l2[..., 1] + 0.144 * l2[..., 2])
    y_mean = jnp.mean(input_y, axis=(-2, -1), keepdims=True)[..., None]
    factor = jnp.clip(0.5 / (y_mean + 1e-9), 1.0, 25.0)
    adjust_ratio = jnp.power(0.7, -factor) / factor
    enhanced_brightness = jnp.power(sg(l2) * factor, factor)
    clamped_eb = jnp.clip(enhanced_brightness * adjust_ratio, 1e-9, 1.0)
    clamped_adj = jnp.clip(sg(l2) * factor, 1e-9, 1.0)
    norm_low = jnp.clip(sg(l2) / s2, 1e-9, 0.8)
    loss = 700.0 * mse(s2, clamped_eb) + 1000.0 * mse(norm_low, clamped_adj)

    # Residual losses (ZSN2N pattern on both stages, zero_ig.py:222-238):
    # denoised sub-images must cross-predict each other and match the
    # downsampled full denoise.
    i1, i2 = pair_downsample(image)
    o1, o2 = f(i1), f(i2)
    d1, d2 = pair_downsample(l2)
    loss += 1000.0 * (mse(i1, o2["l2"]) + mse(i2, o1["l2"])
                      + mse(o1["l2"], d1) + mse(o2["l2"], d2))
    e1, e2 = pair_downsample(h3)
    loss += 1000.0 * (mse(o1["enhanced"], e1) + mse(o2["enhanced"], e2))

    # Color consistency via blur (zero_ig.py:240)
    loss += 10000.0 * mse(sg(gaussian_filter(h2, 5, 1.0)), gaussian_filter(h3, 5, 1.0))

    # Illumination consistency + smoothness
    s3 = f(h3)["s2"]
    loss += 1000.0 * mse(sg(s2), s3)
    tv = LOSSES.build("total_variation_loss")
    loss += 1600.0 * tv(s2)

    # Bilateral illumination smoothness (zero_ig.py:220 SmoothLoss * 5)
    smooth = LOSSES.build("bilateral_smooth_loss")
    loss += 5.0 * smooth(sg(l2), s2)

    # Texture-gated local-mean consistency (Loss_cons, zero_ig.py:240-245):
    # in flat regions (gate 0) the denoised halves must match their local
    # means; textured regions (gate 1) are left alone. The gate reuses the
    # reference's asymmetric pairing (h3_denoised1 in both weighted diffs).
    gate = LOSSES.build("texture_difference_loss")(e1, e2)
    lm1, lm2 = _local_mean5(e1), _local_mean5(e2)
    wd1 = (1.0 - gate) * lm1 + e1 * gate
    wd2 = (1.0 - gate) * lm2 + e1 * gate
    loss += 10000.0 * (mse(e1, wd1) + mse(e2, wd2))

    # Local-variance matching (Loss_Var, zero_ig.py:246-249): the local
    # variance of the removed noise (h3 - h2) must match that of h2.
    loss += 1000.0 * mse(_local_var5(h2), _local_var5(h3 - h2))
    return loss, out


@MODELS.register(name="zero_ig_re", arch="zero_ig", aliases=["zero_ig"],
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zero_ig_re(num_channels: int = 64, embed_channels: int = 48, **kwargs) -> Model:
    return Model(
        name="zero_ig_re", arch="zero_ig",
        module=ZeroIGModule(num_channels=num_channels, embed_channels=embed_channels),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        forward_loss_fn=_zero_ig_forward_loss,
        required_inputs=("image",),
        instance_steps=1000, instance_lr=1e-4,
    )
