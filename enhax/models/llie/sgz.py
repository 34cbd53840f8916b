"""SGZ: Semantic-Guided Zero-shot low-light enhancement.

Native rebuild of the reference's vendored SGZ
(mon_extra/vision/enhance/llie/sgz/modeling/model.py:53-116; EXTRA_MODELS
"sgz", globals.py:1047): a Zero-DCE++-style depthwise-separable curve net
(7 DSC convs, 32 features) whose shared 3-channel curve is estimated at
1/scale_factor resolution, upsampled with **corner-aligned** bilinear
(``nn.UpsamplingBilinear2d``, model.py:60 — NOT the half-pixel convention
the rest of the zoo uses), then applied for 8 quadratic iterations at full
resolution (model.py:82-91).

Training loss (sgz/train.py:62-68): 1600*TV + spa8 + 5*col + 10*exp(16, E)
plus 0.1 * a semantic-segmentation guidance term from a pretrained FPN
(train.py:52-60). The seg term requires the reference's pretrained seg
weights and is omitted here; the four zero-reference terms (with the
8-direction spatial loss) are faithful.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.zero_dce import apply_curves
from enhax.nn.layers import DSConv
from enhax.ops.resize import resize, resize_align_corners


class SGZModule(nn.Module):
    num_channels: int = 32
    num_iters: int = 8
    scale_factor: int = 12
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: DSConv(features=f, kernel_size=3,  # noqa: E731
                                      dtype=self.dtype, name=name)
        sf = self.scale_factor
        x_down = x
        if sf != 1:
            h = int(x.shape[-3] // sf * sf) // sf
            w = int(x.shape[-2] // sf * sf) // sf
            x_down = resize(x, (h, w), method="bilinear")
        r = nn.relu
        nf = self.num_channels
        x1 = r(conv(nf, "e_conv1")(x_down))
        x2 = r(conv(nf, "e_conv2")(x1))
        x3 = r(conv(nf, "e_conv3")(x2))
        x4 = r(conv(nf, "e_conv4")(x3))
        x5 = r(conv(nf, "e_conv5")(jnp.concatenate([x3, x4], -1)))
        x6 = r(conv(nf, "e_conv6")(jnp.concatenate([x2, x5], -1)))
        x_r = jnp.tanh(conv(3, "e_conv7")(jnp.concatenate([x1, x6], -1)))
        if sf != 1:
            x_r = resize_align_corners(x_r, (x.shape[-3], x.shape[-2]))
        y = apply_curves(x, x_r, self.num_iters, shared=True)
        return {"enhanced": y, "adjust": x_r}


def sgz_loss(exp_mean_val: float = 0.6):
    """SGZ zero-reference terms (train.py:62-68; seg guidance omitted)."""
    spa8 = LOSSES.build("spatial_consistency_loss", num_regions=8)
    exp = LOSSES.build("exposure_control_loss", patch_size=16,
                       mean_val=exp_mean_val)
    col = LOSSES.build("color_constancy_loss")
    tva = LOSSES.build("total_variation_loss")

    def fn(outputs, datapoint):
        image = datapoint["image"]
        enhanced = outputs["enhanced"]
        adjust = outputs["adjust"]
        return (1600.0 * tva(adjust) + spa8(enhanced, image)
                + 5.0 * col(enhanced) + 10.0 * exp(enhanced))
    return fn


@MODELS.register(name="sgz", arch="zero_dce", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def sgz(num_channels: int = 32, num_iters: int = 8, scale_factor: int = 12,
        **kwargs) -> Model:
    return Model(
        name="sgz", arch="zero_dce",
        module=SGZModule(num_channels=num_channels, num_iters=num_iters,
                         scale_factor=scale_factor),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=sgz_loss(),
        required_inputs=("image",),
        size_divisor=max(int(scale_factor), 1),
    )
