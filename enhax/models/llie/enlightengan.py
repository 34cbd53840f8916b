"""EnlightenGAN: attention-guided unsupervised GAN generator (TIP 2021).

Native rebuild of the reference's vendored EnlightenGAN generator
(mon_extra/vision/enhance/llie/enlightengan/master/models/networks.py:594
Unet_resize_conv; EXTRA_MODELS "enlightengan", globals.py:911) at the
released configuration: self_attention=True, use_norm=1 (BatchNorm),
times_residual=True, skip=1, tanh/linear off.

  gray = 1 - luma(x)                    (unaligned_dataset.py:98-101)
  attention U-Net: 5 conv levels (maxpool down), bilinear up + 3x3
  "deconv" convs, every skip and the bottleneck modulated by the
  downsampled gray map; latent = conv10(out) * gray;
  output = latent + input_[-1,1] * skip  -> back to [0,1].

The reference serves this generator via an exported ONNX model
(my_predict.py:19); training is adversarial (global+local discriminators
+ self feature-preserving loss) and is out of scope here — the registered
model is the inference generator with converted released weights.

TPU notes: plain UNet convs (32..512 ch) — MXU-friendly; attention maps
are cheap elementwise multiplies fused by XLA.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _up2(x):
    # F.upsample(scale_factor=2, mode='bilinear') (align_corners=False)
    return jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2,
                                x.shape[3]), "bilinear", antialias=False)


class EnlightenGANModule(nn.Module):
    skip: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, image):
        x01 = image
        inp = x01 * 2.0 - 1.0
        gray = (1.0 - jnp.sum(x01 * _LUMA, axis=-1, keepdims=True))

        conv = lambda f, name, k=3: nn.Conv(  # noqa: E731
            f, (k, k), dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=True, epsilon=1e-5, momentum=0.9,
            dtype=self.dtype, name=name)
        lrelu = lambda t: nn.leaky_relu(t, negative_slope=0.2)  # noqa: E731
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731

        g1 = gray
        g2 = pool(g1)
        g3 = pool(g2)
        g4 = pool(g3)
        g5 = pool(g4)

        y = bn("bn1_1")(lrelu(conv(32, "conv1_1")(
            jnp.concatenate([inp, gray], axis=-1))))
        c1 = bn("bn1_2")(lrelu(conv(32, "conv1_2")(y)))
        y = pool(c1)
        y = bn("bn2_1")(lrelu(conv(64, "conv2_1")(y)))
        c2 = bn("bn2_2")(lrelu(conv(64, "conv2_2")(y)))
        y = pool(c2)
        y = bn("bn3_1")(lrelu(conv(128, "conv3_1")(y)))
        c3 = bn("bn3_2")(lrelu(conv(128, "conv3_2")(y)))
        y = pool(c3)
        y = bn("bn4_1")(lrelu(conv(256, "conv4_1")(y)))
        c4 = bn("bn4_2")(lrelu(conv(256, "conv4_2")(y)))
        y = pool(c4)
        y = bn("bn5_1")(lrelu(conv(512, "conv5_1")(y)))
        y = y * g5
        c5 = bn("bn5_2")(lrelu(conv(512, "conv5_2")(y)))

        c5 = _up2(c5)
        up6 = jnp.concatenate([conv(256, "deconv5")(c5), c4 * g4], axis=-1)
        y = bn("bn6_1")(lrelu(conv(256, "conv6_1")(up6)))
        c6 = bn("bn6_2")(lrelu(conv(256, "conv6_2")(y)))

        c6 = _up2(c6)
        up7 = jnp.concatenate([conv(128, "deconv6")(c6), c3 * g3], axis=-1)
        y = bn("bn7_1")(lrelu(conv(128, "conv7_1")(up7)))
        c7 = bn("bn7_2")(lrelu(conv(128, "conv7_2")(y)))

        c7 = _up2(c7)
        up8 = jnp.concatenate([conv(64, "deconv7")(c7), c2 * g2], axis=-1)
        y = bn("bn8_1")(lrelu(conv(64, "conv8_1")(up8)))
        c8 = bn("bn8_2")(lrelu(conv(64, "conv8_2")(y)))

        c8 = _up2(c8)
        up9 = jnp.concatenate([conv(32, "deconv8")(c8), c1 * g1], axis=-1)
        y = bn("bn9_1")(lrelu(conv(32, "conv9_1")(up9)))
        c9 = lrelu(conv(32, "conv9_2")(y))

        latent = conv(3, "conv10", k=1)(c9)
        latent = latent * gray                       # times_residual
        out = latent + inp * self.skip               # skip=1
        enhanced = jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)
        return {"enhanced": enhanced, "attention": gray, "latent": latent}


@MODELS.register(name="enlightengan", arch="enlightengan", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED,))
def enlightengan(skip: float = 1.0, **kwargs) -> Model:
    return Model(
        name="enlightengan", arch="enlightengan",
        module=EnlightenGANModule(skip=skip),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED,),
        loss_fn=None,  # adversarial training out of scope (ONNX-served ref)
        required_inputs=("image",),
        size_divisor=16,
    )
