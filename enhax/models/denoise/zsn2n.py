"""ZSN2N: Zero-Shot Noise2Noise per-image denoising.

Rebuild of reference ``vision/enhance/denoise/zsn2n/zsn2n.py:34-200``:
3-conv LeakyReLU(0.2) noise predictor, pair-downsample residual +
consistency self-supervision, per-image fit (3000 steps Adam + StepLR).

Deviation noted: the reference's ``forward`` returns the raw network output
under ``enhanced`` (the *noise* estimate, per the ZSN2N colab where
denoised = x - f(x)). enhax returns ``noise`` plus the actually-denoised
image under ``enhanced`` so the predict pipeline writes the right thing.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.geometry import pair_downsample


class ZSN2NNet(nn.Module):
    num_channels: int = 48

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(nn.Conv(self.num_channels, (3, 3), name="conv1")(x), 0.2)
        y = nn.leaky_relu(nn.Conv(self.num_channels, (3, 3), name="conv2")(y), 0.2)
        noise = nn.Conv(x.shape[-1], (1, 1), name="conv3")(y)
        return {"noise": noise, "enhanced": jnp.clip(x - noise, 0.0, 1.0)}


def _zsn2n_forward_loss(model, variables, datapoint, rngs):
    """Residual + consistency loss (reference zsn2n.py:91-115)."""
    noisy = datapoint["image"]
    n1, n2 = pair_downsample(noisy)
    f = lambda img: model.apply(variables, {"image": img}, training=True, rngs=rngs)
    out1, out2, out = f(n1), f(n2), f(noisy)
    pred1 = n1 - out1["noise"]
    pred2 = n2 - out2["noise"]
    den1, den2 = pair_downsample(noisy - out["noise"])
    mse = lambda a, b: jnp.mean((a - b) ** 2)
    loss_res = 0.5 * (mse(n1, pred2) + mse(n2, pred1))
    loss_cons = 0.5 * (mse(pred1, den1) + mse(pred2, den2))
    return loss_res + loss_cons, out


@MODELS.register(name="zsn2n", arch="zsn2n",
                 tasks=(Task.DENOISE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE, Scheme.INSTANCE))
def zsn2n(num_channels: int = 48, **kwargs) -> Model:
    return Model(
        name="zsn2n", arch="zsn2n",
        module=ZSN2NNet(num_channels=num_channels),
        tasks=(Task.DENOISE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE, Scheme.INSTANCE),
        forward_loss_fn=_zsn2n_forward_loss,
        required_inputs=("image",),
        instance_steps=3000, instance_lr=1e-3,
    )
