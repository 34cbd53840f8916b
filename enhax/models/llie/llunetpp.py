"""LLUNet++: UNet++ (nested dense skips) for supervised LLIE.

Rebuild of reference ``vision/enhance/llie/llunetpp/llunetpp.py:98-245``:
UNet++ topology over the reference's gated residual ``UNetConvBlock``
(conv+IN(affine)+lrelu, concat with a 1x1 shortcut of the input, two more
convs, plus a 1x1 residual of the concat; llunetpp.py:98-135). Node (i,j)
receives bilinear-align-corners-upsampled X(i+1,j-1) concatenated with all
X(i,0..j-1); clamped [0,1] output from the final 1x1.
Loss: SSIM + MS-SSIM + Perceptual + TV mix (llunetpp.py:35-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


class UNetConvBlock(nn.Module):
    """Gated residual block (llunetpp.py:98-135)."""
    features: int
    relu_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        from enhax.nn.layers import InstanceNorm2d
        cin = x.shape[-1]
        lrelu = lambda t: nn.leaky_relu(t, self.relu_slope)  # noqa: E731
        x1_2 = nn.Conv(cin, (1, 1), name="conv1_2")(x)
        x1 = nn.Conv(cin, (3, 3), name="conv1")(x)
        x1 = lrelu(InstanceNorm2d(affine=True, name="norm1")(x1))
        x2 = jnp.concatenate([x1, x1_2], axis=-1)
        x2_3 = nn.Conv(self.features, (1, 1), name="conv2_3")(x2)
        x2 = lrelu(nn.Conv(self.features, (3, 3), name="conv2")(x2))
        x3 = lrelu(nn.Conv(self.features, (3, 3), name="conv3")(x2))
        return x3 + x2_3


class LLUnetPPModule(nn.Module):
    filters: tuple = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        f = self.filters
        L = len(f)
        from enhax.ops.resize import resize_align_corners
        # torch nn.Upsample(bilinear, align_corners=True) (llunetpp.py:182)
        up = lambda v, ref: resize_align_corners(  # noqa: E731
            v, (ref.shape[-3], ref.shape[-2]))

        # nodes[i][j]
        nodes: dict = {}
        cur = x
        for i in range(L):
            nodes[(i, 0)] = UNetConvBlock(f[i], name=f"x{i}0")(cur)
            if i < L - 1:
                cur = nn.max_pool(nodes[(i, 0)], (2, 2), strides=(2, 2))
        for j in range(1, L):
            for i in range(L - j):
                skips = [nodes[(i, k)] for k in range(j)]
                upped = up(nodes[(i + 1, j - 1)], skips[0])
                nodes[(i, j)] = UNetConvBlock(f[i], name=f"x{i}{j}")(
                    jnp.concatenate(skips + [upped], axis=-1))

        out = nn.Conv(3, (1, 1), name="final")(nodes[(0, L - 1)])
        return {"enhanced": jnp.clip(out, 0.0, 1.0)}


def _llunetpp_loss():
    l1 = LOSSES.build("l1_loss")
    ssim_l = LOSSES.build("ssim_loss")
    per = LOSSES.build("perceptual_loss")

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return l1(p, t) + 0.5 * ssim_l(p, t) + 0.1 * per(p, t)
    return fn


@MODELS.register(name="llunet++_re", arch="llunetpp", aliases=["llunetpp_re", "llunetpp", "llunet++"],
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def llunetpp_re(filters=(32, 64, 128, 256, 512), **kwargs) -> Model:
    return Model(
        name="llunet++_re", arch="llunetpp",
        module=LLUnetPPModule(filters=tuple(filters)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_llunetpp_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
