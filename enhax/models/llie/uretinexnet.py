"""URetinexNet: Retinex-based deep unfolding network (CVPR 2022).

Native rebuild of the reference's vendored URetinexNet
(mon_extra/vision/enhance/llie/uretinexnet/; EXTRA_MODELS "uretinexnet",
globals.py:1063). Inference pipeline (my_predict.py:56-82):

  round-0:  P, Q = Decom(I)                       (network/decom.py)
  round-t:  P = (I*Q + w_p*R) / (w_p + Q^2)       (network/Math_Module.py P)
            Q = (sum_c I_c*P_c + w_q*L) / (sum_c P_c^2 + w_q)   (... Q)
  each round: R = HalfDnCNNSE(P, Q)               (network/restoration.py)
              L = IlluminationAlone(Q)            (network/illumination_enhance.py)
  High_L = Adjust(L, ratio)                       (network/illumination_adjustment.py)
  enhanced = High_L * R

The unfolding weights w_p = gamma + Roffset*t, w_q = lamda + Loffset*t are
stored in the released checkpoint's opts; they are constructor args here.

TPU notes: the unfolding loop is a static unroll of small convs and
closed-form elementwise solves — one fused XLA program, no host round trips.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class Decom(nn.Module):
    """network/decom.py: 3->32->32->32->4, split R (3ch) / L (1ch)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _lrelu(nn.Conv(32, (3, 3), dtype=self.dtype, name="conv1")(x))
        y = _lrelu(nn.Conv(32, (3, 3), dtype=self.dtype, name="conv2")(y))
        y = _lrelu(nn.Conv(32, (3, 3), dtype=self.dtype, name="conv3")(y))
        y = nn.relu(nn.Conv(4, (3, 3), dtype=self.dtype, name="conv4")(y))
        return y[..., 0:3], y[..., 3:4]


class SELayer(nn.Module):
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(c // self.reduction, use_bias=False,
                             dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype,
                                    name="fc2")(s))
        return x * s[:, None, None, :]


class HalfDnCNNSE(nn.Module):
    """network/restoration.py:9-52 (concat_L variant of the released ckpt)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, r, l):
        r_fs = nn.relu(nn.Conv(32, (3, 3), dtype=self.dtype, name="conv1")(r))
        l_fs = nn.relu(nn.Conv(32, (3, 3), dtype=self.dtype, name="conv2")(l))
        y = jnp.concatenate([r_fs, l_fs], axis=-1)
        y = SELayer(dtype=self.dtype, name="se")(y)
        for i in range(3, 8):
            y = nn.relu(nn.Conv(64, (3, 3), dtype=self.dtype,
                                name=f"conv{i}")(y))
        n = nn.Conv(3, (3, 3), dtype=self.dtype, name="conv8")(y)
        return r + n


class IlluminationAlone(nn.Module):
    """network/illumination_enhance.py: 5x5 conv stack on L."""
    dtype: Any = None

    @nn.compact
    def __call__(self, l):
        y = _lrelu(nn.Conv(32, (5, 5), dtype=self.dtype, name="conv1")(l))
        y = _lrelu(nn.Conv(32, (5, 5), dtype=self.dtype, name="conv2")(y))
        y = _lrelu(nn.Conv(32, (5, 5), dtype=self.dtype, name="conv3")(y))
        y = _lrelu(nn.Conv(32, (5, 5), dtype=self.dtype, name="conv4")(y))
        return nn.relu(nn.Conv(1, (1, 1), dtype=self.dtype, name="conv5")(y))


class AdjustNaive(nn.Module):
    """network/illumination_adjustment.py: conv(L || alpha) stack."""
    dtype: Any = None

    @nn.compact
    def __call__(self, l, alpha):
        y = nn.Conv(32, (5, 5), dtype=self.dtype, name="conv1")(
            jnp.concatenate([l, alpha], axis=-1))
        y = nn.Conv(32, (5, 5), dtype=self.dtype, name="conv2")(_lrelu(y))
        y = nn.Conv(32, (5, 5), dtype=self.dtype, name="conv3")(_lrelu(y))
        y = nn.Conv(1, (5, 5), dtype=self.dtype, name="conv4")(_lrelu(y))
        return nn.relu(y)


class URetinexNetModule(nn.Module):
    rounds: int = 3
    gamma: float = 0.2
    lamda: float = 0.2
    r_offset: float = 0.1
    l_offset: float = 0.1
    ratio: float = 5.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        decom = Decom(dtype=self.dtype, name="decom")
        model_r = HalfDnCNNSE(dtype=self.dtype, name="model_r")
        model_l = IlluminationAlone(dtype=self.dtype, name="model_l")
        adjust = AdjustNaive(dtype=self.dtype, name="adjust")

        P = Q = R = L = None
        for t in range(self.rounds):
            if t == 0:
                P, Q = decom(x)
            else:
                w_p = self.gamma + self.r_offset * t
                w_q = self.lamda + self.l_offset * t
                P = (x * Q + w_p * R) / (w_p + Q * Q)
                Q = (jnp.sum(x * P, axis=-1, keepdims=True) + w_q * L) / \
                    (jnp.sum(P * P, axis=-1, keepdims=True) + w_q)
            R = model_r(P, Q)
            L = model_l(Q)
        high_l = adjust(L, jnp.full_like(L, self.ratio))
        return {"enhanced": high_l * R, "reflectance": R, "illumination": L}


@MODELS.register(name="uretinexnet", arch="uretinexnet", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def uretinexnet(rounds: int = 3, gamma: float = 0.2, lamda: float = 0.2,
                r_offset: float = 0.1, l_offset: float = 0.1,
                ratio: float = 5.0, **kwargs) -> Model:
    return Model(
        name="uretinexnet", arch="uretinexnet",
        module=URetinexNetModule(rounds=rounds, gamma=gamma, lamda=lamda,
                                 r_offset=r_offset, l_offset=l_offset,
                                 ratio=ratio),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=None,  # inference pipeline; training uses stage-wise fitting
        required_inputs=("image",),
        size_divisor=1,
    )
