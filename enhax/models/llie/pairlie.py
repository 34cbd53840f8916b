"""PairLIE: learning from paired low-light instances (CVPR 2023).

Native rebuild of the reference's vendored PairLIE
(mon_extra/vision/enhance/llie/pairlie/net/net.py; EXTRA_MODELS "pairlie",
globals.py:983). Three 5-conv reflect-padded nets:

  X = N_net(input)   (noise-removed image; D = input - X)
  L = L_net(X)       (1-ch illumination, sigmoid)
  R = R_net(X)       (3-ch reflectance, sigmoid)
  enhanced I = L^exponent * R   (my_predict.py:84; 0.2 default, 0.14 LOL)

Training consumes PAIRS of low-light views of one scene (main.py:53-56):
  C_loss = MSE(R1, R2); R_loss = MSE(L*R, X) + MSE(R, X/sg(L)) +
  MSE(L, max_rgb(X-input?)) + tv(L); P_loss = 500 * MSE(input, X).
Single-image batches drop the cross-view consistency term.

TPU notes: plain 3x3 conv stacks — XLA fuses each net; reflect padding is
a jnp.pad before a VALID conv (identical to torch ReflectionPad2d+conv).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


class _RefConv(nn.Module):
    """ReflectionPad2d(1) + 3x3 VALID conv (net.py layout)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class _FiveConvNet(nn.Module):
    """5-layer reflect-conv stack with ReLU, sigmoid head (net.py:5-75)."""
    out_channels: int
    num: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.relu(_RefConv(self.num, dtype=self.dtype,
                                 name=f"c{i}")(x))
        x = _RefConv(self.out_channels, dtype=self.dtype, name="c4")(x)
        return jax.nn.sigmoid(x)


class PairLIEModule(nn.Module):
    num: int = 64
    exponent: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        clean = _FiveConvNet(3, self.num, dtype=self.dtype, name="n_net")(x)
        illu = _FiveConvNet(1, self.num, dtype=self.dtype, name="l_net")(clean)
        refl = _FiveConvNet(3, self.num, dtype=self.dtype, name="r_net")(clean)
        enhanced = jnp.power(illu, self.exponent) * refl
        return {"enhanced": enhanced, "illumination": illu,
                "reflectance": refl, "clean": clean}


def _tv_loss(l):
    gh = jnp.abs(l[:, 2:, :, :] - l[:, :-2, :, :])
    gw = jnp.abs(l[:, :, 2:, :] - l[:, :, :-2, :])
    return jnp.mean(gh) + jnp.mean(gw)


def pairlie_forward_loss(model, variables, datapoint, rngs):
    """main.py:53-56 pair losses; C_loss dropped without a second view."""
    x1 = datapoint["image"]
    out1 = model.apply(variables, {"image": x1}, rngs=rngs)
    L1, R1, X1 = out1["illumination"], out1["reflectance"], out1["clean"]
    mse = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
    max_rgb = jnp.max(x1, axis=-1, keepdims=True)
    r_loss = (mse(L1 * R1, X1)
              + mse(R1, X1 / jnp.clip(jax.lax.stop_gradient(L1), 1e-4, 1.0))
              + mse(L1, max_rgb) + _tv_loss(L1))
    p_loss = mse(x1, X1)
    total = r_loss + 500.0 * p_loss
    if "image2" in datapoint and datapoint["image2"] is not None:
        out2 = model.apply(variables, {"image": datapoint["image2"]}, rngs=rngs)
        total = total + mse(R1, out2["reflectance"])
    return total, out1


@MODELS.register(name="pairlie", arch="pairlie", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED,))
def pairlie(num: int = 64, exponent: float = 0.2, **kwargs) -> Model:
    return Model(
        name="pairlie", arch="pairlie",
        module=PairLIEModule(num=num, exponent=exponent),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED,),
        loss_fn=lambda outputs, dp: 0.0,  # real loss via forward_loss_fn
        forward_loss_fn=pairlie_forward_loss,
        required_inputs=("image",),
        size_divisor=1,
    )
