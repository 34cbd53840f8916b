"""SCI: Self-Calibrated Illumination learning (CVPR 2022).

Native rebuild of the reference's vendored SCI
(mon_extra/vision/enhance/llie/sci/model.py; EXTRA_MODELS "sci",
globals.py:1039). Key structural facts preserved:

  * EnhanceNetwork (model.py:7-45): in_conv -> `layers` residual
    conv+BN+relu blocks that all SHARE one weight set (the torch code
    appends the same Sequential repeatedly) -> sigmoid out_conv;
    illu = clamp(fea + input, 1e-4, 1).
  * CalibrateNetwork (model.py:48-88): shared double conv+BN+relu blocks;
    delta = input - sigmoid(out).
  * Train loop (model.py:91-127): per stage i=enhance(input_op),
    r=clamp(input/i,0,1), att=calibrate(r), input_op=input+att — enhance
    and calibrate weights shared across stages. Inference (Finetunemodel,
    model.py:130-163) is a single enhance pass: enhanced = input / illu.
  * Loss (sci/loss.py): 1.5*MSE(illu, input) + 24-direction bilateral
    smoothness with YCbCr-based weights.

TPU notes: tiny convs (3/16 ch) — the whole stage loop fuses into one XLA
program; the 24-offset smooth loss is a static Python loop of shifted
subtractions, all fused elementwise. BatchNorm runs with running averages
(inference parity with released checkpoints); stats are frozen at init for
zero-reference training, which the original 3-channel model tolerates.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


class _ConvBNReLU(nn.Module):
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class EnhanceNet(nn.Module):
    """model.py:7-45 (layers share one weight set)."""
    layers: int = 1
    channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fea = nn.relu(nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                              name="in_conv")(x))
        block = _ConvBNReLU(self.channels, dtype=self.dtype, name="block")
        for _ in range(self.layers):
            fea = fea + block(fea)
        fea = jax.nn.sigmoid(nn.Conv(3, (3, 3), dtype=self.dtype,
                                     name="out_conv")(fea))
        return jnp.clip(fea + x, 1e-4, 1.0)


class CalibrateNet(nn.Module):
    """model.py:48-88 (blocks share one double-conv weight set)."""
    layers: int = 3
    channels: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fea = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="in_conv")(x)
        fea = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                           dtype=self.dtype, name="in_bn")(fea)
        fea = nn.relu(fea)
        b1 = _ConvBNReLU(self.channels, dtype=self.dtype, name="block1")
        b2 = _ConvBNReLU(self.channels, dtype=self.dtype, name="block2")
        for _ in range(self.layers):
            fea = fea + b2(b1(fea))
        fea = jax.nn.sigmoid(nn.Conv(3, (3, 3), dtype=self.dtype,
                                     name="out_conv")(fea))
        return x - fea


class SCIModule(nn.Module):
    stage: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        enhance = EnhanceNet(dtype=self.dtype, name="enhance")
        calibrate = CalibrateNet(dtype=self.dtype, name="calibrate")
        inp = x
        illus, ins = [], []
        for _ in range(self.stage):
            ins.append(inp)
            illu = enhance(inp)
            r = jnp.clip(x / illu, 0.0, 1.0)
            att = calibrate(r)
            inp = x + att
            illus.append(illu)
        # stage-1 r IS the Finetunemodel inference output (model.py:157-160)
        enhanced = jnp.clip(x / illus[0], 0.0, 1.0)
        return {"enhanced": enhanced,
                "illu": jnp.stack(illus), "stage_inputs": jnp.stack(ins)}


# ---------------------------------------------------------------------------
# loss (sci/loss.py)
# ---------------------------------------------------------------------------

_YCBCR_MAT = jnp.array([[0.257, -0.148, 0.439],
                        [0.564, -0.291, -0.368],
                        [0.098, 0.439, -0.071]], jnp.float32)
_YCBCR_BIAS = jnp.array([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], jnp.float32)

_OFFSETS = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)
            if (dy, dx) != (0, 0)]  # the 24 directions of loss.py:31-90


def _shift_pair(t, dy, dx):
    """Valid-region pair (t_core, t_shifted) for offset (dy, dx), NHWC."""
    h, w = t.shape[1], t.shape[2]
    y0, y1 = max(dy, 0), h + min(dy, 0)
    x0, x1 = max(dx, 0), w + min(dx, 0)
    a = t[:, y0:y1, x0:x1, :]
    b = t[:, y0 - dy:y1 - dy, x0 - dx:x1 - dx, :]
    return a, b


def sci_smooth_loss(image, illu, sigma: float = 10.0):
    """24-direction bilateral smoothness (loss.py:17-120), NHWC."""
    ycc = image @ _YCBCR_MAT + _YCBCR_BIAS
    sigma_color = -1.0 / (2 * sigma * sigma)
    total = 0.0
    for dy, dx in _OFFSETS:
        ga, gb = _shift_pair(ycc, dy, dx)
        w = jnp.exp(jnp.sum((ga - gb) ** 2, axis=-1, keepdims=True) * sigma_color)
        oa, ob = _shift_pair(illu, dy, dx)
        grad = jnp.sum(jnp.abs(oa - ob), axis=-1, keepdims=True)  # L1 over C
        total = total + jnp.mean(w * grad)
    return total


def sci_loss(outputs, datapoint):
    """Sum over stages of 1.5*MSE(illu, input) + smooth (model.py:121-126)."""
    illus = outputs["illu"]          # (stage, N, H, W, C)
    ins = outputs["stage_inputs"]
    total = 0.0
    for s in range(illus.shape[0]):
        fidelity = jnp.mean((illus[s] - ins[s]) ** 2)
        total = total + 1.5 * fidelity + sci_smooth_loss(ins[s], illus[s])
    return total


@MODELS.register(name="sci", arch="sci", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def sci(stage: int = 3, **kwargs) -> Model:
    return Model(
        name="sci", arch="sci",
        module=SCIModule(stage=stage),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=sci_loss,
        required_inputs=("image",),
        size_divisor=1,
    )
