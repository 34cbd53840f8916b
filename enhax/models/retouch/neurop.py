"""NeurOP: neural color operators for image retouching.

Faithful rebuild of reference ``vision/enhance/retouch/neurop/neurop.py``:

  * ``Operator`` (:64-80): 1x1 encoder -> code + scalar strength ->
    1x1 mid conv + LeakyReLU(0.01) -> 1x1 decoder. No clamp inside.
  * ``Encoder`` (:114-135): zero-pad 1 then conv7/s2 and conv3/s2 (both
    pad 0 after the explicit pad), ReLU; global features are
    ``[std, mean, max]`` over HW (std unbiased, ddof=1) -> 3*encode_nf.
  * ``NeurOP_RE`` (:265-380): operators applied sequentially in
    bc -> ex -> vb order; each step resizes the CURRENT image to height
    256 (aspect kept, bilinear align_corners=False), encodes, predicts a
    tanh scalar, applies the operator. Single clamp at the end.
  * ``NeurOPInit`` (:153-262): operator pretraining — each operator
    reconstructs its unary input (strength 0) and maps to the reference
    at the datapoint strength; L1 over the six pairs.

Loss for ``neurop_re`` (:38-57): L1 + (1/pixel_weight) * (cosine
similarity + total variation).
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
        code = nn.leaky_relu(
            nn.Conv(self.base_nf, (1, 1), name="mid_conv")(code), 0.01)
        return nn.Conv(3, (1, 1), name="decoder")(code)


class StrengthEncoder(nn.Module):
    """Global [std, mean, max] of strided conv features (neurop.py:114-135);
    ZeroPad2d(1) + pad-0 convs -> explicit padding 1 here."""
    encode_nf: int = 32

    @nn.compact
    def __call__(self, x):
        pad = ((1, 1), (1, 1))
        y = nn.relu(nn.Conv(self.encode_nf, (7, 7), strides=(2, 2),
                            padding=pad, name="conv1")(x))
        y = nn.relu(nn.Conv(self.encode_nf, (3, 3), strides=(2, 2),
                            padding=pad, name="conv2")(y))
        std = jnp.std(y, axis=(-3, -2), ddof=1)
        mean = jnp.mean(y, axis=(-3, -2))
        mx = jnp.max(y, axis=(-3, -2))
        return jnp.concatenate([std, mean, mx], axis=-1)


class NeurOPModule(nn.Module):
    base_nf: int = 64
    encode_nf: int = 32

    @nn.compact
    def __call__(self, x):
        ops = {k: Operator(self.base_nf, name=f"{k}_block")
               for k in ("ex", "bc", "vb")}
        enc = StrengthEncoder(self.encode_nf, name="encoder")
        b, h, w, c = x.shape
        rh, rw = 256, int(256 * w / h)
        y = x
        strengths = {}
        for k in ("bc", "ex", "vb"):  # renderer order (neurop.py:340/370)
            resized = jax.image.resize(y, (b, rh, rw, c), "bilinear",
                                       antialias=False)
            fea = enc(resized)
            val = jnp.tanh(nn.Dense(1, name=f"predict_{k}")(fea))
            strengths[k] = val
            y = ops[k](y, val[:, None, None, :])
        y = jnp.clip(y, 0, 1)
        return {"enhanced": y,
                **{f"val_{k}": v for k, v in strengths.items()}}


class NeurOPInitModule(nn.Module):
    """Renderer pretraining forward (neurop.py:83-111, 228-250)."""
    base_nf: int = 64

    @nn.compact
    def __call__(self, x_ex, x_bc, x_vb, v_ex, v_bc, v_vb):
        out = {}
        for k, x, v in (("ex", x_ex, v_ex), ("bc", x_bc, v_bc),
                        ("vb", x_vb, v_vb)):
            op = Operator(self.base_nf, name=f"{k}_block")
            v = jnp.asarray(v).reshape(-1, 1, 1, 1)
            out[f"rec_image_{k}"] = op(x, 0.0)
            out[f"map_ref_{k}"] = op(x, v)
        return out


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
    l1 = LOSSES.build("l1_loss")

    def loss_fn(outputs, dp):
        loss = 0.0
        for k in ("ex", "bc", "vb"):
            loss = loss + l1(outputs[f"rec_image_{k}"], dp[f"image_{k}"])
            loss = loss + l1(outputs[f"map_ref_{k}"], dp[f"ref_{k}"])
        return loss

    return Model(
        name="neurop_init", arch="neurop",
        module=NeurOPInitModule(base_nf=base_nf),
        tasks=(Task.RETOUCH,), schemes=(Scheme.SUPERVISED,),
        loss_fn=loss_fn,
        required_inputs=("image_ex", "image_bc", "image_vb",
                         "val_ex", "val_bc", "val_vb"),
    )
