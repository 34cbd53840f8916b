"""Wakeup-Darkness: semantic/depth-guided unsupervised LLIE.

Native rebuild of the reference's vendored Wakeup-Darkness
(mon_extra/vision/enhance/llie/wakeup_darkness/model.py:33-145,
fuse_block.py; EXTRA_MODELS "wakeup_darkness"):

  * ``EnhanceNetwork`` (model.py:33-77): 3-ch conv stem (Mish), a
    ``TransformerBlock_1`` cross-attention fusing SAM semantic masks and
    a depth map into the features (fuse_block.py:187-217 — conv1 is
    SHARED between sem and depth, and norm1 between all three inputs;
    the attention concatenates image and depth K/Q/V,
    fuse_block.py:92-145), then ``layers=2`` iterations of a SHARED
    conv+BN+Mish block followed by a SHARED sigmoid-gated residual block
    (model.py:55-58 appends the same module twice), sigmoid out-conv.
  * illumination i = clamp(fea + x, 1e-4, 1); output r = clamp(x/i, 0, 1)
    (model.py:73-76, 130-137; the color-correction module is identity in
    the released configuration).

``sem``/``depth`` come from precomputed SAM masks / depth maps
(train.py:173-174 low_semantic/low_depth dirs); when absent from the
datapoint they default to the input image, keeping the module usable on
bare image folders.

Loss (loss.py:4-14): 1.5*MSE(i, x) + the SCI 24-direction smooth loss
(identical formula; reuses enhax's parity-tested ``sci_smooth_loss``),
applied twice upstream (model.py:139-144 adds criterion(input, depth));
the second term is reproduced verbatim.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.sci import sci_smooth_loss


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class _ChannelLayerNorm(nn.Module):
    """Restormer WithBias LayerNorm over channels (fuse_block.py:36-52)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mu) / jnp.sqrt(var + 1e-5) * scale + bias


class _FuseAttention(nn.Module):
    """Depth-augmented transposed attention (fuse_block.py:92-145)."""
    dim: int
    num_heads: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y, depth):
        d, dim = self.dtype, self.dim
        c1 = lambda f, name: nn.Conv(f, (1, 1), use_bias=False, dtype=d,  # noqa: E731
                                     name=name)
        dw = lambda f, name: nn.Conv(f, (3, 3), feature_group_count=f,  # noqa: E731
                                     use_bias=False, dtype=d, name=name)
        kv = dw(dim * 2, "kv_dwconv")(c1(dim * 2, "kv")(x))
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Conv(dim, (3, 3), use_bias=False, dtype=d,
                    name="q_dwconv")(c1(dim, "q")(y))
        dkv = dw(dim * 2, "depth_kv_dwconv")(c1(dim * 2, "depth_kv")(depth))
        dk, dv = jnp.split(dkv, 2, axis=-1)
        dq = nn.Conv(dim, (3, 3), use_bias=False, dtype=d,
                     name="depth_q_dwconv")(c1(dim, "depth_q")(depth))
        k = jnp.concatenate([k, dk], axis=-1)
        v = jnp.concatenate([v, dv], axis=-1)
        q = jnp.concatenate([q, dq], axis=-1)

        b, h, w, c2 = q.shape
        heads = self.num_heads
        hc = c2 // heads
        # (B, heads, head_c, HW)
        resh = lambda t: jnp.moveaxis(  # noqa: E731
            t.reshape(b, h * w, heads, hc), 1, -1)
        q, k, v = resh(q), resh(k), resh(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        temp = self.param("temperature", nn.initializers.ones, (heads, 1, 1))
        attn = jax.nn.softmax(jnp.einsum("bhcn,bhdn->bhcd", q, k) * temp,
                              axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
        out = out.reshape(b, heads * hc, h * w)
        out = jnp.moveaxis(out, 1, -1).reshape(b, h, w, c2)
        return c1(dim, "project_out")(out)


class _FuseFFN(nn.Module):
    """GDFN (fuse_block.py:70-88), expansion factor 1."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        y = nn.Conv(self.dim * 2, (1, 1), use_bias=False, dtype=d,
                    name="project_in")(x)
        y = nn.Conv(self.dim * 2, (3, 3), feature_group_count=self.dim * 2,
                    use_bias=False, dtype=d, name="dwconv")(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = jax.nn.gelu(y1, approximate=False) * y2
        return nn.Conv(self.dim, (1, 1), use_bias=False, dtype=d,
                       name="project_out")(y)


class _TransformerBlock1(nn.Module):
    dim: int = 3
    num_heads: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, fea, sem, depth):
        d = self.dtype

        def nearest_to(t):
            if t.shape[-3:-1] != fea.shape[-3:-1]:
                t = jax.image.resize(
                    t, t.shape[:-3] + fea.shape[-3:-1] + t.shape[-1:],
                    method="nearest")
            return t

        sem, depth = nearest_to(sem), nearest_to(depth)
        conv1 = nn.Conv(self.dim, (1, 1), dtype=d, name="conv1")
        norm1 = _ChannelLayerNorm(dtype=d, name="norm1")
        s = norm1(conv1(sem))        # conv1/norm1 shared with depth
        dep = norm1(conv1(depth))
        r = norm1(nn.Conv(self.dim, (1, 1), dtype=d, name="conv2")(fea))
        r = r + _FuseAttention(self.dim, self.num_heads, dtype=d,
                               name="attn")(r, s, dep)
        r = r + _FuseFFN(self.dim, dtype=d, name="ffn")(
            _ChannelLayerNorm(dtype=d, name="norm2")(r))
        return nn.Conv(self.dim, (1, 1), dtype=d, name="conv3")(r)


class WakeupDarknessModule(nn.Module):
    channels: int = 3
    layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, sem=None, depth=None, train: bool = False):
        d, c = self.dtype, self.channels
        to3 = lambda t: jnp.repeat(t, 3, axis=-1) \
            if t.shape[-1] == 1 else t  # noqa: E731
        sem = x if sem is None else to3(sem)
        depth = x if depth is None else to3(depth)
        fea = _mish(nn.Conv(c, (3, 3), dtype=d, name="in_conv")(x))
        fea = fea + _TransformerBlock1(c, dtype=d, name="fusion")(
            fea, sem, depth)
        # SHARED conv block and gated block across iterations
        conv = nn.Conv(c, (3, 3), dtype=d, name="conv")
        conv_bn = nn.BatchNorm(use_running_average=not train, dtype=d,
                               name="conv_bn")
        block_conv1 = nn.Conv(c, (3, 3), dtype=d, name="block_conv1")
        block_bn1 = nn.BatchNorm(use_running_average=not train, dtype=d,
                                 name="block_bn1")
        block_conv2 = nn.Conv(c, (3, 3), dtype=d, name="block_conv2")
        block_bn2 = nn.BatchNorm(use_running_average=not train, dtype=d,
                                 name="block_bn2")
        gate = nn.Conv(c, (1, 1), dtype=d, name="block_gate")
        for _ in range(self.layers):
            fea = fea + _mish(conv_bn(conv(fea)))
            y = _mish(block_bn1(block_conv1(fea)))
            y = block_bn2(block_conv2(y))
            g = nn.sigmoid(gate(y))
            fea = g * y + (1 - g) * fea
        fea = nn.sigmoid(nn.Conv(3, (3, 3), dtype=d, name="out_conv")(fea))
        illu = jnp.clip(fea + x, 1e-4, 1.0)
        r = jnp.clip(x / illu, 0.0, 1.0)
        return {"enhanced": r, "illumination": illu}


def wakeup_darkness_loss():
    """loss.py:4-14 applied as model.py:139-144 (illu + depth terms)."""
    def fn(outputs, datapoint):
        x = datapoint["image"]
        illu = outputs["illumination"]
        dep = datapoint.get("depth", x)
        if dep.shape[-1] == 1:
            dep = jnp.repeat(dep, 3, axis=-1)
        term = lambda t: (1.5 * jnp.mean((t - x) ** 2)  # noqa: E731
                          + sci_smooth_loss(x, t))
        return term(illu) + term(dep)
    return fn


@MODELS.register(name="wakeup_darkness", arch="wakeup_darkness",
                 tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def wakeup_darkness(**kwargs) -> Model:
    return Model(
        name="wakeup_darkness", arch="wakeup_darkness",
        module=WakeupDarknessModule(),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=wakeup_darkness_loss(),
        required_inputs=("image",),
        optional_inputs=("sem", "depth"),
        size_divisor=1,
    )
