"""Restormer: efficient transformer for high-resolution restoration.

Rebuild of the reference's vendored Restormer
(mon_extra/.../restormer/basicsr/models/archs/restormer_arch.py): MDTA
(multi-dconv-head transposed attention — attention over the *channel* dim,
linear in pixels) + GDFN (gated dconv FFN) blocks in a 4-level UNet with
pixel-(un)shuffle resampling. Supports the reference's progressive
patch-size training (restormer-deraining.yml:27-30) via the standard
Trainer by swapping crop sizes per epoch, and overlap-tiled inference via
the engine's tile mode (my_predict.py:157-167).

TPU notes: channel attention = (C x C) matmuls — MXU-friendly at any
resolution; all shapes static.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import (DWConv3x3, LayerNorm2d, conv1x1, pixel_shuffle,
                             pixel_unshuffle)


class MDTA(nn.Module):
    """Multi-dconv-head transposed attention: softmax over CxC gram."""
    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import os

        n, h, w, c = x.shape
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        qkv = conv1x1(c * 3, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = DWConv3x3(c * 3, use_bias=False, dtype=self.dtype,
                        name="qkv_dw")(qkv)
        hd = c // self.num_heads

        if os.environ.get("ENHAX_MDTA_LAYOUT", "native") == "folded":
            # original head-major layout: materializes (N, heads, hd, HW)
            # transposes of three HBM-scale tensors (kept for A/B probing)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):  # (N,H,W,C) -> (N, heads, hd, HW)
                t = t.reshape(n, h * w, self.num_heads, hd)
                return t.transpose(0, 2, 3, 1)

            q, k, v = heads(q), heads(k), heads(v)
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                                1e-6)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True),
                                1e-6)
            attn = jnp.einsum("nhcp,nhdp->nhcd", q, k,
                              preferred_element_type=jnp.float32) * temperature
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("nhcd,nhdp->nhcp", attn, v)
            out = out.transpose(0, 3, 1, 2).reshape(n, h, w, c)
        else:
            # transpose-free layout: stay in pixel-major (N, HW, heads, hd)
            # and contract the pixel axis directly — XLA folds the head
            # split into the einsum instead of materializing three
            # (N, heads, hd, HW) copies (94 MB each at L1 serving shapes;
            # run/probe_restormer_ops.py `attn_ab`)
            t = qkv.reshape(n, h * w, 3, self.num_heads, hd)
            q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                                1e-6)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=1, keepdims=True),
                                1e-6)
            attn = jnp.einsum("nphc,nphd->nhcd", q, k,
                              preferred_element_type=jnp.float32) * temperature
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("nhcd,nphd->nphc", attn, v).reshape(n, h, w, c)
        return conv1x1(c, use_bias=False, dtype=self.dtype,
                       name="project_out")(out)


class GDFN(nn.Module):
    """Gated dconv feed-forward network."""
    dim: int
    expansion: float = 2.66
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        y = conv1x1(hidden * 2, use_bias=False, dtype=self.dtype,
                    name="project_in")(x)
        y = DWConv3x3(hidden * 2, use_bias=False, dtype=self.dtype,
                      name="dwconv")(y)
        a, b = jnp.split(y, 2, axis=-1)
        # reference restormer_arch.py:96 F.gelu = exact erf gelu (torch's
        # default), NOT the tanh approximation jax.nn.gelu defaults to
        y = jax.nn.gelu(a, approximate=False) * b
        return conv1x1(self.dim, use_bias=False, dtype=self.dtype,
                       name="project_out")(y)


class RestormerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # reference default LayerNorm_type='WithBias' (restormer_arch.py:208):
        # mean-subtracting LN with scale+bias, eps=1e-5
        x = x + MDTA(self.dim, self.num_heads, dtype=self.dtype,
                     name="attn")(LayerNorm2d(eps=1e-5, name="norm1")(x))
        x = x + GDFN(self.dim, self.expansion, dtype=self.dtype,
                     name="ffn")(LayerNorm2d(eps=1e-5, name="norm2")(x))
        return x


class RestormerModule(nn.Module):
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        y = nn.Conv(d, (3, 3), use_bias=False, dtype=self.dtype, name="embed")(x)

        # encoder
        skips = []
        for lvl in range(3):
            for j in range(self.num_blocks[lvl]):
                y = RestormerBlock(d * 2**lvl, self.heads[lvl], self.expansion,
                                   name=f"enc{lvl}_{j}")(y)
            skips.append(y)
            y = nn.Conv(d * 2**lvl // 2, (3, 3), use_bias=False, dtype=self.dtype,
                        name=f"down{lvl}")(y)
            y = pixel_unshuffle(y, 2)  # halves HW, x4 channels -> net x2

        # latent
        for j in range(self.num_blocks[3]):
            y = RestormerBlock(d * 8, self.heads[3], self.expansion,
                               name=f"latent_{j}")(y)

        # decoder — reference restormer_arch.py:228-240: reduce_chan 1x1 convs
        # exist at levels 3 and 2 only; level 1 runs decoder blocks directly on
        # the 2d-wide concat ("NO 1x1 conv to reduce channels", :236)
        for lvl in reversed(range(3)):
            # reference Upsample: 3x3 conv n->2n then PixelShuffle(2) => n/2
            y = nn.Conv(d * 2**(lvl + 1) * 2, (3, 3), use_bias=False, dtype=self.dtype,
                        name=f"up{lvl}")(y)
            y = pixel_shuffle(y, 2)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            if lvl == 0:
                ch = d * 2  # concat width kept
            else:
                ch = d * 2**lvl
                y = conv1x1(ch, use_bias=False, dtype=self.dtype,
                            name=f"reduce{lvl}")(y)
            for j in range(self.num_blocks[lvl]):
                y = RestormerBlock(ch, self.heads[lvl], self.expansion,
                                   name=f"dec{lvl}_{j}")(y)

        for j in range(self.num_refinement):
            y = RestormerBlock(d * 2, self.heads[0], self.expansion,
                               name=f"refine_{j}")(y)
        out = nn.Conv(3, (3, 3), use_bias=False, dtype=self.dtype, name="output")(y)
        return {"enhanced": out + inp}


def _l1_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="restormer", arch="restormer",
                 tasks=(Task.DERAIN, Task.DENOISE, Task.DEBLUR, Task.DEHAZE),
                 schemes=(Scheme.SUPERVISED,))
def restormer(dim: int = 48, num_blocks=(4, 6, 6, 8), num_refinement: int = 4,
              heads=(1, 2, 4, 8), expansion: float = 2.66, **kwargs) -> Model:
    num_blocks = tuple(num_blocks)
    heads = tuple(heads)

    def fast_apply(variables, image):
        # fused Pallas MDTA+GDFN blocks (enhax/kernels/restormer_block.py):
        # 2.6x over the flax/XLA forward at 256^2 serving chunks on v5e —
        # picked by Model.apply for TPU inference, interpret-parity-tested
        from enhax.kernels.restormer_block import restormer_fast_apply
        return restormer_fast_apply(variables, image, dim=dim,
                                    num_blocks=num_blocks,
                                    num_refinement=num_refinement,
                                    heads=heads, expansion=expansion)

    return Model(
        name="restormer", arch="restormer",
        module=RestormerModule(dim=dim, num_blocks=num_blocks,
                               num_refinement=num_refinement, heads=heads,
                               expansion=expansion),
        tasks=(Task.DERAIN, Task.DENOISE, Task.DEBLUR, Task.DEHAZE),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_l1_loss(),
        required_inputs=("image",),
        size_divisor=8,
        fast_apply_fn=fast_apply,
    )
