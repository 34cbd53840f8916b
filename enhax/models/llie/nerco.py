"""NeRCo: implicit Neural Representation for Cooperative LLIE (ICCV 2023).

Native rebuild of the reference's vendored NeRCo inference path
(mon_extra/vision/enhance/llie/nerco/models/NeRCo_model.py:91-98,
networks.py, mlp.py; EXTRA_MODELS "nerco"; released config
nerco_lol_v1.yaml: ngf=64, netG=netH=resnet_9blocks, instance norm,
dropout enabled — identity at eval):

  fake_B = netG_A( cat(x, netPre(x)) * mask ),  (H, mask) = netH(x)

  * ``netPre`` (networks.py:271-314): a ResNet encoder-decoder whose
    features feed the NRN implicit decoder (mlp.py:43-152). NOTE: the
    vendored NRN's grid-sample lines are commented out, so its LIIF
    local ensemble degenerates — q_feat is the full grid, rel_coord is
    exactly 0, rel_cell is exactly 2.0, and all four ensemble branches
    are identical. The faithful computation is therefore
    ``MLP(cat[unfold3x3(feat), zeros(2+4L), full(2.0, 2)])`` with
    channel-major unfold ordering — implemented directly.
  * ``netH`` (ResnetExtractor, networks.py:317-399): reflect-padded
    conv7 stem + 3 ResNet blocks + trailing ReflectionPad(3); a CBAM-ish
    channel attention (on the PADDED map) feeds a VALID 7x7 spatial-
    attention conv, which lands the sigmoid mask back at input size; a
    parallel VALID conv7+tanh head produces H.
  * ``netG_A`` (ResnetGenerator, networks.py:224-269): the CycleGAN
    9-block generator over the 6-channel masked input, tanh output.

Output = clip(fake_B, 0, 1) (the adapter feeds [0,1] images and saves
raw, my_predict.py:105-121). Adversarial/CLIP training (CycleGAN
discriminators + CLIP text prompts) requires pretrained CLIP weights
and is out of scope -> loss_fn=None (same stance as enlightengan).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import InstanceNorm2d

_L = 8  # positional-encoding bands (mlp.py:8)


def _refpad(x, p):
    return jnp.pad(x, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")


class _ResnetBlock(nn.Module):
    """CycleGAN ResnetBlock, reflect padding (networks.py:500-540);
    dropout is identity at eval and omitted."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inorm = lambda: InstanceNorm2d(affine=False, dtype=self.dtype)  # noqa: E731
        y = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv1")(_refpad(x, 1))
        y = nn.relu(inorm()(y))
        y = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype,
                    name="conv2")(_refpad(y, 1))
        return x + inorm()(y)


class _ResnetBody(nn.Module):
    """Shared encoder/decoder trunk of ResnetGenerator/PreProcess
    (networks.py:233-261): conv7 stem, 2 stride-2 downs, n blocks,
    2 transposed-conv ups."""
    ngf: int
    n_blocks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        inorm = lambda: InstanceNorm2d(affine=False, dtype=d)  # noqa: E731
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=d,
                    name="conv_in")(_refpad(x, 3))
        y = nn.relu(inorm()(y))
        for i in range(2):
            y = nn.Conv(self.ngf * 2 ** (i + 1), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=d,
                        name=f"down{i}")(y)
            y = nn.relu(inorm()(y))
        for i in range(self.n_blocks):
            y = _ResnetBlock(self.ngf * 4, dtype=d, name=f"block{i}")(y)
        for i in range(2):
            # torch ConvTranspose2d(3, s2, p1, output_padding=1)
            y = nn.ConvTranspose(self.ngf * 2 ** (1 - i), (3, 3),
                                 strides=(2, 2), padding=((1, 2), (1, 2)),
                                 transpose_kernel=True, dtype=d,
                                 name=f"up{i}")(y)
            y = nn.relu(inorm()(y))
        return y


class _ResnetGenerator(nn.Module):
    """networks.py:224-269 (tanh head)."""
    ngf: int = 64
    n_blocks: int = 9
    out_ch: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _ResnetBody(self.ngf, self.n_blocks, dtype=self.dtype,
                        name="body")(x)
        y = nn.Conv(self.out_ch, (7, 7), padding="VALID", dtype=self.dtype,
                    name="conv_out")(_refpad(y, 3))
        return jnp.tanh(y)


class _NRN(nn.Module):
    """Degenerate-LIIF implicit decoder (mlp.py:43-152, see module doc)."""
    hidden: tuple = (256, 256, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, feat):
        b, h, w, c = feat.shape
        p = jnp.pad(feat, [(0, 0), (1, 1), (1, 1), (0, 0)])
        # channel-major 3x3 unfold: last axis = [c][ky*3+kx] (torch F.unfold)
        patches = jnp.stack(
            [p[:, dy:dy + h, dx:dx + w, :] for dy in range(3)
             for dx in range(3)], axis=-1)  # (B,H,W,C,9)
        y = patches.reshape(b, h, w, c * 9)
        extras = jnp.concatenate(
            [jnp.zeros((b, h, w, 2 + 4 * _L), y.dtype),
             jnp.full((b, h, w, 2), 2.0, y.dtype)], axis=-1)
        y = jnp.concatenate([y, extras], axis=-1)
        for i, f in enumerate(self.hidden):
            y = nn.relu(nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(y))
        return nn.Dense(3, dtype=self.dtype,
                        name=f"fc{len(self.hidden)}")(y)


class _PreProcess(nn.Module):
    """networks.py:271-314: trunk + NRN head."""
    ngf: int = 64
    n_blocks: int = 9
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _ResnetBody(self.ngf, self.n_blocks, dtype=self.dtype,
                        name="body")(x)
        return _NRN(dtype=self.dtype, name="mlp")(y)


class _ResnetExtractor(nn.Module):
    """networks.py:317-399: H map + spatial-attention mask."""
    ngf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        inorm = lambda: InstanceNorm2d(affine=False, dtype=d)  # noqa: E731
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=d,
                    name="conv_in")(_refpad(x, 3))
        y = nn.relu(inorm()(y))
        for i in range(3):  # always 3 blocks (networks.py:343)
            y = _ResnetBlock(self.ngf, dtype=d, name=f"block{i}")(y)
        h_pad = _refpad(y, 3)  # trailing ReflectionPad2d(3)
        # channel attention on the padded map (networks.py:390-396)
        gap = jnp.mean(h_pad, axis=(-3, -2), keepdims=True)
        gmp = jnp.max(h_pad, axis=(-3, -2), keepdims=True)
        ca = jnp.concatenate([gap, gmp], axis=-1)
        ca = nn.Conv(max(self.ngf // 16, 1), (1, 1), use_bias=False,
                     dtype=d, name="fc1")(ca)
        ca = nn.Conv(self.ngf * 2, (1, 1), use_bias=False, dtype=d,
                     name="fc2")(nn.relu(ca))
        ca = nn.Conv(self.ngf, (1, 1), use_bias=False, dtype=d,
                     name="conv_ca")(ca)
        out = ca * h_pad
        # spatial attention: VALID 7x7 lands back at input size
        avg_o = jnp.mean(out, axis=-1, keepdims=True)
        max_o = jnp.max(out, axis=-1, keepdims=True)
        sa = jnp.concatenate([avg_o, max_o], axis=-1)
        mask = nn.sigmoid(nn.Conv(1, (7, 7), padding="VALID",
                                  use_bias=False, dtype=d,
                                  name="conv1")(sa))
        h = jnp.tanh(nn.Conv(3, (7, 7), padding="VALID", dtype=d,
                             name="output")(h_pad))
        return h, mask


class NeRCoModule(nn.Module):
    ngf: int = 64
    n_blocks: int = 9
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        pre = _PreProcess(self.ngf, self.n_blocks, dtype=d,
                          name="netPre")(x)
        h, mask = _ResnetExtractor(self.ngf, dtype=d, name="netH")(x)
        fake_b = _ResnetGenerator(self.ngf, self.n_blocks, dtype=d,
                                  name="netG_A")(
            jnp.concatenate([x, pre], axis=-1) * mask)
        return {"enhanced": jnp.clip(fake_b, 0.0, 1.0), "mask": mask,
                "residual": h}


@MODELS.register(name="nerco", arch="nerco", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED,))
def nerco(ngf: int = 64, n_blocks: int = 9, **kwargs) -> Model:
    return Model(
        name="nerco", arch="nerco",
        module=NeRCoModule(ngf=ngf, n_blocks=n_blocks),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED,),
        loss_fn=None,  # CycleGAN+CLIP training out of scope (see moduledoc)
        required_inputs=("image",),
        size_divisor=4,
    )
