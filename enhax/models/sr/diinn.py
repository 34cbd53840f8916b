"""DIINN: dual interactive implicit neural network for arbitrary-scale SR.

Faithful rebuild of the reference's vendored DIINN
(mon_extra/vision/enhance/sr/diinn/src/models/components/diinn.py:7-188 +
rdn.py; sr_module.py defaults mode=1, init_q=False):

  * RDN encoder (config 'B': 16 RDBs x 8 dense conv-ReLU layers, growth
    64, local + global feature fusion).
  * implicit decoder: the feature field is 3x3-unfolded (x9 channels,
    zero pad) and nearest-exact-upsampled to the target size; the query
    stream is [relative coords x (H, W), area ratio]; K branch =
    1x1+ReLU over features, Q branch = 1x1+sin over the query, coupled
    multiplicatively q = K_i(k) * Q_i(q) per stage (mode 1); 1x1 head.
    No global input skip — the decoder predicts the RGB directly.

All decoder compute is 1x1 convs over the HR grid — batched matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize_nearest_exact_torch


def _unfold3(x):
    """F.unfold(x, 3, padding=1) channel layout: c*9 + (ky*3 + kx)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([xp[:, dy:dy + h, dx:dx + w, :]
                      for dy in range(3) for dx in range(3)], axis=-1)
    return taps.reshape(n, h, w, c * 9)


class RDN(nn.Module):
    """rdn.py:37-106 (no_upsampling)."""
    g0: int = 64
    num_blocks: int = 16   # D
    num_convs: int = 8     # C
    growth: int = 64       # G

    @nn.compact
    def __call__(self, x):
        f1 = nn.Conv(self.g0, (3, 3), name="sfe1")(x)
        y = nn.Conv(self.g0, (3, 3), name="sfe2")(f1)
        outs = []
        for i in range(self.num_blocks):
            z = y
            for j in range(self.num_convs):
                t = nn.relu(nn.Conv(self.growth, (3, 3),
                                    name=f"rdb{i}_c{j}")(z))
                z = jnp.concatenate([z, t], axis=-1)
            y = nn.Conv(self.g0, (1, 1), name=f"rdb{i}_lff")(z) + y
            outs.append(y)
        y = nn.Conv(self.g0, (1, 1), name="gff1")(
            jnp.concatenate(outs, axis=-1))
        y = nn.Conv(self.g0, (3, 3), name="gff2")(y)
        return y + f1


class DIINNModule(nn.Module):
    g0: int = 64
    num_blocks: int = 16
    num_convs: int = 8
    growth: int = 64
    hidden: int = 256
    depth: int = 4
    mode: int = 1
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        feat = RDN(self.g0, self.num_blocks, self.num_convs, self.growth,
                   name="encoder")(x)
        hr_h, hr_w = h * self.scale, w * self.scale

        # _make_pos_encoding (diinn.py:111-127)
        def centers(m):
            return -1 + 1 / m + (2 / m) * jnp.arange(m)

        gy, gx = jnp.meshgrid(centers(hr_h), centers(hr_w), indexing="ij")
        up_grid = jnp.stack([gy, gx], axis=-1)
        iy, ix = jnp.meshgrid(centers(h), centers(w), indexing="ij")
        in_grid = resize_nearest_exact_torch(
            jnp.stack([iy, ix], axis=-1), (hr_h, hr_w))
        rel = (up_grid - in_grid) * jnp.array([h, w])
        ratio = jnp.full((hr_h, hr_w, 1), (h * w) / (hr_h * hr_w))
        syn = jnp.broadcast_to(
            jnp.concatenate([rel, ratio], axis=-1)[None],
            (n, hr_h, hr_w, 3))

        k = resize_nearest_exact_torch(_unfold3(feat), (hr_h, hr_w))
        feats9 = k
        q = None
        for i in range(self.depth):
            ki = nn.relu(nn.Conv(self.hidden, (1, 1), name=f"K{i}")(k))
            src = syn if i == 0 else q
            qi = jnp.sin(nn.Conv(self.hidden, (1, 1), name=f"Q{i}")(src))
            q = ki * qi
            if self.mode == 1:
                k = ki
            elif self.mode == 2:
                k = jnp.concatenate([ki, feats9], axis=-1)
            else:  # modes 3/4 feed q back into K
                k = jnp.concatenate([q, feats9], axis=-1)
        if self.mode == 4:
            qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            out = nn.Conv(3, (3, 3), padding="VALID", name="last")(qp)
        else:
            out = nn.Conv(3, (1, 1), name="last")(q)
        return {"enhanced": out}


def _sr_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="diinn", arch="diinn",
                 tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,))
def diinn(g0: int = 64, num_blocks: int = 16, num_convs: int = 8,
          growth: int = 64, hidden: int = 256, mode: int = 1,
          scale: int = 4, **kwargs) -> Model:
    return Model(
        name="diinn", arch="diinn",
        module=DIINNModule(g0=g0, num_blocks=num_blocks,
                           num_convs=num_convs, growth=growth,
                           hidden=hidden, mode=mode, scale=scale),
        tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_sr_loss(),
        required_inputs=("image",),
        size_divisor=1,
        scale=scale,
    )
