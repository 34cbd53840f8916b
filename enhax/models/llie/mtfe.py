"""MTFE: Multiple Transfer Function Estimation with adaptive fusion.

Native rebuild of the reference's vendored MTFE
(mon_extra/vision/enhance/llie/mtfe/model.py; EXTRA_MODELS "mtfe"):

  * backbone (model.py:202-265): the input is resized to 256 (nearest),
    run through a conv stem + 7 grouped-separable ``SFC`` modules
    (6->768 ch, stride-2 pyramids, model.py:75-110), global-avg-pooled
    to a 768-vector.
  * histogram branch (model.py:113-168): 4 grouped 1-D ``HSFC`` modules
    over the per-channel 256-bin intensity histogram.
  * fusion (model.py:267-285): the two 768-vectors are stacked as a
    2-channel map, fused by 1x1 convs + FC + sigmoid gate: y = y*g + y.
  * three FC chains (3x Linear 768->768, no activations, model.py:287-295)
    produce three 3x256 sigmoid LUTs ("transfer functions"), applied to
    the FULL-resolution image by integer gather (intensityTransform,
    model.py:8-49).
  * a 16-ch bilinear UNet (unet_model.py; align_corners=True upsample)
    over cat(x, xy1, xy2, xy3) predicts sigmoid weight maps, normalized
    SEQUENTIALLY (model.py:323-326 reuses the updated w1 in w2/w3's
    denominator — reproduced verbatim).

The per-channel histogram is computed in-graph from the [0,1] input
(my_predict.py:32-44 computes it host-side from the uint8 file).

Loss (my_train.py:99-186, epoch-0 weights): 0.5*MSE(img, gt)
+ 0.2*entropy(w) + TV(w, 1e-4) + 0.3*(1 - |cos(gt, img)|).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize_align_corners


def image_histogram(x):
    """Per-channel normalized 256-bin histogram; x (B, H, W, C) in [0,1].

    Matches my_predict.py:32-44 (np.histogram over the uint8 image).
    """
    idx = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)
    b, c = x.shape[0], x.shape[-1]
    flat = idx.reshape(b, -1, c)
    n = flat.shape[1]

    def one(ch_vals):  # (N,) -> (256,)
        return jnp.zeros((256,), x.dtype).at[ch_vals].add(1.0) / n

    return jax.vmap(jax.vmap(one, in_axes=1), in_axes=0)(flat)  # (B, C, 256)


def apply_lut(x, tf):
    """intensityTransform (model.py:20-49): x (B,H,W,3), tf (B,3,256)."""
    idx = jnp.clip(jnp.round(255.0 * x), 0, 255).astype(jnp.int32)
    outs = []
    for c in range(3):
        flat = idx[..., c].reshape(idx.shape[0], -1)
        v = jnp.take_along_axis(tf[:, c, :], flat, axis=1)
        outs.append(v.reshape(x.shape[:-1]))
    return jnp.stack(outs, axis=-1)


class _SFC(nn.Module):
    """Grouped separable conv module (model.py:75-110)."""
    in_ch: int
    out_ch: int
    expansion: int = 4
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.in_ch * self.expansion
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       dtype=self.dtype, name=name)
        y = nn.Conv(exp, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=self.in_ch,
                    dtype=self.dtype, name="se_conv")(x)
        y = nn.relu(bn("se_bn")(y))
        y = nn.Conv(exp, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.in_ch, dtype=self.dtype,
                    name="hd_conv")(y)
        y = nn.relu(bn("hd_bn")(y))
        y = nn.Conv(self.out_ch, (1, 1), feature_group_count=self.in_ch,
                    dtype=self.dtype, name="cp_conv")(y)
        y = bn("cp_bn")(y)
        y = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="pw_conv")(y)
        return nn.relu(bn("pw_bn")(y))


class _HSFC(nn.Module):
    """Grouped 1-D module over histograms (model.py:113-145); x (B,L,C)."""
    in_ch: int = 3
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.in_ch * self.expansion
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       dtype=self.dtype, name=name)
        y = nn.Conv(exp, (3,), padding=((1, 1),),
                    feature_group_count=self.in_ch, dtype=self.dtype,
                    name="se_conv")(x)
        y = nn.relu(bn("se_bn")(y))
        y = nn.Conv(exp, (3,), padding=((1, 1),),
                    feature_group_count=self.in_ch, dtype=self.dtype,
                    name="hd_conv")(y)
        y = nn.relu(bn("hd_bn")(y))
        y = nn.Conv(self.in_ch, (1,), feature_group_count=self.in_ch,
                    dtype=self.dtype, name="cp_conv")(y)
        y = bn("cp_bn")(y)
        y = nn.Conv(self.in_ch, (1,), dtype=self.dtype, name="pw_conv")(y)
        return nn.relu(bn("pw_bn")(y))


class _DoubleConv(nn.Module):
    out_ch: int
    mid_ch: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_ch or self.out_ch
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       dtype=self.dtype, name=name)
        x = nn.Conv(mid, (3, 3), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(x)
        return nn.relu(bn("bn2")(x))


class _WMUNet(nn.Module):
    """16-ch bilinear UNet weight-map generator (unet_model.py)."""
    out_ch: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731
        x1 = _DoubleConv(16, dtype=d, name="inc")(x, train)
        x2 = _DoubleConv(32, dtype=d, name="down1")(pool(x1), train)
        x3 = _DoubleConv(64, dtype=d, name="down2")(pool(x2), train)
        x4 = _DoubleConv(128, dtype=d, name="down3")(pool(x3), train)
        x5 = _DoubleConv(128, dtype=d, name="down4")(pool(x4), train)

        def up(a, b, out, mid, name):
            a = resize_align_corners(a, (b.shape[-3], b.shape[-2]))
            return _DoubleConv(out, mid, dtype=d, name=name)(
                jnp.concatenate([b, a], axis=-1), train)

        y = up(x5, x4, 64, 128, "up1")
        y = up(y, x3, 32, 64, "up2")
        y = up(y, x2, 16, 32, "up3")
        y = up(y, x1, 16, None, "up4")
        return nn.Conv(self.out_ch, (1, 1), dtype=d, name="outc")(y)


class MTFEModule(nn.Module):
    base: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        c = self.base
        hist = image_histogram(x)  # (B, 3, 256)
        # backbone on nearest-resized 256x256 (model.py:251)
        x256 = jax.image.resize(
            x, x.shape[:-3] + (256, 256) + x.shape[-1:], method="nearest")
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       dtype=d, name=name)
        y = nn.Conv(c, (3, 3), dtype=d, name="stage1")(x256)
        y = nn.relu(bn("stage1_bn")(y))
        for i in range(2, 9):
            stride = 1 if i == 2 else 2
            y = _SFC(c, 2 * c, stride=stride, dtype=d,
                     name=f"stage{i}")(y, train)
            c *= 2
        y = jnp.mean(y, axis=(-3, -2))  # (B, 768)

        h = jnp.moveaxis(hist, 1, -1)  # (B, 256, 3)
        for i in range(1, 5):
            h = _HSFC(3, dtype=d, name=f"hist_stage{i}")(h, train)
        h = jnp.moveaxis(h, -1, 1).reshape(h.shape[0], -1)  # (B, 768)

        # fusion gate (model.py:267-285): stack as (B, 768, 1, 2) "NHWC"
        ya = jnp.stack([y, h], axis=-1)[:, :, None, :]
        ya = nn.relu(bn("fusion_bn1")(
            nn.Conv(2, (1, 1), dtype=d, name="fusion_cv1")(ya)))
        ya = nn.relu(bn("fusion_bn2")(
            nn.Conv(1, (1, 1), dtype=d, name="fusion_cv2")(ya)))
        ya = ya[:, :, 0, 0]
        ya = nn.Dense(768, dtype=d, name="fusion_FC")(ya)
        ya = nn.sigmoid(bn("fusion_bn")(ya))
        y = nn.relu(y * ya + y)

        tfs = []
        for i in (1, 2, 3):
            t = y
            for j in (1, 2, 3):
                t = nn.Dense(768, dtype=d, name=f"FC{i}{j}")(t)
            tfs.append(nn.sigmoid(t.reshape(t.shape[0], 3, 256)))
        xy1, xy2, xy3 = (apply_lut(x, t) for t in tfs)

        w = nn.sigmoid(_WMUNet(3, dtype=d, name="WM_gen")(
            jnp.concatenate([x, xy1, xy2, xy3], axis=-1), train))
        w1, w2, w3 = w[..., 0:1], w[..., 1:2], w[..., 2:3]
        # verbatim sequential normalization (model.py:323-326)
        w1 = w1 / (w1 + w2 + w3)
        w2 = w2 / (w1 + w2 + w3)
        w3 = w3 / (w1 + w2 + w3)
        xy = w1 * xy1 + w2 * xy2 + w3 * xy3
        return {"enhanced": xy, "tfs": tuple(tfs), "weights": (w1, w2, w3),
                "candidates": (xy1, xy2, xy3)}


def mtfe_loss(c_weight: float = 0.5, e_weight: float = 0.2,
              cs_weight: float = 0.3, tv_weight: float = 1e-4):
    """my_train.py:99-186 epoch-0 weights; myloss.py entropy/TV terms."""
    def fn(outputs, datapoint):
        target = datapoint.get("ref_image", datapoint["image"])
        img = outputs["enhanced"]
        w1, w2, w3 = outputs["weights"]
        loss_img = jnp.mean((img - target) ** 2)
        ent = 0.0
        for w in (w1, w2, w3):
            ent = ent + (-w * jnp.log2(jnp.maximum(w, 1e-12)))
        loss_ent = jnp.mean(ent)
        wc = jnp.concatenate([w1, w2, w3], axis=-1)
        h = wc.shape[-3]
        ww = wc.shape[-2]
        count_h = (h - 1) * ww
        count_w = h * (ww - 1)
        h_tv = jnp.sum((wc[..., 1:, :, :] - wc[..., :-1, :, :]) ** 2) / count_h
        w_tv = jnp.sum((wc[..., :, 1:, :] - wc[..., :, :-1, :]) ** 2) / count_w
        loss_tv = tv_weight * (h_tv + w_tv) / wc.shape[0]
        # cosine similarity along channels (torch CosineSimilarity dim=1)
        num = jnp.sum(img * target, axis=-1)
        den = (jnp.linalg.norm(img, axis=-1)
               * jnp.linalg.norm(target, axis=-1) + 1e-8)
        loss_cos = jnp.mean(1.0 - jnp.abs(num / den))
        return (c_weight * loss_img + e_weight * loss_ent + loss_tv
                + cs_weight * loss_cos)
    return fn


@MODELS.register(name="mtfe", arch="mtfe", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def mtfe(**kwargs) -> Model:
    return Model(
        name="mtfe", arch="mtfe",
        module=MTFEModule(),
        tasks=(Task.LLIE,),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=mtfe_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
