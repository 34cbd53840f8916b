"""RUAS: Retinex-inspired Unrolling with Architecture Search (CVPR 2021).

Native rebuild of the reference's vendored RUAS
(mon_extra/vision/enhance/llie/ruas/model.py; EXTRA_MODELS "ruas",
globals.py:1031). The searched genotypes are fixed constants
(genotypes.py IEM/NRM), so the NAS machinery reduces to two static cell
layouts:

  * SearchBlock (model.py:24-66): information-distillation cell — three
    distill/remain op pairs + a tail op, concat(4*C) -> 1x1 fuse.
  * IEM (model.py:69-96): t_hat = 2x2 forward max (k=0) or
    max(u) - 0.5*(u - y); t = clamp(sigmoid(cell(t_hat)), 1e-3, 1);
    u = clamp(y / t, 0, 1) — 3 unrolled iterations, separate weights.
  * DenoiseNetwork (model.py:130-151): stem -> 3 NRM cells -> conv;
    output = u - noise.

Losses (model.py:246-299): enhance = 0.5*MSE(t_last, input) +
24-direction bilateral smooth (sigma=0.1, same kernel as SCI's);
denoise = 1e-7*MSE + TV.

TPU notes: all ops are small static convs; the unrolled loop is traced
once and fully fused by XLA. The 2x2 forward max is a reduce_window.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.sci import sci_smooth_loss

# searched genotypes (ruas/genotypes.py:15-16)
IEM_GENOTYPE = ("skip_connect", "resconv_1x1", "resdilconv_3x3", "conv_3x3",
                "conv_3x3", "skip_connect", "conv_3x3")
NRM_GENOTYPE = ("resconv_1x1", "resconv_1x1", "resdilconv_3x3", "skip_connect",
                "resconv_1x1", "resconv_1x1", "skip_connect")

# op name -> (kernel, dilation, residual); None = identity (operations.py:4-22)
_OP_SPECS = {
    "skip_connect": None,
    "conv_1x1": (1, 1, False),
    "conv_3x3": (3, 1, False),
    "conv_5x5": (5, 1, False),
    "conv_7x7": (7, 1, False),
    "dilconv_3x3": (3, 2, False),
    "dilconv_5x5": (5, 2, False),
    "dilconv_7x7": (7, 2, False),
    "resconv_1x1": (1, 1, True),
    "resconv_3x3": (3, 1, True),
    "resconv_5x5": (5, 1, True),
    "resconv_7x7": (7, 1, True),
    "resdilconv_3x3": (3, 2, True),
    "resdilconv_5x5": (5, 2, True),
    "resdilconv_7x7": (7, 2, True),
}


class _GenOp(nn.Module):
    """One genotype op: conv/dilconv/resconv/identity, torch-padded."""
    op_name: str
    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        spec = _OP_SPECS[self.op_name]
        if spec is None:
            return x
        k, dil, residual = spec
        pad = ((k - 1) // 2) * dil
        y = nn.Conv(self.channels, (k, k), kernel_dilation=(dil, dil),
                    padding=((pad, pad), (pad, pad)), dtype=self.dtype,
                    name="conv")(x)
        return y + x if residual else y


class SearchBlock(nn.Module):
    """Information-distillation cell (model.py:24-66)."""
    channels: int
    genotype: Sequence[str]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        g = self.genotype
        c = self.channels
        act = lambda t: nn.leaky_relu(t, negative_slope=0.05)  # noqa: E731
        d1 = act(_GenOp(g[0], c, dtype=self.dtype, name="c1_d")(x))
        r1 = act(_GenOp(g[1], c, dtype=self.dtype, name="c1_r")(x) + x)
        d2 = act(_GenOp(g[2], c, dtype=self.dtype, name="c2_d")(r1))
        r2 = act(_GenOp(g[3], c, dtype=self.dtype, name="c2_r")(r1) + r1)
        d3 = act(_GenOp(g[4], c, dtype=self.dtype, name="c3_d")(r2))
        r3 = act(_GenOp(g[5], c, dtype=self.dtype, name="c3_r")(r2) + r2)
        r4 = act(_GenOp(g[6], c, dtype=self.dtype, name="c4")(r3))
        out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="c5")(out)


def forward_max2x2(x):
    """model.py:77-82: 2x2 max over (i..i+1, j..j+1), zero-padded bottom/right."""
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    a = jnp.maximum(xp[:, :-1, :, :], xp[:, 1:, :, :])
    return jnp.maximum(a[:, :, :-1, :], a[:, :, 1:, :])


class IEM(nn.Module):
    """Illumination estimation module (model.py:69-96)."""
    channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, y, u, first: bool):
        t_hat = forward_max2x2(y) if first else \
            forward_max2x2(u) - 0.5 * (u - y)
        t = SearchBlock(self.channels, IEM_GENOTYPE, dtype=self.dtype,
                        name="cell")(t_hat)
        t = jnp.clip(jax.nn.sigmoid(t), 1e-3, 1.0)
        u = jnp.clip(y / t, 0.0, 1.0)
        return u, t


class RUASModule(nn.Module):
    iem_nums: int = 3
    nrm_nums: int = 3
    enhance_channels: int = 3
    denoise_channels: int = 6
    with_denoise: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        u = jnp.ones_like(x)
        us, ts = [], []
        for i in range(self.iem_nums):
            u, t = IEM(self.enhance_channels, dtype=self.dtype,
                       name=f"enhance_iem{i}")(x, u, i == 0)
            us.append(u)
            ts.append(t)
        out = us[-1]
        if self.with_denoise:
            feat = nn.Conv(self.denoise_channels, (3, 3), dtype=self.dtype,
                           name="denoise_stem")(out)
            for i in range(self.nrm_nums):
                feat = SearchBlock(self.denoise_channels, NRM_GENOTYPE,
                                   dtype=self.dtype,
                                   name=f"denoise_nrm{i}")(feat)
            noise = nn.Conv(3, (3, 3), dtype=self.dtype,
                            name="denoise_out_conv")(feat)
            out = us[-1] - noise
        return {"enhanced": out, "u_pre_denoise": us[-1],
                "illu": jnp.stack(ts)}


def ruas_loss(outputs, datapoint):
    """Enhance (model.py:275-299) + denoise (model.py:246-251) terms."""
    x = datapoint["image"]
    t_last = outputs["illu"][-1]
    fidelity = jnp.mean((t_last - x) ** 2)
    smooth = sci_smooth_loss(x, t_last, sigma=0.1)
    enhance = 0.5 * fidelity + smooth
    u_d, u_e = outputs["enhanced"], outputs["u_pre_denoise"]
    tv_h = jnp.sum((u_d[:, 1:, :, :] - u_d[:, :-1, :, :]) ** 2)
    tv_w = jnp.sum((u_d[:, :, 1:, :] - u_d[:, :, :-1, :]) ** 2)
    n = u_d.shape[0]
    cnt_h = u_d[:, 1:].size // n
    cnt_w = u_d[:, :, 1:].size // n
    tv = 2.0 * (tv_h / cnt_h + tv_w / cnt_w) / n
    denoise = 1e-7 * jnp.mean((u_d - u_e) ** 2) + tv
    return enhance + denoise


@MODELS.register(name="ruas", arch="ruas", tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def ruas(with_denoise: bool = True, **kwargs) -> Model:
    return Model(
        name="ruas", arch="ruas",
        module=RUASModule(with_denoise=with_denoise),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=ruas_loss,
        required_inputs=("image",),
        size_divisor=1,
    )
