"""LLFlow: low-light enhancement with normalizing flow (AAAI 2022).

Native rebuild of the reference's vendored LLFlow
(mon_extra/vision/enhance/llie/llflow/models/modules/{LLFlow_arch,
FlowUpsamplerNet, FlowStep, FlowAffineCouplingsAblation, FlowActNorms,
Permutations, flow, ConditionEncoder}.py; EXTRA_MODELS "llflow",
globals.py:943), at the released lol_v1 configuration
(model_config/lol_v1.yaml): scale=1, L=3 levels x K=12 conditional flow
steps (+2 unconditioned steps per level), coupling
CondAffineSeparatedAndCond, RRDB condition encoder (nb=24, stack blocks
[1,3,5,7] -> 320-ch conditionals), color-map latent.

Pipeline (inference = reverse flow, LLFlow_arch.py:212-235):
  input x -> lr6 = [log(clip(x+1e-3)), histeq(x)]         (LoL_dataset.py:100-107)
  ConEncoder1(lr6 + color_map + noise_map)                 (ConditionEncoder.py:66-160)
  z = squeeze2d(color_map, 8)                              (:222-227)
  x_hat = flow^-1(z | conditionals)                        (FlowUpsamplerNet.decode)

Training objective: NLL of the squeezed GT under N(squeeze(color_map), I)
plus the flow log-determinant (normal_flow, LLFlow_arch.py:117-160).

TPU notes: the flow is a static stack of 1x1 matmuls (invertible convs),
per-channel affines, and tiny conv nets — XLA fuses each step; squeeze ops
are pure reshapes mirroring torch channel order so released checkpoints
convert. Histogram equalization runs in-graph (256-bin scatter-add +
gather LUT).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model

# ---------------------------------------------------------------------------
# torch-order squeeze/unsqueeze (flow.py:115-146) in NHWC
# ---------------------------------------------------------------------------


def squeeze2d(x, factor: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (n, h/f, w/f, c, fh, fw)
    return x.reshape(n, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(x, factor: int = 2):
    n, h, w, c = x.shape
    f2 = factor * factor
    x = x.reshape(n, h, w, c // f2, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (n, h, fh, w, fw, c/f2)
    return x.reshape(n, h * factor, w * factor, c // f2)


def hist_equalize(x):
    """Per-image, per-channel cv2.equalizeHist on [0,1] floats (in-graph)."""
    u = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)
    n, h, w, c = x.shape
    total = h * w

    def one(channel):  # (h, w) int32
        hist = jnp.zeros((256,), jnp.float32).at[channel.reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf_min = jnp.min(jnp.where(cdf > 0, cdf, jnp.inf))
        denom = jnp.maximum(total - cdf_min, 1.0)
        lut = jnp.clip(jnp.round((cdf - cdf_min) / denom * 255.0), 0, 255)
        return lut[channel] / 255.0

    flat = u.transpose(0, 3, 1, 2).reshape(n * c, h, w)
    out = jax.vmap(one)(flat)
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1).astype(x.dtype)


def llflow_preprocess(x):
    """LoL_dataset.py:100-107 (log_low + concat_histeq): 3ch -> 6ch."""
    log_lr = jnp.log(jnp.clip(x + 1e-3, 1e-3, None))
    return jnp.concatenate([log_lr, hist_equalize(x)], axis=-1)


# ---------------------------------------------------------------------------
# condition encoder (ConditionEncoder.py ConEncoder1)
# ---------------------------------------------------------------------------

def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _resize_bilinear(x, h, w):
    # torch F.interpolate(bilinear, align_corners=False, no antialias)
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear",
                            antialias=False)


def _resize_nearest(x, h, w):
    iy = (jnp.arange(h) * (x.shape[1] / h)).astype(jnp.int32)
    ix = (jnp.arange(w) * (x.shape[2] / w)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


class RDB5C(nn.Module):
    """ResidualDenseBlock_5C (ConditionEncoder.py:13-32)."""
    nf: int = 64
    gc: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(f, (3, 3), dtype=self.dtype, name=name)  # noqa: E731
        x1 = _lrelu(conv(self.gc, "conv1")(x))
        x2 = _lrelu(conv(self.gc, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(self.gc, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(self.gc, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = RDB5C(self.nf, self.gc, dtype=self.dtype, name="rdb1")(x)
        y = RDB5C(self.nf, self.gc, dtype=self.dtype, name="rdb2")(y)
        y = RDB5C(self.nf, self.gc, dtype=self.dtype, name="rdb3")(y)
        return y * 0.2 + x


class ConEncoder(nn.Module):
    """ConEncoder1 at lol_v1 settings (concat_histeq, stack [1,3,5,7])."""
    nf: int = 64
    nb: int = 24
    gc: int = 32
    stack_blocks: Sequence[int] = (1, 3, 5, 7)
    dtype: Any = None

    @nn.compact
    def __call__(self, lr6):
        # color/noise maps from exp(log-low) (ConditionEncoder.py:96-106)
        raw = jnp.exp(lr6[..., 0:3])
        color_map_in = raw / (jnp.sum(raw, axis=-1, keepdims=True) + 1e-4)

        def grad_w(t):  # 0.5*(shift_left - shift_right), zeros at borders
            left = jnp.pad(t[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
            right = jnp.pad(t[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
            return 0.5 * (left - right)

        def grad_h(t):
            down = jnp.pad(t[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
            up = jnp.pad(t[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
            return 0.5 * (down - up)

        dx, dy = grad_w(color_map_in), grad_h(color_map_in)
        noise_map = jnp.maximum(jnp.abs(dx), jnp.abs(dy))

        fea = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv_first")(
            jnp.concatenate([lr6, color_map_in, noise_map], axis=-1))
        fea = _lrelu(fea)
        fea = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv_second")(fea)
        fea_head = nn.max_pool(fea, (2, 2), strides=(2, 2))

        stack = [b for b in self.stack_blocks if b < self.nb] or [self.nb - 1]
        blocks = {}
        y = fea_head
        for i in range(self.nb):
            y = RRDB(self.nf, self.gc, dtype=self.dtype, name=f"rrdb{i}")(y)
            if i in stack:
                blocks[i] = y
        trunk = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="trunk_conv")(y)
        fea_down2 = fea_head + trunk

        h2, w2 = fea_down2.shape[1], fea_down2.shape[2]
        fea_down4 = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="downconv1")(
            _resize_bilinear(fea_down2, h2 // 2, w2 // 2))
        fea_down8 = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="downconv2")(
            _resize_bilinear(_lrelu(fea_down4), h2 // 4, w2 // 4))

        color_map = jax.nn.sigmoid(nn.Conv(3, (1, 1), dtype=self.dtype,
                                           name="fine_tune_color_map")(
            _resize_nearest(fea_down2, h2 * 2, w2 * 2)))

        # stackRRDB concat: +4*64 low-level features on every conditional
        concat = jnp.concatenate([blocks[i] for i in stack], -1)

        def with_stack(t):
            return jnp.concatenate(
                [t, _resize_nearest(concat, t.shape[1], t.shape[2])], -1)

        return {
            "fea_up0": with_stack(fea_down8),
            "fea_up1": with_stack(fea_down4),
            "fea_up2": with_stack(fea_down2),
            "color_map": color_map,
        }


# ---------------------------------------------------------------------------
# flow primitives
# ---------------------------------------------------------------------------

class ActNorm(nn.Module):
    """FlowActNorms.py ActNorm2d (data-init happens torch-side; converted)."""
    features: int

    @nn.compact
    def __call__(self, x, logdet=None, reverse: bool = False):
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        logs = self.param("logs", nn.initializers.zeros, (self.features,))
        pixels = x.shape[1] * x.shape[2]
        if not reverse:
            x = (x + bias) * jnp.exp(logs)
            if logdet is not None:
                logdet = logdet + jnp.sum(logs) * pixels
        else:
            x = x * jnp.exp(-logs) - bias
            if logdet is not None:
                logdet = logdet - jnp.sum(logs) * pixels
        return x, logdet


class InvConv1x1(nn.Module):
    """Permutations.py InvertibleConv1x1."""
    features: int

    @nn.compact
    def __call__(self, x, logdet=None, reverse: bool = False):
        w = self.param("weight", nn.initializers.orthogonal(),
                       (self.features, self.features))
        pixels = x.shape[1] * x.shape[2]
        dlogdet = jnp.linalg.slogdet(w)[1] * pixels
        if not reverse:
            x = x @ w.T
            if logdet is not None:
                logdet = logdet + dlogdet
        else:
            x = x @ jnp.linalg.inv(w).T
            if logdet is not None:
                logdet = logdet - dlogdet
        return x, logdet


class AffineF(nn.Module):
    """Coupling net F (FlowAffineCouplingsAblation.py:147-156): glow Conv2d
    (actnorm-normalized, no bias) x2 + zero-init conv with exp(3*logs)."""
    hidden: int = 64
    out: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.hidden, (3, 3), use_bias=False, dtype=self.dtype,
                    name="c0")(x)
        y, _ = ActNorm(self.hidden, name="c0_an")(y)
        y = nn.relu(y)
        y = nn.Conv(self.hidden, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c1")(y)
        y, _ = ActNorm(self.hidden, name="c1_an")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out, (3, 3), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="czero")(y)
        logs = self.param("czero_logs", nn.initializers.zeros, (self.out,))
        return y * jnp.exp(logs * 3.0)


class CondAffine(nn.Module):
    """CondAffineSeparatedAndCond (FlowAffineCouplingsAblation.py:9-145)."""
    channels: int
    cond_channels: int = 320
    hidden: int = 64
    eps: float = 1e-4
    dtype: Any = None

    def setup(self):
        c = self.channels
        self.c_nn = c // 2
        self.c_co = c - c // 2
        self.f_affine = AffineF(self.hidden, self.c_co * 2, dtype=self.dtype)
        self.f_features = AffineF(self.hidden, c * 2, dtype=self.dtype)

    def _scale_shift(self, h):
        shift, scale = h[..., 0::2], h[..., 1::2]  # thops "cross" split
        scale = jax.nn.sigmoid(scale + 2.0) + self.eps
        return scale, shift

    def __call__(self, x, ft, logdet=None, reverse: bool = False):
        def ld(scale):
            return jnp.sum(jnp.log(scale), axis=(1, 2, 3))

        if not reverse:
            scale_ft, shift_ft = self._scale_shift(self.f_features(ft))
            x = (x + shift_ft) * scale_ft
            if logdet is not None:
                logdet = logdet + ld(scale_ft)
            z1, z2 = x[..., :self.c_nn], x[..., self.c_nn:]
            scale, shift = self._scale_shift(
                self.f_affine(jnp.concatenate([z1, ft], -1)))
            z2 = (z2 + shift) * scale
            if logdet is not None:
                logdet = logdet + ld(scale)
            x = jnp.concatenate([z1, z2], -1)
        else:
            z1, z2 = x[..., :self.c_nn], x[..., self.c_nn:]
            scale, shift = self._scale_shift(
                self.f_affine(jnp.concatenate([z1, ft], -1)))
            z2 = z2 / scale - shift
            x = jnp.concatenate([z1, z2], -1)
            scale_ft, shift_ft = self._scale_shift(self.f_features(ft))
            x = x / scale_ft - shift_ft
            if logdet is not None:
                logdet = logdet - ld(scale) - ld(scale_ft)
        return x, logdet


class FlowStep(nn.Module):
    """FlowStep.py: actnorm -> invconv -> (optional) conditional coupling."""
    channels: int
    conditional: bool = True
    cond_channels: int = 320
    dtype: Any = None

    def setup(self):
        self.actnorm = ActNorm(self.channels)
        self.invconv = InvConv1x1(self.channels)
        if self.conditional:
            self.affine = CondAffine(self.channels, self.cond_channels,
                                     dtype=self.dtype)

    def __call__(self, x, ft=None, logdet=None, reverse: bool = False):
        if not reverse:
            x, logdet = self.actnorm(x, logdet, reverse=False)
            x, logdet = self.invconv(x, logdet, reverse=False)
            if self.conditional:
                x, logdet = self.affine(x, ft, logdet, reverse=False)
        else:
            if self.conditional:
                x, logdet = self.affine(x, ft, logdet, reverse=True)
            x, logdet = self.invconv(x, logdet, reverse=True)
            x, logdet = self.actnorm(x, logdet, reverse=True)
        return x, logdet


class LLFlowModule(nn.Module):
    """Full LLFlow (lol_v1): encoder + 3-level flow, reverse by default."""
    nf: int = 64
    nb: int = 24
    gc: int = 32
    K: int = 12
    L: int = 3
    n_extra: int = 2           # additionalFlowNoAffine per level
    cond_channels: int = 320
    quant: float = 32.0
    dtype: Any = None

    def _plan(self):
        """Static layer plan mirroring FlowUpsamplerNet's torch layer indices:
        per level: squeeze, n_extra unconditioned steps, K conditional steps.
        Entries: ("squeeze", level, idx) | ("step", level, idx)."""
        plan = []
        idx = 0
        for level in range(1, self.L + 1):
            plan.append(("squeeze", level, idx))
            idx += 1
            for _ in range(self.n_extra + self.K):
                plan.append(("step", level, idx))
                idx += 1
        return plan

    def setup(self):
        self.rrdb = ConEncoder(self.nf, self.nb, self.gc, dtype=self.dtype)
        per_level_pos = {}
        modules = {}
        for kind, level, idx in self._plan():
            if kind != "step":
                continue
            pos = per_level_pos.get(level, 0)
            per_level_pos[level] = pos + 1
            modules[str(idx)] = FlowStep(
                3 * 4 ** level, conditional=(pos >= self.n_extra),
                cond_channels=self.cond_channels, dtype=self.dtype,
                name=f"step{idx}")
        self._steps = modules

    def _conditionals(self, enc):
        # scale=1 levelToName (FlowUpsamplerNet.py:60-67)
        return {1: enc["fea_up2"], 2: enc["fea_up1"], 3: enc["fea_up0"]}

    def __call__(self, image):
        """Inference: reverse flow from the color-map latent."""
        lr6 = llflow_preprocess(image) if image.shape[-1] == 3 else image
        enc = self.rrdb(lr6)
        cond = self._conditionals(enc)
        x = squeeze2d(enc["color_map"], 8)
        for kind, level, idx in reversed(self._plan()):
            if kind == "squeeze":
                x = unsqueeze2d(x, 2)
            else:
                x, _ = self._steps[str(idx)](x, ft=cond[level], reverse=True)
        return {"enhanced": jnp.clip(x, 0.0, 1.0),
                "color_map": enc["color_map"]}

    def nll(self, image, gt):
        """normal_flow (LLFlow_arch.py:117-160) without quant noise."""
        lr6 = llflow_preprocess(image) if image.shape[-1] == 3 else image
        enc = self.rrdb(lr6)
        cond = self._conditionals(enc)
        # thops.pixels is H*W ONLY (LLFlow_arch.py:125/160 via thops.py) —
        # normalizing by H*W*C would scale loss and gradients by 1/3
        pixels = gt.shape[1] * gt.shape[2]
        logdet = jnp.full((gt.shape[0],), -np.log(self.quant) * pixels)
        z = gt
        for kind, level, idx in self._plan():
            if kind == "squeeze":
                z = squeeze2d(z, 2)
            else:
                z, logdet = self._steps[str(idx)](z, ft=cond[level],
                                                  logdet=logdet, reverse=False)
        mean = squeeze2d(enc["color_map"], 8)
        log2pi = float(np.log(2 * np.pi))
        logp = jnp.sum(-0.5 * ((z - mean) ** 2 + log2pi), axis=(1, 2, 3))
        nll = -(logdet + logp) / (float(np.log(2.0)) * pixels)
        return jnp.mean(nll)


def _llflow_forward_loss(model, variables, datapoint, rngs):
    # NLL only: the reference's training step never runs the reverse
    # sampling pipeline (LLFlow trains on normal_flow alone); running
    # model.apply here would re-encode the 24-RRDB conditioner and the
    # full 3-level reverse flow per step just to fill metric outputs
    nll = model.module.apply(variables, datapoint["image"],
                             datapoint["ref_image"], method=LLFlowModule.nll)
    return nll, {"nll": nll}


@MODELS.register(name="llflow", arch="llflow", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def llflow(nf: int = 64, nb: int = 24, gc: int = 32, K: int = 12,
           **kwargs) -> Model:
    return Model(
        name="llflow", arch="llflow",
        module=LLFlowModule(nf=nf, nb=nb, gc=gc, K=K),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=lambda outputs, dp: 0.0,
        forward_loss_fn=_llflow_forward_loss,
        required_inputs=("image",),
        size_divisor=16,
    )


@MODELS.register(name="llflow_lol_v2_real", arch="llflow",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def llflow_lol_v2_real(**kwargs) -> Model:
    """LOL-v2-real released variant (model_config/lol_v2_real.yaml —
    same nf=64/nb=24 network; the config differs only in data/training
    hyper-params, train_gt_ratio 0.5)."""
    m = llflow(**kwargs)
    m.name = "llflow_lol_v2_real"
    return m


@MODELS.register(name="llflow_smallnet", arch="llflow",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def llflow_smallnet(**kwargs) -> Model:
    """LOL_smallNet released variant (model_config/lol_v1_smallnet.yaml:
    nf=32, nb=4, K=4)."""
    kwargs.setdefault("nf", 32)
    kwargs.setdefault("nb", 4)
    kwargs.setdefault("K", 4)
    m = llflow(**kwargs)
    m.name = "llflow_smallnet"
    return m
