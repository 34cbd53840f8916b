"""VGG family + the feature extractor used by perceptual losses.

Rebuild of reference ``vision/classify/vgg/`` (torchvision layout) and the
VGG backbone consumed by PerceptualLoss (nn/loss/image.py:708). Conv indices
match torchvision's ``features`` numbering so layer specs like "26" (relu4_4
for vgg19) translate directly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import adaptive_avg_pool, make_classifier

_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGGFeatures(nn.Module):
    """The conv trunk; ``capture`` lists torchvision feature indices whose
    *outputs* (post-ReLU) are returned as intermediate features."""
    cfg: Sequence
    use_bn: bool = False
    capture: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        idx = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                if idx in self.capture:
                    feats.append(x)
                idx += 1
            else:
                x = nn.Conv(v, (3, 3), name=f"conv{idx}")(x)
                idx += 1
                if self.use_bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     name=f"bn{idx}")(x)
                    idx += 1
                x = nn.relu(x)
                if idx in self.capture:
                    feats.append(x)
                idx += 1
        return x, feats


class VGG(nn.Module):
    cfg: Sequence
    use_bn: bool = False
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        x, _ = VGGFeatures(self.cfg, self.use_bn, name="features")(x, train=train)
        # torchvision: AdaptiveAvgPool2d(7) then flatten -> Linear(25088, 4096)
        x = adaptive_avg_pool(x, 7)
        b = x.shape[0]
        # flatten in torch CHW order so converted fc1 weights line up
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        return {"logits": nn.Dense(self.num_classes, name="fc3")(x)}


for _name, _cfg in _CFGS.items():
    def _builder(num_classes: int = 1000, cfg=_cfg, nm=_name, **kwargs):
        return make_classifier(nm, "vgg", VGG(cfg=cfg, num_classes=num_classes))
    MODELS.register(name=_name, obj=_builder, arch="vgg",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))

    def _builder_bn(num_classes: int = 1000, cfg=_cfg, nm=_name, **kwargs):
        return make_classifier(nm + "_bn", "vgg",
                               VGG(cfg=cfg, use_bn=True, num_classes=num_classes))
    MODELS.register(name=_name + "_bn", obj=_builder_bn, arch="vgg",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))


def make_vgg_feature_fn(params, cfg_name: str = "vgg19", capture=(26,)):
    """Build ``feature_fn(x) -> [feats]`` for perceptual_loss from converted
    VGG weights (see enhax.convert.torch_weights)."""
    mod = VGGFeatures(_CFGS[cfg_name], capture=tuple(capture))

    def feature_fn(x):
        _, feats = mod.apply(params, x)
        return feats
    return feature_fn
