"""AlexNet, SqueezeNet, GoogLeNet (reference vision/classify/{alexnet,squeezenet,googlenet})."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class AlexNet(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                            name="conv1")(x))
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        y = nn.relu(nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv2")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        y = nn.relu(nn.Conv(384, (3, 3), name="conv3")(y))
        y = nn.relu(nn.Conv(256, (3, 3), name="conv4")(y))
        y = nn.relu(nn.Conv(256, (3, 3), name="conv5")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        # torchvision: AdaptiveAvgPool2d(6) then flatten -> Linear(9216, 4096)
        from enhax.models.classify.base import adaptive_avg_pool
        y = adaptive_avg_pool(y, 6)
        y = y.transpose(0, 3, 1, 2).reshape(y.shape[0], -1)
        y = nn.relu(nn.Dense(4096, name="fc1")(y))
        y = nn.relu(nn.Dense(4096, name="fc2")(y))
        return {"logits": nn.Dense(self.num_classes, name="fc3")(y)}


class Fire(nn.Module):
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(nn.Module):
    """version "1_0": 7x7/96 stem, pools after fire4/8 (torchvision 1.0);
    version "1_1": 3x3/64 stem, earlier pools (torchvision 1.1, ~2.4x less
    compute at equal accuracy)."""
    num_classes: int = 1000
    version: str = "1_0"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.version == "1_0":
            y = nn.relu(nn.Conv(96, (7, 7), strides=(2, 2),
                                padding="VALID", name="conv1")(x))
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for i, (s, e) in enumerate([(16, 64), (16, 64), (32, 128)]):
                y = Fire(s, e, name=f"fire{i + 2}")(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for i, (s, e) in enumerate([(32, 128), (48, 192), (48, 192), (64, 256)]):
                y = Fire(s, e, name=f"fire{i + 5}")(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            y = Fire(64, 256, name="fire9")(y)
        else:
            y = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2),
                                padding="VALID", name="conv1")(x))
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for i, (s, e) in enumerate([(16, 64), (16, 64)]):
                y = Fire(s, e, name=f"fire{i + 2}")(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for i, (s, e) in enumerate([(32, 128), (32, 128)]):
                y = Fire(s, e, name=f"fire{i + 4}")(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2))
            for i, (s, e) in enumerate([(48, 192), (48, 192), (64, 256), (64, 256)]):
                y = Fire(s, e, name=f"fire{i + 6}")(y)
        y = nn.Conv(self.num_classes, (1, 1), name="classifier")(y)
        return {"logits": jnp.mean(y, axis=(-3, -2))}


def _basic_conv(x, features, kernel, train, name, strides=(1, 1),
                padding="SAME"):
    """torchvision BasicConv2d — the shared inception.BasicConv module
    (bias-free conv + BN eps=1e-3 + relu), one implementation for both
    GoogLeNet and InceptionV3."""
    from enhax.models.classify.inception import BasicConv
    return BasicConv(features, kernel, strides=strides, padding=padding,
                     name=name)(x, train)


class Inception(nn.Module):
    """GoogLeNet inception block, torchvision layout: BasicConv2d branches
    and a 3x3 (not 5x5) second conv in the "5x5" branch — torchvision's
    known deviation from the paper, kept for released-checkpoint
    compatibility (the reference wraps torchvision's googlenet)."""
    c1: int
    c3r: int
    c3: int
    c5r: int
    c5: int
    cp: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = _basic_conv(x, self.c1, (1, 1), train, "b1")
        b3 = _basic_conv(x, self.c3r, (1, 1), train, "b3r")
        b3 = _basic_conv(b3, self.c3, (3, 3), train, "b3")
        b5 = _basic_conv(x, self.c5r, (1, 1), train, "b5r")
        b5 = _basic_conv(b5, self.c5, (3, 3), train, "b5")
        bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = _basic_conv(bp, self.cp, (1, 1), train, "bp")
        return jnp.concatenate([b1, b3, b5, bp], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _basic_conv(x, 64, (7, 7), train, "conv1", strides=(2, 2),
                        padding=((3, 3), (3, 3)))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        y = _basic_conv(y, 64, (1, 1), train, "conv2")
        y = _basic_conv(y, 192, (3, 3), train, "conv3")
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        y = Inception(64, 96, 128, 16, 32, 32, name="inc3a")(y, train=train)
        y = Inception(128, 128, 192, 32, 96, 64, name="inc3b")(y, train=train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        y = Inception(192, 96, 208, 16, 48, 64, name="inc4a")(y, train=train)
        y = Inception(160, 112, 224, 24, 64, 64, name="inc4b")(y, train=train)
        y = Inception(128, 128, 256, 24, 64, 64, name="inc4c")(y, train=train)
        y = Inception(112, 144, 288, 32, 64, 64, name="inc4d")(y, train=train)
        y = Inception(256, 160, 320, 32, 128, 128, name="inc4e")(y, train=train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        y = Inception(256, 160, 320, 32, 128, 128, name="inc5a")(y, train=train)
        y = Inception(384, 192, 384, 48, 128, 128, name="inc5b")(y, train=train)
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="fc")(y)}


@MODELS.register(name="alexnet", arch="alexnet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def alexnet(num_classes: int = 1000, **kwargs):
    return make_classifier("alexnet", "alexnet", AlexNet(num_classes=num_classes))


@MODELS.register(name="squeezenet1_1", arch="squeezenet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def squeezenet1_1(num_classes: int = 1000, **kwargs):
    return make_classifier("squeezenet1_1", "squeezenet",
                           SqueezeNet(num_classes=num_classes, version="1_1"))


@MODELS.register(name="squeezenet1_0", arch="squeezenet", aliases=["squeezenet"],
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def squeezenet1_0(num_classes: int = 1000, **kwargs):
    return make_classifier("squeezenet1_0", "squeezenet",
                           SqueezeNet(num_classes=num_classes))


@MODELS.register(name="googlenet", arch="googlenet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def googlenet(num_classes: int = 1000, **kwargs):
    return make_classifier("googlenet", "googlenet",
                           GoogLeNet(num_classes=num_classes))
