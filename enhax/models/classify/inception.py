"""InceptionV3 (reference vision/classify/inception)."""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class BasicConv(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv(64, (1, 1), name="b1")(x, train)
        b5 = BasicConv(48, (1, 1), name="b5_1")(x, train)
        b5 = BasicConv(64, (5, 5), name="b5_2")(b5, train)
        b3 = BasicConv(64, (1, 1), name="b3_1")(x, train)
        b3 = BasicConv(96, (3, 3), name="b3_2")(b3, train)
        b3 = BasicConv(96, (3, 3), name="b3_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(self.pool_features, (1, 1), name="bp")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), padding="VALID", name="b3")(x, train)
        bd = BasicConv(64, (1, 1), name="bd_1")(x, train)
        bd = BasicConv(96, (3, 3), name="bd_2")(bd, train)
        bd = BasicConv(96, (3, 3), strides=(2, 2), padding="VALID", name="bd_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c7
        b1 = BasicConv(192, (1, 1), name="b1")(x, train)
        b7 = BasicConv(c, (1, 1), name="b7_1")(x, train)
        b7 = BasicConv(c, (1, 7), name="b7_2")(b7, train)
        b7 = BasicConv(192, (7, 1), name="b7_3")(b7, train)
        bd = BasicConv(c, (1, 1), name="bd_1")(x, train)
        bd = BasicConv(c, (7, 1), name="bd_2")(bd, train)
        bd = BasicConv(c, (1, 7), name="bd_3")(bd, train)
        bd = BasicConv(c, (7, 1), name="bd_4")(bd, train)
        bd = BasicConv(192, (1, 7), name="bd_5")(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(192, (1, 1), name="bp")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv(192, (1, 1), name="b3_1")(x, train)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), padding="VALID", name="b3_2")(b3, train)
        b7 = BasicConv(192, (1, 1), name="b7_1")(x, train)
        b7 = BasicConv(192, (1, 7), name="b7_2")(b7, train)
        b7 = BasicConv(192, (7, 1), name="b7_3")(b7, train)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), padding="VALID", name="b7_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv(320, (1, 1), name="b1")(x, train)
        b3 = BasicConv(384, (1, 1), name="b3_1")(x, train)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), name="b3_2a")(b3, train),
            BasicConv(384, (3, 1), name="b3_2b")(b3, train)], axis=-1)
        bd = BasicConv(448, (1, 1), name="bd_1")(x, train)
        bd = BasicConv(384, (3, 3), name="bd_2")(bd, train)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), name="bd_3a")(bd, train),
            BasicConv(384, (3, 1), name="bd_3b")(bd, train)], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv(192, (1, 1), name="bp")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionAux(nn.Module):
    """torchvision InceptionAux (5x5-pooled 768 -> 128 -> 768 -> fc):
    training-only auxiliary classifier, carried so released checkpoints
    (which include AuxLogits.* weights) convert completely."""
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhax.models.classify.base import adaptive_avg_pool
        y = nn.avg_pool(x, (5, 5), strides=(3, 3))
        y = BasicConv(128, (1, 1), name="conv0")(y, train)
        y = BasicConv(768, (5, 5), padding="VALID", name="conv1")(y, train)
        y = adaptive_avg_pool(y, 1)
        return nn.Dense(self.num_classes, name="fc")(y[:, 0, 0])


class InceptionV3(nn.Module):
    num_classes: int = 1000
    aux_logits: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BasicConv(32, (3, 3), strides=(2, 2), padding="VALID", name="c1")(x, train)
        y = BasicConv(32, (3, 3), padding="VALID", name="c2")(y, train)
        y = BasicConv(64, (3, 3), name="c3")(y, train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        y = BasicConv(80, (1, 1), name="c4")(y, train)
        y = BasicConv(192, (3, 3), padding="VALID", name="c5")(y, train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        y = InceptionA(32, name="mix5b")(y, train)
        y = InceptionA(64, name="mix5c")(y, train)
        y = InceptionA(64, name="mix5d")(y, train)
        y = InceptionB(name="mix6a")(y, train)
        y = InceptionC(128, name="mix6b")(y, train)
        y = InceptionC(160, name="mix6c")(y, train)
        y = InceptionC(160, name="mix6d")(y, train)
        y = InceptionC(192, name="mix6e")(y, train)
        aux = None
        if self.aux_logits:
            aux = InceptionAux(self.num_classes, name="aux")(y, train)
        y = InceptionD(name="mix7a")(y, train)
        y = InceptionE(name="mix7b")(y, train)
        y = InceptionE(name="mix7c")(y, train)
        y = jnp.mean(y, axis=(-3, -2))
        # "features" = the 2048-d pre-logits pool (the FID activation layer)
        out = {"logits": nn.Dense(self.num_classes, name="fc")(y),
               "features": y}
        if aux is not None:
            out["aux_logits"] = aux
        return out


@MODELS.register(name="inception3", arch="inception", aliases=["inception_v3"],
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def inception3(num_classes: int = 1000, **kwargs):
    return make_classifier("inception3", "inception",
                           InceptionV3(num_classes=num_classes), size_divisor=32)
