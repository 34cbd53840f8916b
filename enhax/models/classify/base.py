"""Classification model base.

Rebuild of reference ``vision/classify/base.py:26 ImageClassificationModel``:
datapoint key ``image`` in, ``logits`` out, cross-entropy loss against the
``class_id`` key, top-1 accuracy metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from enhax.constants import Scheme, Task
from enhax.models.base import Model


def classification_loss():
    def fn(outputs, datapoint):
        labels = datapoint["class_id"]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            outputs["logits"], labels))
    return fn


def make_classifier(name: str, arch: str, module, size_divisor: int = 32) -> Model:
    return Model(
        name=name, arch=arch,
        module=module,
        tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,),
        loss_fn=classification_loss(),
        required_inputs=("image",),
        out_key="logits",
        size_divisor=size_divisor,
    )


def adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d(out) on NHWC: bin i averages rows
    [floor(i*H/out), ceil((i+1)*H/out)) (identity when H == out, plain
    stride pooling when H % out == 0)."""
    import jax.numpy as jnp

    def pool_axis(v, axis):
        n = v.shape[axis]
        if n == out:
            return v
        if n % out == 0:
            k = n // out
            shape = list(v.shape)
            shape[axis:axis + 1] = [out, k]
            return jnp.mean(v.reshape(shape), axis=axis + 1)
        bins = []
        for i in range(out):
            lo = (i * n) // out
            hi = -(-((i + 1) * n) // out)  # ceil
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(lo, hi)
            bins.append(jnp.mean(v[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(bins, axis=axis)

    return pool_axis(pool_axis(x, -3), -2)
