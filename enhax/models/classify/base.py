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
