"""Functional model abstraction.

Rebuild of the reference's ``Model`` base (nn/model.py:172-997) and
``VisionModel``/``ImageEnhancementModel`` (vision/model.py:29,
vision/enhance/base.py:28) — redesigned functionally for JAX:

* a ``Model`` bundles a flax module with metadata, a loss, and datapoint
  contracts; parameters live *outside* as pytrees (no mutable module state).
* ``forward(variables, datapoint) -> outputs dict`` mirrors the reference's
  dict-in/dict-out convention (`image`/`ref_image` in, `enhanced` out).
* ``forward_loss`` composes forward + loss, returning (loss, outputs) — the
  reference's ``forward_loss`` (vision/enhance/base.py:47-57).
* weight loading/conversion is a separate concern (enhax/convert).

Datapoints are dicts of NHWC arrays. Contracts are validated host-side
(assert_datapoint / assert_outputs, reference nn/model.py:628-648) — outside
jit, at the engine boundary.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from enhax.constants import MODELS, Scheme, Task


@dataclasses.dataclass
class Model:
    """A functional model: flax module + metadata + loss.

    Attributes:
        name/arch/tasks/schemes: registry metadata (reference model attrs).
        module: flax linen module mapping input image(s) to outputs.
        loss_fn: (outputs, datapoint) -> scalar loss (None for inference-only).
        required_inputs: datapoint keys the model consumes.
        out_key: primary output key (``enhanced`` for enhancement models).
        instance_steps: >0 marks per-image test-time optimization models
            (Scheme.INSTANCE); the infer engine runs a scanned inner fit.
    """

    name: str
    arch: str
    module: Any
    tasks: tuple = (Task.LLIE,)
    schemes: tuple = (Scheme.SUPERVISED,)
    loss_fn: Callable | None = None
    required_inputs: tuple = ("image",)
    # datapoint keys forwarded as module kwargs when present (e.g. the
    # precomputed SAM masks / depth maps of wakeup_darkness)
    optional_inputs: tuple = ()
    out_key: str = "enhanced"
    instance_steps: int = 0
    instance_lr: float = 1e-4
    instance_weight_decay: float = 0.0
    size_divisor: int = 32
    scale: int = 1   # spatial output/input ratio (SR models > 1)
    metadata: dict = dataclasses.field(default_factory=dict)
    # Optional override for losses needing multiple forwards (e.g. ZSN2N's
    # pair-downsample consistency, reference gcenet.py:505-536). Signature:
    # (model, variables, datapoint, rngs) -> (loss, outputs).
    forward_loss_fn: Callable | None = None
    # Optional fused inference path (variables, *inputs) -> outputs dict,
    # e.g. the Pallas NAFBlock kernels (enhax/kernels/nafblock.py). Used
    # by ``apply`` for inference on TPU backends; the fused blocks carry a
    # custom VJP (Pallas fwd, lowered-XLA bwd), so ENHAX_FUSED_TRAIN=1
    # also routes training forwards through them. Disable entirely with
    # ENHAX_FUSED=0.
    fast_apply_fn: Callable | None = None

    # -- parameter lifecycle -------------------------------------------------

    def init(self, rng, datapoint: dict) -> dict:
        """Initialize variables from an example datapoint."""
        inputs = self._model_inputs(datapoint)
        return self.module.init(rng, *inputs,
                                **self._optional_inputs(datapoint))

    def apply(self, variables: dict, datapoint: dict, training: bool = False,
              rngs: dict | None = None) -> dict:
        """Pure forward: datapoint dict -> outputs dict."""
        inputs = self._model_inputs(datapoint)
        kwargs = self._optional_inputs(datapoint)
        # rngs-only kwargs don't block the fast path: the train step always
        # threads rngs, but models that define fast_apply_fn (nafnet/hinet
        # families) have no stochastic layers, so the flax path ignores
        # them too
        fused_kwargs_ok = not kwargs
        if rngs:
            kwargs["rngs"] = rngs
        fused_ok = (not training
                    or os.environ.get("ENHAX_FUSED_TRAIN", "0") == "1")
        if (self.fast_apply_fn is not None and fused_ok and fused_kwargs_ok
                and jax.default_backend() == "tpu"
                and os.environ.get("ENHAX_FUSED", "1") != "0"):
            if rngs and training:
                # the fused kernels are deterministic; a model that actually
                # consumes rngs (dropout) must not silently lose them
                import warnings
                warnings.warn(
                    f"{self.name}: ENHAX_FUSED_TRAIN=1 drops rngs "
                    f"{sorted(rngs)} on the fused path — only valid for "
                    "models with no stochastic layers (nafnet/hinet "
                    "families)", stacklevel=2)
            out = self.fast_apply_fn(variables, *inputs)
        else:
            out = self.module.apply(variables, *inputs, **kwargs)
        if isinstance(out, dict):
            return out
        return {self.out_key: out}

    def _module_accepts_train(self) -> bool:
        import inspect
        try:
            return "train" in inspect.signature(
                type(self.module).__call__).parameters
        except (TypeError, ValueError):
            return False

    def apply_train(self, variables: dict, datapoint: dict,
                    rngs: dict | None = None):
        """Training-mode forward: passes ``train=True`` to modules that take
        it and collects mutated ``batch_stats`` (BatchNorm running stats).

        Returns ``(outputs, new_batch_stats_or_None)``. Models without a
        train flag or without batch_stats behave exactly like
        ``apply(training=True)``.
        """
        inputs = self._model_inputs(datapoint)
        kwargs = self._optional_inputs(datapoint)
        if rngs:
            kwargs["rngs"] = rngs
        new_stats = None
        if self._module_accepts_train():
            if "batch_stats" in variables:
                out, mut = self.module.apply(variables, *inputs, train=True,
                                             mutable=["batch_stats"],
                                             **kwargs)
                new_stats = mut.get("batch_stats")
            else:
                out = self.module.apply(variables, *inputs, train=True,
                                        **kwargs)
        else:
            out = self.module.apply(variables, *inputs, **kwargs)
        if not isinstance(out, dict):
            out = {self.out_key: out}
        return out, new_stats

    def forward_loss(self, variables: dict, datapoint: dict,
                     rngs: dict | None = None) -> tuple[jax.Array, dict]:
        """(loss, outputs) — reference forward_loss (enhance/base.py:47)."""
        if self.forward_loss_fn is not None:
            return self.forward_loss_fn(self, variables, datapoint, rngs)
        outputs = self.apply(variables, datapoint, training=True, rngs=rngs)
        if self.loss_fn is None:
            raise ValueError(f"model {self.name} has no loss")
        loss = self.loss_fn(outputs, datapoint)
        return loss, outputs

    def _model_inputs(self, datapoint: dict) -> tuple:
        return tuple(datapoint[k] for k in self.required_inputs)

    def _optional_inputs(self, datapoint: dict) -> dict:
        return {k: datapoint[k] for k in self.optional_inputs
                if datapoint.get(k) is not None}

    # -- contracts (host-side; reference nn/model.py:628-648) ----------------

    def assert_datapoint(self, datapoint: dict) -> None:
        for k in self.required_inputs:
            if k not in datapoint or datapoint[k] is None:
                raise ValueError(
                    f"model {self.name} requires datapoint key {k!r}; "
                    f"got {sorted(datapoint)}")

    def assert_outputs(self, outputs: dict) -> None:
        if self.out_key not in outputs:
            raise ValueError(
                f"model {self.name} must produce {self.out_key!r}; "
                f"got {sorted(outputs)}")

    # -- convenience ----------------------------------------------------------

    def param_count(self, variables: dict) -> int:
        import numpy as np
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))


def build_model(name: str, **kwargs) -> Model:
    """Build a registered model by name (reference MODELS.build)."""
    return MODELS.build(name, **kwargs)


def supervised_loss(loss_callable, pred_key: str = "enhanced",
                    target_key: str = "ref_image"):
    """Adapter: elementwise supervised loss over (outputs, datapoint)."""
    def fn(outputs, datapoint):
        return loss_callable(outputs[pred_key], datapoint[target_key])
    return fn
