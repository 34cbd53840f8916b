"""Prediction engine.

Rebuild of the reference's predict path (vision/model.py:76-127 ``infer`` —
resize-to-multiple-of-32, timed forward, resize back; predict loop
runml/predict.py:76-124) redesigned for TPU:

  * **pad, don't resize**: content-preserving reflect pad to the stride
    multiple inside the jitted graph, cropped after (static shapes per
    bucket; no resampling losses).
  * **shape buckets**: arbitrary folders produce few distinct padded shapes,
    so recompiles are bounded; each bucket compiles once.
  * **batched**: the reference enhances one image per step; enhax batches.
  * **instance models** (GCENet-instance/CoLIE/ZSN2N/ZID, SURVEY.md §3.3):
    the 300-3000-step per-image fit runs as one jitted ``lax.scan`` — one
    compile, all steps on device, no host round-trips.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import optax

from enhax.models.base import Model
from enhax.ops.layout import make_divisible
from enhax.ops.resize import resize as resize_op


def _pad_hw(v, ph: int, pw: int):
    """Trailing reflect pad of (ph, pw) on the H/W axes of ...HWC.

    jnp.pad's reflect requires pad < dim: for targets far larger than the
    image (small image into a big bucket), reflect what fits and
    edge-extend the rest — the pad region is cropped away after inference.
    """
    h, w = v.shape[-3], v.shape[-2]
    rh, rw = min(ph, h - 1), min(pw, w - 1)
    pad = [(0, 0)] * (v.ndim - 3) + [(0, rh), (0, rw), (0, 0)]
    v = jnp.pad(v, pad, mode="reflect")
    if ph > rh or pw > rw:
        pad = [(0, 0)] * (v.ndim - 3) + [(0, ph - rh), (0, pw - rw), (0, 0)]
        v = jnp.pad(v, pad, mode="edge")
    return v


def _pad_batch(images: dict, divisor: int) -> tuple[dict, tuple[int, int]]:
    """Reflect-pad every image-like entry to H/W multiples of divisor."""
    any_img = images["image"]
    h, w = any_img.shape[-3], any_img.shape[-2]
    th, tw = make_divisible(h, divisor), make_divisible(w, divisor)
    if (th, tw) == (h, w):
        return images, (h, w)
    out = {}
    for k, v in images.items():
        if hasattr(v, "ndim") and v.ndim >= 3 and v.shape[-3] == h and v.shape[-2] == w:
            out[k] = _pad_hw(v, th - h, tw - w)
        else:
            out[k] = v
    return out, (h, w)


def _pad_to_bucket(images: dict, buckets: tuple) -> tuple[dict, tuple[int, int]]:
    """Reflect-pad H/W up to the nearest bucket size (largest bucket caps)."""
    any_img = images["image"]
    h, w = any_img.shape[-3], any_img.shape[-2]

    def pick(v):
        for b in buckets:
            if v <= b:
                return b
        return v  # larger than all buckets: keep exact (single compile)

    th, tw = pick(h), pick(w)
    if (th, tw) == (h, w):
        return images, (h, w)
    out = {}
    for k, v in images.items():
        if hasattr(v, "ndim") and v.ndim >= 3 and v.shape[-3] == h and v.shape[-2] == w:
            out[k] = _pad_hw(v, th - h, tw - w)
        else:
            out[k] = v
    return out, (h, w)


def _crop_outputs(outputs: dict, size: tuple[int, int]) -> dict:
    h, w = size
    out = {}
    for k, v in outputs.items():
        if hasattr(v, "ndim") and v.ndim >= 3 and v.shape[-3] >= h and v.shape[-2] >= w:
            out[k] = v[..., :h, :w, :]
        else:
            out[k] = v
    return out


class Predictor:
    """Batched predictor with shape-bucketed jit.

    Args:
        model: enhax Model.
        variables: parameter pytree (None -> random init on first call).
        image_size: optional fixed (h, w) — resize inputs like the
            reference's ``--imgsz --resize`` path (vision/model.py:97-109).
        tile: optional (tile_h, tile_w, overlap) for overlap-tiled full-res
            inference (Restormer my_predict.py:157-167).
    """

    def __init__(self, model: Model, variables=None, image_size=None,
                 resize: bool = False, tile: tuple | None = None, seed: int = 0,
                 bucket_sizes: tuple | None = None, mesh=None,
                 spatial: bool = False, bf16: bool = False,
                 tile_blend: str = "hann"):
        self.model = model
        # bfloat16 inference: params + activations in bf16 (outputs cast
        # back to f32). On the TPU bench this is within 1 uint8 LSB of the
        # f32 path while halving HBM traffic (see bench.py).
        self.bf16 = bool(bf16)
        self._instance_fn = None
        self._vars_placed = False
        self.variables = variables  # property: assignment resets caches
        self.image_size = image_size
        self.resize = resize
        self.tile = tile
        # 'hann' (default, seam-free) or 'uniform' (the reference's exact
        # unweighted accumulate/divide, my_predict.py:157-167)
        self.tile_blend = tile_blend
        self.seed = seed
        # Optional shape buckets: padded H/W are rounded UP to the nearest
        # bucket so arbitrary folders compile at most len(buckets)^2 graphs
        # (pad-to-bucket + crop; SURVEY.md §7 "dynamic shapes" plan).
        self.bucket_sizes = tuple(sorted(bucket_sizes)) if bucket_sizes else None
        # Optional multi-device inference: a jax.sharding.Mesh with a "data"
        # axis (+ optional "space" axis with spatial=True to split image H).
        # Inputs are placed sharded; XLA propagates the sharding through the
        # jitted forward, inserting halo collectives for spatially split
        # convs (SURVEY.md §5.7; replaces the reference's DDP predict path).
        self.mesh = mesh
        self.spatial = spatial
        if spatial and (mesh is None or "space" not in mesh.axis_names):
            raise ValueError('spatial=True needs a mesh with a "space" axis')
        self._jitted = jax.jit(self._forward)

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        # swapping weights on a live Predictor must invalidate the cached
        # device placement and instance-mode closure, or inference silently
        # keeps serving the previous weights (r1 ADVICE #4)
        self._variables = value
        self._vars_placed = False
        self._vars_bf16 = False
        self._instance_fn = None

    def _forward(self, variables, datapoint):
        if self.bf16:
            datapoint = {k: (v.astype(jnp.bfloat16)
                             if hasattr(v, "dtype") and v.dtype == jnp.float32
                             else v)
                         for k, v in datapoint.items()}
        out = self.model.apply(variables, datapoint)
        if self.bf16 and isinstance(out, dict):
            out = {k: (v.astype(jnp.float32)
                       if hasattr(v, "dtype") and v.dtype == jnp.bfloat16
                       else v)
                   for k, v in out.items()}
        return out

    def _ensure_variables(self, datapoint):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(self.seed), datapoint)
        if self.bf16 and self.model.instance_steps:
            # per-image optimization needs f32 master params — the inner
            # Adam loop diverges on bf16 weights; bf16 stays inference-only
            if not getattr(self, "_warned_bf16_instance", False):
                from enhax.utils.console import console
                console.print(
                    f"[yellow]bf16 requested but {self.model.name} is an "
                    "instance-optimization model; keeping float32 master "
                    "params (bf16 ignored).[/yellow]")
                self._warned_bf16_instance = True
            return
        if self.bf16 and not getattr(self, "_vars_bf16", False):
            cast = lambda a: (a.astype(jnp.bfloat16)  # noqa: E731
                              if hasattr(a, "dtype") and a.dtype == jnp.float32
                              else a)
            self._variables = jax.tree_util.tree_map(cast, self._variables)
            self._vars_bf16 = True

    def _place_on_mesh(self, dp: dict) -> dict:
        """Shard a padded datapoint over the mesh (batch + optional H)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from enhax.parallel.mesh import replicated
        if not self._vars_placed:
            # bypass the invalidating setter: placement keeps the same weights
            self._variables = jax.device_put(self.variables,
                                             replicated(self.mesh))
            self._vars_placed = True
        nd = self.mesh.shape.get("data", 1)
        ns = self.mesh.shape.get("space", 1) if self.spatial else 1
        out = {}
        for k, v in dp.items():
            if not (hasattr(v, "ndim") and v.ndim >= 1):
                out[k] = v
                continue
            batch_ok = v.shape[0] % nd == 0
            space_ok = (self.spatial and v.ndim == 4
                        and v.shape[1] % ns == 0 and v.shape[1] // ns > 0)
            entries = ["data" if batch_ok else None]
            if v.ndim >= 2:
                entries.append("space" if space_ok else None)
            spec = P(*entries)
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        return out

    def infer(self, datapoint: dict) -> dict:
        """Single-batch inference with timing (reference infer contract)."""
        self.model.assert_datapoint(datapoint)
        # keep arrays and numeric lists; drop meta dicts/strings so raw
        # dataset items (which always carry 'meta') work without manual
        # stripping at every call site
        dp = {k: jnp.asarray(v) for k, v in datapoint.items()
              if hasattr(v, "shape")
              or (isinstance(v, (list, tuple)) and len(v) > 0
                  and not isinstance(v[0], (str, dict)))}
        # to 4D NHWC
        for k, v in dp.items():
            if v.ndim == 3:
                dp[k] = v[None]
        orig_hw = (dp["image"].shape[-3], dp["image"].shape[-2])
        if self.resize and self.image_size is not None:
            dp = {k: resize_op(v, self.image_size) if v.ndim == 4 else v
                  for k, v in dp.items()}
        dp, unpad_hw = _pad_batch(dp, self.model.size_divisor)
        if self.bucket_sizes:
            dp, unpad_hw2 = _pad_to_bucket(dp, self.bucket_sizes)
            unpad_hw = (min(unpad_hw[0], unpad_hw2[0]),
                        min(unpad_hw[1], unpad_hw2[1]))

        self._ensure_variables(dp)
        if self.mesh is not None:
            dp = self._place_on_mesh(dp)

        if self.model.instance_steps > 0:
            if self._instance_fn is None:
                self._instance_fn = make_instance_infer(
                    self.model, steps=self.model.instance_steps,
                    lr=self.model.instance_lr,
                    weight_decay=self.model.instance_weight_decay)
            t0 = time.perf_counter()
            outputs = jax.block_until_ready(
                self._instance_fn(self.variables, dp, jax.random.PRNGKey(self.seed)))
            dt = time.perf_counter() - t0
        elif self.tile is not None:
            from enhax.infer.tiling import tiled_apply_frames
            s_tile = getattr(self.model, "scale", 1) or 1
            if s_tile != 1:
                raise ValueError(
                    f"tile= is only supported for shape-preserving models; "
                    f"{self.model.name} has scale={s_tile} (tiled_apply "
                    f"accumulates into an input-shaped canvas)")
            t0 = time.perf_counter()
            # all frames' tiles through one chunked dispatch stream (r4:
            # amortizes the tail chunk + per-frame dispatch; equals
            # per-frame tiled_apply for both blends — tests assert it)
            enhanced = tiled_apply_frames(
                lambda x: self._jitted(self.variables, {**dp, "image": x})[self.model.out_key],
                dp["image"], tile=self.tile[0:2], overlap=self.tile[2],
                blend=self.tile_blend)
            outputs = {self.model.out_key: jax.block_until_ready(enhanced)}
            dt = time.perf_counter() - t0
        else:
            t0 = time.perf_counter()
            outputs = jax.block_until_ready(self._jitted(self.variables, dp))
            dt = time.perf_counter() - t0

        s = getattr(self.model, "scale", 1) or 1
        outputs = _crop_outputs(outputs, (unpad_hw[0] * s, unpad_hw[1] * s))
        if self.resize and self.image_size is not None:
            key = self.model.out_key
            outputs[key] = resize_op(outputs[key], orig_hw)
        self.model.assert_outputs(outputs)
        outputs["time"] = dt
        return outputs

    def __call__(self, datapoint: dict) -> dict:
        return self.infer(datapoint)

    def predict_iter(self, source, batch_size: int = 8):
        """Batched prediction over an iterable of datapoint dicts.

        Groups consecutive same-shaped items into batches (shape buckets stay
        bounded, each bucket compiles once), yields (outputs, metas) where
        outputs are per-batch and metas is the list of item metas. This is
        the batched replacement for the reference's item-at-a-time predict
        loop (runml/predict.py:76).
        """
        pending: list[dict] = []
        pending_shape = None

        def flush():
            nonlocal pending, pending_shape
            if not pending:
                return None
            batch = {}
            for k in pending[0]:
                if k == "meta":
                    continue
                vals = [p[k] for p in pending if p.get(k) is not None]
                if vals and hasattr(vals[0], "shape"):
                    batch[k] = jnp.stack([jnp.asarray(v) for v in vals])
            metas = [p.get("meta", {}) for p in pending]
            out = self.infer(batch)
            pending = []
            pending_shape = None
            return out, metas

        for item in source:
            shape = item["image"].shape
            if pending and (shape != pending_shape or len(pending) >= batch_size):
                res = flush()
                if res:
                    yield res
            pending.append(item)
            pending_shape = shape
        res = flush()
        if res:
            yield res


def make_instance_infer(model: Model, steps: int, lr: float = 1e-4,
                        weight_decay: float = 0.0):
    """Per-image test-time optimization as one jitted scan.

    Reference pattern (gcenet.py:539-596, zsn2n.py infer): N optimizer steps
    on the zero-shot loss, then a clean forward. Here the whole fit is a
    ``lax.scan`` inside jit: one compilation, steps stay on device.
    """
    if weight_decay:
        tx = optax.adamw(lr, weight_decay=weight_decay)
    else:
        tx = optax.adam(lr)

    def run(variables, datapoint, rng):
        opt_state = tx.init(variables)

        def body(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                loss, _ = model.forward_loss(p, datapoint)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            body, (variables, opt_state), None, length=steps)
        outputs = model.apply(params, datapoint)
        outputs["fit_loss"] = losses[-1]
        return outputs

    return jax.jit(run)
