"""Generic fit() loop with sharded jitted steps.

Rebuild of the reference's Lightning stack — ``Trainer``
(nn/runner/trainer.py:27-84), ``Model.training_step/validation_step``
(nn/model.py:701-880) and the callback set (nn/callback/) — as explicit
functions:

  * one jitted ``train_step`` closed over (model, optimizer); batch arrives
    sharded over the mesh's data axis, so XLA all-reduces grads over ICI
    (replaces DDPStrategy + sync_dist=True).
  * hooks replace callbacks: CSV epoch log (console_logging.py:38),
    checkpoint-on-metric (model_checkpoint.py:35), debug image dumps
    (nn/model.py:969-993).
  * resume = restore latest checkpoint (train.py:52-71).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from enhax.models.base import Model
from enhax.nn.metrics import psnr, ssim
from enhax.parallel.mesh import data_sharding, make_mesh, replicated
from enhax.utils.console import console


@dataclasses.dataclass
class TrainState:
    """Minimal train state pytree (flax TrainState without the apply_fn).

    ``ema`` (optional) holds the exponential-moving-average shadow of
    ``params`` when the trainer runs with ``ema_decay`` — the BasicSR
    ``net_g_ema`` the reference's vendored restorer training keeps and
    ships (restormer/basicsr/models/image_restoration_model.py:81-88;
    released checkpoints carry it as ``params_ema``).
    """
    step: int
    params: Any
    opt_state: Any
    ema: Any = None

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state, self.ema), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def _cast_floats(tree, dtype):
    """Cast float32/bfloat16 leaves to ``dtype``, leave everything else alone."""
    def cast(a):
        if hasattr(a, "dtype") and a.dtype in (jnp.float32, jnp.bfloat16):
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(cast, tree)


def make_train_step(model: Model, tx: optax.GradientTransformation,
                    donate: bool = True, remat: bool = False,
                    precision: str | None = None,
                    ema_decay: float | None = None):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``remat=True`` rematerializes the forward during backprop
    (jax.checkpoint) — trades FLOPs for activation memory, the TPU-native
    answer to big-batch/high-res training (SURVEY.md hardware notes).

    ``precision="bf16"`` enables bf16-mixed training, the TPU equivalent of
    the reference's Lightning ``precision=16`` trainer flag (reference
    config/default.py trainer block): the forward/backward run in bfloat16
    (params and batch cast inside the differentiated function, so gradients
    come back float32 through the cast), while master params, optimizer
    state, the loss, and metrics all stay float32. bf16 shares float32's
    exponent range, so no loss scaling is needed (unlike fp16 AMP). When the
    model has a plain ``loss_fn`` the outputs are upcast and the loss is
    computed in f32 against the original f32 batch; models with a custom
    ``forward_loss_fn`` (multi-forward zero-shot losses) compute their loss
    in bf16 and only the scalar is upcast.
    """
    use_bf16 = precision in ("bf16", "bf16-mixed", "16-mixed", "16", 16)
    # BatchNorm running stats are NOT trainable: they are carried outside
    # the differentiated tree, updated from the batch via mutable
    # batch_stats on the plain-loss f32 path (the Lightning/torch BN
    # semantics the reference trains with), and held frozen elsewhere
    # (bf16 / custom forward_loss paths — like sci.py's documented stance)
    bn_path = model.forward_loss_fn is None and model.loss_fn is not None \
        and not use_bf16

    def step(state: TrainState, batch: dict, rng) -> tuple[TrainState, dict]:
        rngs = {"dropout": rng, "params": rng}
        stats = {k: v for k, v in state.params.items() if k == "batch_stats"}
        trainable = {k: v for k, v in state.params.items()
                     if k != "batch_stats"}

        def loss_fn(trainable):
            params = {**trainable, **stats}
            if not use_bf16:
                if bn_path:
                    outputs, new_stats = model.apply_train(params, batch,
                                                           rngs=rngs)
                    return model.loss_fn(outputs, batch), (outputs, new_stats)
                loss, outputs = model.forward_loss(params, batch, rngs=rngs)
                return loss, (outputs, None)
            p16 = _cast_floats(params, jnp.bfloat16)
            b16 = _cast_floats(batch, jnp.bfloat16)
            if model.forward_loss_fn is None and model.loss_fn is not None:
                outputs = model.apply(p16, b16, training=True, rngs=rngs)
                outputs = _cast_floats(outputs, jnp.float32)
                return model.loss_fn(outputs, batch), (outputs, None)
            loss, outputs = model.forward_loss(p16, b16, rngs=rngs)
            return loss.astype(jnp.float32), (
                _cast_floats(outputs, jnp.float32), None)

        if remat:
            loss_fn = jax.checkpoint(loss_fn)

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        params = optax.apply_updates(trainable, updates)
        if new_stats is not None:
            params["batch_stats"] = new_stats
        elif stats:
            params.update(stats)
        ema = state.ema
        if ema_decay and ema is not None:
            # BasicSR model_ema semantics (image_restoration_model.py:81-88):
            # shadow = decay * shadow + (1 - decay) * NAMED PARAMETERS only —
            # buffers (batch_stats running stats) are copied, not blended
            ema_src = {k: v for k, v in params.items() if k != "batch_stats"}
            ema_shadow = {k: v for k, v in ema.items() if k != "batch_stats"}
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay)
                if jnp.issubdtype(e.dtype, jnp.floating) else p,
                ema_shadow, ema_src)
            if "batch_stats" in params:
                ema["batch_stats"] = params["batch_stats"]
        metrics = {"loss": loss}
        if "ref_image" in batch and model.out_key in outputs:
            pred = jnp.clip(outputs[model.out_key], 0.0, 1.0)
            metrics["psnr"] = psnr(pred, batch["ref_image"])
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Model, compute_ssim: bool = True):
    """Jitted eval step: (params, batch) -> metrics dict (val PSNR/SSIM)."""

    def step(params, batch: dict) -> dict:
        outputs = model.apply(params, batch)
        metrics = {}
        if "ref_image" in batch and model.out_key in outputs:
            pred = jnp.clip(outputs[model.out_key], 0.0, 1.0)
            ref = batch["ref_image"]
            metrics["psnr"] = psnr(pred, ref)
            if compute_ssim:
                metrics["ssim"] = ssim(pred, ref)
        if "class_id" in batch and "logits" in outputs:
            # classification eval: top-1 AND top-5 (reference evaluates
            # torchmetrics Accuracy; VERDICT r3 asked for both)
            from enhax.nn.metrics_cls import accuracy
            logits = outputs["logits"]
            metrics["acc_top1"] = accuracy(logits, batch["class_id"])
            if logits.shape[-1] >= 5:
                metrics["acc_top5"] = accuracy(logits, batch["class_id"],
                                               top_k=5)
        if model.loss_fn is not None:
            # trace-time failure (e.g. loss needs inputs absent from val
            # batches) omits the metric but must not be silent: a broken val
            # loss silently degrades best-checkpoint selection otherwise
            try:
                metrics["loss"] = model.loss_fn(outputs, batch)
            except Exception as e:  # noqa: BLE001
                from enhax.utils.console import console
                console.print(f"[trainer] val loss for {model.name} failed at "
                              f"trace time; omitting from metrics: {e!r}")
        return metrics

    return jax.jit(step)


class Trainer:
    """Explicit training driver (replaces lightning.Trainer).

    Args:
        model: an enhax Model.
        optimizer: optax transformation or a reference-style config dict.
        max_epochs/max_steps: stop conditions (trainer config, default.py:150).
        mesh: optional Mesh; default = 1D data mesh over all devices.
        strategy: optional name from STRATEGIES ("ddp", "fsdp",
            "single_device", "spatial") — builds the mesh (unless one is
            given) and, for "fsdp", ZeRO-3-shards the params at
            init_state (reference nn/strategy.py:67-80 analog).
        ckpt_dir: checkpoint directory; monitor ("psnr", "max") selects best.
        log_every_n_steps, save_dir, log_image_every_n_epochs: observability
            (reference trainer.py:37, default.py:141).
    """

    def __init__(
        self,
        model: Model,
        optimizer,
        max_epochs: int = 100,
        max_steps: int | None = None,
        mesh=None,
        strategy: str | None = None,
        ckpt_dir=None,
        monitor: tuple[str, str] = ("psnr", "max"),
        log_every_n_steps: int = 50,
        log_image_every_n_epochs: int = 0,
        save_dir=None,
        seed: int = 0,
        hooks: list | None = None,
        remat: bool = False,
        gradient_clip_val: float | None = None,
        gradient_clip_algorithm: str = "norm",
        accumulate_grad_batches: int = 1,
        limit_train_batches: int | None = None,
        limit_val_batches: int | None = None,
        overfit_batches: int = 0,
        fast_dev_run: bool = False,
        precision: str | None = None,
        ema_decay: float | None = None,
        fsdp_min_size: int = 2 ** 14,
    ):
        self.model = model
        self.plateau = None
        self.plateau_monitor = None
        if isinstance(optimizer, dict):
            from enhax.nn.optim import build_optimizer_with_plateau
            optimizer, self.plateau, self.plateau_monitor = \
                build_optimizer_with_plateau(optimizer)
        import optax
        # reference trainer knobs (config/default.py:142-143,158):
        # gradient clipping + gradient accumulation, expressed as optax
        # transforms around the configured optimizer
        if gradient_clip_val:
            clip = (optax.clip_by_global_norm(gradient_clip_val)
                    if gradient_clip_algorithm == "norm"
                    else optax.clip(gradient_clip_val))
            optimizer = optax.chain(clip, optimizer)
        if accumulate_grad_batches and accumulate_grad_batches > 1:
            optimizer = optax.MultiSteps(
                optimizer, every_k_schedule=accumulate_grad_batches)
        self.tx = optimizer
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.strategy = strategy
        self.fsdp_min_size = fsdp_min_size
        if mesh is None and strategy is not None:
            from enhax.constants import STRATEGIES
            mesh = STRATEGIES.build(strategy)
        self.mesh = mesh if mesh is not None else make_mesh(("data",))
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.log_every_n_steps = log_every_n_steps
        self.log_image_every_n_epochs = log_image_every_n_epochs
        self.save_dir = save_dir
        self.seed = seed
        self.hooks = hooks or []
        self.history: list[dict] = []
        # Lightning-style debug knobs (reference config/default.py:141-159)
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.overfit_batches = overfit_batches
        if fast_dev_run:
            self.max_epochs = 1
            self.limit_train_batches = 1
            self.limit_val_batches = 1

        self.ema_decay = ema_decay
        self.precision = precision
        self._train_step = make_train_step(model, self.tx, remat=remat,
                                           precision=precision,
                                           ema_decay=ema_decay)
        self._eval_step = make_eval_step(model)
        self._preempted = False

    # -- state ----------------------------------------------------------------

    def init_state(self, example_batch: dict, params=None) -> TrainState:
        if params is None:
            params = self.model.init(jax.random.PRNGKey(self.seed), example_batch)
        if self.strategy == "fsdp":
            # ZeRO-3: each device holds 1/N of every large param; XLA
            # all-gathers at use and reduce-scatters grads
            from enhax.parallel.mesh import fsdp_shardings
            params = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, s), params,
                fsdp_shardings(params, self.mesh,
                               min_size=self.fsdp_min_size))
        # real copies, not aliases: the jitted step donates the TrainState,
        # and donating params+ema views of one buffer is an XLA error
        ema = jax.tree_util.tree_map(jnp.copy, params) \
            if self.ema_decay else None
        # optimizer state covers TRAINABLE leaves only (batch_stats are
        # carried outside the differentiated tree in make_train_step)
        trainable = {k: v for k, v in params.items() if k != "batch_stats"}
        if "batch_stats" in params and self.precision in (
                "bf16", "bf16-mixed", "16-mixed", "16", 16):
            console.print(
                "[trainer] WARNING: bf16 precision freezes BatchNorm "
                "running stats at their current values (stat updates run "
                "only on the f32 plain-loss path); from-scratch BN "
                "training should use f32")
        return TrainState(step=0, params=params,
                          opt_state=self.tx.init(trainable), ema=ema)

    def _restore_placement(self, state: TrainState) -> TrainState:
        """Re-establish the strategy's device placement after a checkpoint
        restore.

        Checkpoints are topology-agnostic host trees (save_checkpoint
        gathers with np.asarray), so a resume may land on a DIFFERENT mesh
        shape than the one that saved — the TPU-fleet preemption story.
        Without re-placement the restored params enter the jitted step with
        default placement and the ZeRO-3 sharding silently degrades to
        replicated. fsdp_shardings is shape-driven, so the same rule
        re-shards params, EMA, and the param-shaped optimizer moments on
        the CURRENT mesh regardless of the saving topology.
        """
        if self.strategy != "fsdp":
            return state
        from enhax.parallel.mesh import fsdp_shardings

        def put(tree):
            if tree is None:
                return None
            sh = fsdp_shardings(tree, self.mesh, min_size=self.fsdp_min_size)
            return jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, s), tree, sh)

        return TrainState(step=state.step, params=put(state.params),
                          opt_state=put(state.opt_state),
                          ema=put(state.ema))

    def _place(self, batch: dict) -> dict:
        from enhax.parallel.mesh import shard_datapoint
        # strip host-only entries (meta, string lists) before the jitted step
        arrays = {k: v for k, v in batch.items()
                  if hasattr(v, "shape") and hasattr(v, "dtype")}
        return shard_datapoint(arrays, self.mesh)

    # -- loop -------------------------------------------------------------------

    def fit(self, train_iter_fn: Callable[[], Any], val_iter_fn=None,
            state: TrainState | None = None, resume: bool = True) -> TrainState:
        """Run the training loop.

        ``train_iter_fn()`` returns a fresh iterable of batch dicts per epoch
        (host numpy or jax arrays, NHWC).
        """
        from enhax.train.checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint

        start_epoch = 0
        if state is None:
            first = next(iter(train_iter_fn()))
            state = self.init_state(self._place(first))
            if resume and self.ckpt_dir:
                ck = latest_checkpoint(self.ckpt_dir)
                if ck:
                    state, start_epoch = load_checkpoint(ck, state)
                    state = self._restore_placement(state)
                    console.print(f"[trainer] resumed from {ck} (epoch {start_epoch})")

        best = None
        rng = jax.random.PRNGKey(self.seed)
        mode_sign = 1.0 if self.monitor[1] == "max" else -1.0
        t0 = time.perf_counter()

        # Preemption-aware save (SURVEY.md §5.3): on SIGTERM, finish the
        # current epoch, checkpoint, and return cleanly so the next run
        # auto-resumes.
        import signal

        def _on_sigterm(signum, frame):
            self._preempted = True
            console.print("[trainer] SIGTERM received — will checkpoint and stop")

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            prev_handler = None  # not the main thread

        overfit_cache = None
        for epoch in range(start_epoch, self.max_epochs):
            # -- train ---------------------------------------------------------
            epoch_metrics = []
            if self.overfit_batches:
                # repeat the same first-N batches every epoch (default.py:159)
                if overfit_cache is None:
                    it = iter(train_iter_fn())
                    overfit_cache = [b for _, b in
                                     zip(range(self.overfit_batches), it)]
                batches = overfit_cache
            else:
                batches = train_iter_fn()
            for bi, batch in enumerate(batches):
                if (self.limit_train_batches is not None
                        and bi >= self.limit_train_batches):
                    break
                rng, sub = jax.random.split(rng)
                state, metrics = self._train_step(state, self._place(batch), sub)
                if self.max_steps and state.step >= self.max_steps:
                    break
                if state.step % self.log_every_n_steps == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    console.print(f"[epoch {epoch}] step {state.step}: " +
                                  " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                epoch_metrics.append(metrics)

            row = {"epoch": epoch, "step": int(state.step),
                   "time": time.perf_counter() - t0}
            if epoch_metrics:
                stacked = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *epoch_metrics)
                row.update({f"train/{k}": float(v) for k, v in stacked.items()})

            # -- validate --------------------------------------------------------
            if val_iter_fn is not None:
                vit = val_iter_fn()
                if self.limit_val_batches is not None:
                    vit = (b for _, b in
                           zip(range(self.limit_val_batches), iter(vit)))
                # with EMA enabled, validate the shadow weights — BasicSR's
                # "net_g_ema is used only for testing ... and saving"
                eval_params = state.ema if state.ema is not None else state.params
                vals = [self._eval_step(eval_params, self._place(b))
                        for b in vit]
                if vals:
                    stacked = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *vals)
                    row.update({f"val/{k}": float(v) for k, v in stacked.items()})

            # -- metric-driven lr (torch ReduceLROnPlateau semantics) ------------
            if self.plateau is not None and self.plateau_monitor in row:
                from enhax.nn.optim import set_opt_learning_rate
                new_lr = self.plateau.step(row[self.plateau_monitor])
                state.opt_state = set_opt_learning_rate(state.opt_state, new_lr)
                row["lr"] = new_lr

            self.history.append(row)
            self._write_csv_log()
            for hook in self.hooks:
                hook(self, state, row)

            # -- checkpoint (reference ModelCheckpoint: best-on-monitor + last) --
            if self.ckpt_dir:
                key = f"val/{self.monitor[0]}"
                score = row.get(key)
                save_checkpoint(self.ckpt_dir, state, epoch, name="last")
                if score is not None and (best is None or
                                          mode_sign * score > mode_sign * best):
                    best = score
                    save_checkpoint(self.ckpt_dir, state, epoch, name="best")

            if self.max_steps and state.step >= self.max_steps:
                break
            # hooks may lower max_epochs (EarlyStopHook) — the range() above
            # snapshotted the original bound, so re-check it each epoch
            if epoch + 1 >= self.max_epochs:
                break
            if self._preempted:
                if self.ckpt_dir:
                    save_checkpoint(self.ckpt_dir, state, epoch, name="last")
                    console.print("[trainer] preemption checkpoint saved")
                break

        if prev_handler is not None:
            import signal
            signal.signal(signal.SIGTERM, prev_handler)
        return state

    def _write_csv_log(self):
        if not self.save_dir or not self.history:
            return
        import csv
        from pathlib import Path
        path = Path(self.save_dir) / "log.csv"
        path.parent.mkdir(parents=True, exist_ok=True)
        keys = sorted({k for row in self.history for k in row})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.history)
