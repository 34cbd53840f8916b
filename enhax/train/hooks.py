"""Trainer hooks (the functional replacement of reference callbacks).

Hooks are callables ``hook(trainer, state, row)`` invoked after every epoch
(see Trainer.fit). Provided hooks mirror the reference callback set:

  * ``DebugImageHook`` — side-by-side input|enhanced|ref JPGs every n epochs
    (reference nn/model.py:969-993 log_images + enhance/base.py:79-126).
  * ``EarlyStopHook`` — stop on stagnant monitor (lightning EarlyStopping).
"""

from __future__ import annotations

import numpy as np

from enhax.constants import CALLBACKS, LOGGERS


@CALLBACKS.register(name="debug_image")
class DebugImageHook:
    """Write input|output|ref side-by-side debug images each n epochs."""

    def __init__(self, batch: dict, every_n_epochs: int = 1, max_items: int = 4,
                 out_key: str = "enhanced"):
        self.batch = batch
        self.every = max(every_n_epochs, 1)
        self.max_items = max_items
        self.out_key = out_key

    def __call__(self, trainer, state, row):
        epoch = row["epoch"]
        if epoch % self.every or not trainer.save_dir:
            return
        import jax.numpy as jnp
        from enhax.ops.io import write_image
        from enhax.utils.pathlib import Path

        outputs = trainer.model.apply(state.params, trainer._place(self.batch))
        pred = np.asarray(jnp.clip(outputs[self.out_key], 0, 1))
        image = np.asarray(self.batch["image"])
        ref = self.batch.get("ref_image")
        out_dir = Path(trainer.save_dir) / "debug" / f"epoch_{epoch:04d}"
        for i in range(min(self.max_items, pred.shape[0])):
            panels = [image[i], pred[i]]
            if ref is not None:
                panels.append(np.asarray(ref)[i])
            write_image(out_dir / f"{i:03d}.jpg", np.concatenate(panels, axis=1))


@CALLBACKS.register(name="early_stop", aliases=["early_stopping"])
class EarlyStopHook:
    """Set trainer.max_epochs to the current epoch when the monitored metric
    stops improving for ``patience`` epochs."""

    def __init__(self, monitor: str = "val/psnr", mode: str = "max",
                 patience: int = 10, min_delta: float = 1e-4):
        self.monitor = monitor
        self.sign = 1.0 if mode == "max" else -1.0
        self.patience = patience
        self.min_delta = min_delta
        self.best = None
        self.bad_epochs = 0

    def __call__(self, trainer, state, row):
        score = row.get(self.monitor)
        if score is None:
            return
        if self.best is None or self.sign * (score - self.best) > self.min_delta:
            self.best = score
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                trainer.max_epochs = row["epoch"]  # stop after this epoch


@LOGGERS.register(name="tensorboard", aliases=["tensorboard_logger"])
@CALLBACKS.register(name="tensorboard")
class TensorBoardHook:
    """TensorBoard scalar/image logging (reference nn/logger/tensorboard.py:34).

    Writes every row metric as a scalar; with ``image_batch`` set, also logs
    enhanced images every ``image_every_n_epochs``.
    """

    def __init__(self, log_dir=None, image_batch: dict | None = None,
                 image_every_n_epochs: int = 0, out_key: str = "enhanced"):
        self.log_dir = log_dir
        self.image_batch = image_batch
        self.image_every = image_every_n_epochs
        self.out_key = out_key
        self._writer = None

    def _get_writer(self, trainer):
        if self._writer is None:
            from flax.metrics import tensorboard as tb
            log_dir = self.log_dir or (str(trainer.save_dir) + "/tb")
            self._writer = tb.SummaryWriter(log_dir)
        return self._writer

    def __call__(self, trainer, state, row):
        w = self._get_writer(trainer)
        step = row.get("step", row["epoch"])
        for k, v in row.items():
            if isinstance(v, (int, float)) and k not in ("epoch", "step"):
                w.scalar(k, v, step)
        if (self.image_batch is not None and self.image_every
                and row["epoch"] % self.image_every == 0):
            import jax.numpy as jnp
            import numpy as np
            out = trainer.model.apply(state.params, trainer._place(self.image_batch))
            img = np.asarray(jnp.clip(out[self.out_key], 0, 1))[0]
            w.image(self.out_key, img, step)
        w.flush()


@CALLBACKS.register(name="progressive_training")
class ProgressiveTrainingHook:
    """Restormer-style progressive patch-size training
    (restormer-deraining.yml:27-30): after each epoch, set the datamodule's
    crop size and batch size for the next epoch from the schedule."""

    def __init__(self, datamodule, milestones, sizes, batch_sizes):
        self.dm = datamodule
        self.milestones = tuple(milestones)
        self.sizes = tuple(sizes)
        self.batch_sizes = tuple(batch_sizes)
        self.apply_for_epoch(0)

    def apply_for_epoch(self, epoch: int):
        from enhax.data.transforms import (
            Compose, RandomCrop, progressive_patch_schedule,
        )
        size, bs = progressive_patch_schedule(
            epoch, self.milestones, self.sizes, self.batch_sizes)
        self.dm.batch_size = bs
        # swap only the crop size; keep any other configured transforms
        # (flips, normalization) instead of silently discarding them
        existing = self.dm.transform
        rest = []
        if isinstance(existing, Compose):
            rest = [t for t in existing.transforms
                    if not isinstance(t, RandomCrop)]
        elif existing is not None and not isinstance(existing, RandomCrop):
            rest = [existing]
        self.dm.transform = Compose([RandomCrop(size)] + rest)
        if self.dm.train is not None and hasattr(self.dm.train, "transform"):
            self.dm.train.transform = self.dm.transform
        return size, bs

    def __call__(self, trainer, state, row):
        self.apply_for_epoch(row["epoch"] + 1)


@CALLBACKS.register(name="stochastic_weight_averaging")
class SWAHook:
    """Stochastic Weight Averaging (lightning ``StochasticWeightAveraging``,
    which the reference registers as ``stochastic_weight_averaging`` —
    reference nn/callback/base.py:29,76).

    From ``swa_epoch_start`` (a fraction of ``max_epochs``, or an absolute
    epoch) on, keeps the running mean of the float params at every epoch
    end. ``swa_params`` exposes the averaged weights; when the trainer has
    a ``ckpt_dir`` they are also checkpointed under ``swa/`` next to
    best/last after each update.
    """

    def __init__(self, swa_epoch_start: float | int = 0.8):
        self.swa_epoch_start = swa_epoch_start
        self.swa_params = None
        self.n_averaged = 0

    def _start_epoch(self, trainer) -> int:
        s = self.swa_epoch_start
        return int(s) if s >= 1 else int(s * trainer.max_epochs)

    def __call__(self, trainer, state, row):
        import jax

        if row["epoch"] < self._start_epoch(trainer):
            return
        params = state.params
        if self.swa_params is None:
            # copy, not alias: the jitted train step donates state.params
            # buffers on the next step, which would invalidate an aliased
            # snapshot
            import jax.numpy as jnp
            self.swa_params = jax.tree_util.tree_map(jnp.copy, params)
            self.n_averaged = 1
        else:
            import jax.numpy as jnp
            n = self.n_averaged

            def avg(a, p):
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                    return (a * n + p) / (n + 1)
                return p

            self.swa_params = jax.tree_util.tree_map(avg, self.swa_params,
                                                     params)
            self.n_averaged += 1
        if trainer.ckpt_dir:
            from enhax.train.checkpoints import save_checkpoint
            from enhax.train.trainer import TrainState
            save_checkpoint(trainer.ckpt_dir,
                            TrainState(state.step, self.swa_params,
                                       state.opt_state),
                            row["epoch"], name="swa")


@CALLBACKS.register(name="learning_rate_monitor")
class LearningRateMonitorHook:
    """Record the current learning rate into the epoch row / CSV log
    (lightning ``LearningRateMonitor``, reference nn/callback/base.py:33).

    Reads, in order: an explicit ``schedule`` callable evaluated at the
    current step, or the ``learning_rate`` hyperparam in ``opt_state``
    (present when the optimizer was built under
    ``optax.inject_hyperparams``, e.g. the plateau path).
    """

    def __init__(self, schedule=None, key: str = "lr"):
        self.schedule = schedule
        self.key = key

    @staticmethod
    def _find_injected(s):
        if hasattr(s, "_fields"):
            if "hyperparams" in s._fields and isinstance(s.hyperparams, dict) \
                    and "learning_rate" in s.hyperparams:
                return s.hyperparams["learning_rate"]
            for f in s._fields:
                got = LearningRateMonitorHook._find_injected(getattr(s, f))
                if got is not None:
                    return got
        elif isinstance(s, tuple):
            for x in s:
                got = LearningRateMonitorHook._find_injected(x)
                if got is not None:
                    return got
        return None

    def __call__(self, trainer, state, row):
        if self.key in row:
            return
        if self.schedule is not None:
            row[self.key] = float(self.schedule(int(state.step)))
            return
        lr = self._find_injected(state.opt_state)
        if lr is not None:
            row[self.key] = float(lr)


@CALLBACKS.register(name="timer")
class TimerHook:
    """Stop training when a wall-clock budget is exhausted (lightning
    ``Timer``): sets trainer.max_epochs once ``duration`` seconds have
    elapsed since construction; always records cumulative ``elapsed_s``."""

    def __init__(self, duration: float | None = None):
        import time
        self.t0 = time.perf_counter()
        self.duration = duration

    def __call__(self, trainer, state, row):
        import time
        elapsed = time.perf_counter() - self.t0
        row["elapsed_s"] = round(elapsed, 3)
        if self.duration is not None and elapsed >= self.duration:
            trainer.max_epochs = row["epoch"]


@CALLBACKS.register(name="model_checkpoint")
class ModelCheckpointHook:
    """Config-name compatibility with the reference's ``model_checkpoint``
    callback (nn/callback/model_checkpoint.py:35): checkpointing itself is
    built into Trainer.fit (best-on-monitor + last); this hook re-points
    the trainer's monitor/ckpt_dir from a config dict at first epoch end."""

    def __init__(self, monitor: str = "val/psnr", mode: str = "max",
                 dirpath: str | None = None):
        self.monitor = monitor.split("/")[-1]
        self.mode = mode
        self.dirpath = dirpath
        self._applied = False

    def __call__(self, trainer, state, row):
        if self._applied:
            return
        trainer.monitor = (self.monitor, self.mode)
        if self.dirpath:
            trainer.ckpt_dir = self.dirpath
        self._applied = True


@LOGGERS.register(name="csv", aliases=["csv_logger", "log_training_progress"])
class CSVLogHook:
    """Standalone CSV epoch logger to a custom path (lightning CSVLogger /
    the reference's LogTrainingProgress, nn/callback/console_logging.py:38).
    The Trainer already writes ``save_dir/log.csv``; use this to mirror
    rows elsewhere (e.g. a shared experiment dir)."""

    def __init__(self, path: str):
        self.path = path
        self._fieldnames: list | None = None

    def __call__(self, trainer, state, row):
        import csv
        from enhax.utils.pathlib import Path
        p = Path(self.path)
        p.parent.mkdir(parents=True, exist_ok=True)
        flat = {k: v for k, v in row.items() if isinstance(v, (int, float, str))}
        # Freeze fieldnames at the first row: later rows gaining keys
        # (val/* only on validation epochs, 'lr' after the first plateau
        # step) must not silently misalign with the written header; rewrite
        # the file with the union of keys when new columns appear.
        if self._fieldnames is not None and any(
                k not in self._fieldnames for k in flat):
            import io
            old_rows = []
            if p.exists():
                with open(p, newline="") as fh:
                    old_rows = list(csv.DictReader(fh))
            self._fieldnames += [k for k in flat if k not in self._fieldnames]
            with open(p, "w", newline="") as fh:
                w = csv.DictWriter(fh, fieldnames=self._fieldnames,
                                   restval="", extrasaction="ignore")
                w.writeheader()
                w.writerows(old_rows)
                w.writerow(flat)
            return
        with open(p, "a", newline="") as fh:
            if self._fieldnames is None:
                self._fieldnames = list(flat)
                w = csv.DictWriter(fh, fieldnames=self._fieldnames,
                                   restval="", extrasaction="ignore")
                w.writeheader()
            else:
                w = csv.DictWriter(fh, fieldnames=self._fieldnames,
                                   restval="", extrasaction="ignore")
            w.writerow(flat)
