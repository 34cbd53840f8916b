"""Trainer hooks (the functional replacement of reference callbacks).

Hooks are callables ``hook(trainer, state, row)`` invoked after every epoch
(see Trainer.fit). Provided hooks mirror the reference callback set:

  * ``DebugImageHook`` — side-by-side input|enhanced|ref JPGs every n epochs
    (reference nn/model.py:969-993 log_images + enhance/base.py:79-126).
  * ``EarlyStopHook`` — stop on stagnant monitor (lightning EarlyStopping).
"""

from __future__ import annotations

import numpy as np

from enhax.constants import CALLBACKS


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


@CALLBACKS.register(name="early_stop")
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
