"""Canonical default config dicts.

Rebuild of reference ``config/default.py:29-228``: trainer, datamodule and
predictor defaults, translated to the enhax runtime (no Lightning knobs; the
sharding mesh replaces accelerator/strategy/devices).
"""

from __future__ import annotations

from enhax.constants import RUN_DIR

DEFAULT_TRAINER = {
    "max_epochs": 100,
    "max_steps": None,
    "monitor": ("psnr", "max"),
    "log_every_n_steps": 50,
    "log_image_every_n_epochs": 0,
    "seed": 0,
    # reference trainer surface (config/default.py:141-159)
    "gradient_clip_val": None,
    "gradient_clip_algorithm": "norm",
    "accumulate_grad_batches": 1,
    "limit_train_batches": None,
    "limit_val_batches": None,
    "overfit_batches": 0,
    "fast_dev_run": False,
}

DEFAULT_DATAMODULE = {
    "batch_size": 8,
    "shuffle": True,
    "drop_last": False,
    # thread-pool sample decode (reference datamodule.py:85-90 uses
    # 4 x devices torch workers; threads suffice here — cv2 drops the GIL)
    "num_workers": 4,
}

DEFAULT_PREDICTOR = {
    "image_size": None,
    "resize": False,
    "tile": None,
    "save_image": True,
    "save_debug": False,
}

DEFAULT_OPTIMIZER = {
    "optimizer": {"name": "adam", "lr": 1e-4, "betas": (0.9, 0.999)},
    "grad_clip_norm": None,
}


def default_save_dir(mode: str, arch: str, model: str, data: str):
    """run/{train,predict}/{arch}/{model}/{data} (reference core/utils.py:651)."""
    return RUN_DIR / mode / arch / model / data
