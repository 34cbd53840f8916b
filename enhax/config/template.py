"""Config template — a config IS a Python module (reference config/config.py).

Copy this file, edit values, and pass it to the CLI:
    python -m enhax.cli.train --config my_config.py

Flags given on the command line override config values
(reference train.py:113-131 precedence).
"""

# --- identity ----------------------------------------------------------------
model_name = "zero_dce_re"       # registered model name (enhax.MODELS)
data_name = "lol_v1"             # registered datamodule name (enhax.DATAMODULES)
fullname = "zero_dce_re_lol_v1"
root = None                      # dataset root dir (defaults to $DATA_DIR)
seed = 0
image_size = 256                 # train crop size

# --- model -------------------------------------------------------------------
model = "zero_dce_re"
model_cfg = {
    # ctor kwargs for the registered model builder
    "num_channels": 32,
    "num_iters": 8,
}

# --- data --------------------------------------------------------------------
data = "lol_v1"
data_cfg = {
    "batch_size": 8,
    "shuffle": True,
    "drop_last": True,
}

# --- optimizer (reference-style declarative dict) -----------------------------
optimizer_cfg = {
    "optimizer": {"name": "adam", "lr": 1e-4, "betas": (0.9, 0.999),
                  "weight_decay": 1e-4},
    "lr_scheduler": {"scheduler": {"name": "cosine_annealing_lr",
                                   "t_max": 100, "eta_min": 1e-6}},
    "grad_clip_norm": 1.0,
}

# --- trainer -----------------------------------------------------------------
trainer_cfg = {
    "max_epochs": 100,
    "monitor": ("psnr", "max"),
    "log_every_n_steps": 50,
}
