"""Zero-DCE on LOL-v1 (mirrors reference zero_dce/config/zero_dce_re_*.py)."""
model = "zero_dce_re"
model_cfg = {"num_channels": 32, "num_iters": 8}
data = "lol_v1"
data_cfg = {"batch_size": 8, "shuffle": True, "drop_last": True}
image_size = 256
optimizer_cfg = {
    "optimizer": {"name": "adam", "lr": 1e-4, "betas": (0.9, 0.999),
                  "weight_decay": 1e-4},
    "grad_clip_norm": 0.1,
}
trainer_cfg = {"max_epochs": 100, "monitor": ("psnr", "max")}
seed = 100
