"""Restormer deraining on Rain13k with progressive patch sizes
(reference restormer-deraining.yml:27-30)."""
model = "restormer"
model_cfg = {"dim": 48, "num_blocks": (4, 6, 6, 8), "heads": (1, 2, 4, 8)}
data = "rain13k"
data_cfg = {"batch_size": 8, "shuffle": True, "drop_last": True}
# progressive schedule consumed via enhax.data.transforms.progressive_patch_schedule
progressive = {"milestones": (0, 92, 156, 204, 240),
               "sizes": (128, 160, 192, 256, 384),
               "batch_sizes": (8, 5, 4, 2, 1)}
optimizer_cfg = {
    "optimizer": {"name": "adamw", "lr": 3e-4, "betas": (0.9, 0.999),
                  "weight_decay": 1e-4},
    "lr_scheduler": {"scheduler": {"name": "cosine_annealing_restart_cyclic_lr",
                                   "periods": [92, 208],
                                   "restart_weights": [1.0, 1.0],
                                   "eta_mins": [3e-4, 1e-6]}},
}
# ema_decay: BasicSR model_ema (image_restoration_model.py:81-88); released
# Restormer checkpoints ship the shadow as params_ema (converter unwraps it)
trainer_cfg = {"max_epochs": 300, "monitor": ("psnr", "max"), "remat": True,
               "ema_decay": 0.999}
seed = 10
