"""HVI-CIDNet supervised LLIE on LOL-v1 (batch 1-2 per the paper note)."""
model = "hvi_cidnet_re"
model_cfg = {"channels": (36, 36, 72, 144), "heads": (1, 2, 4, 8),
             "hvi_weight": 1.0}
data = "lol_v1"
data_cfg = {"batch_size": 2, "shuffle": True, "drop_last": True}
image_size = 256
optimizer_cfg = {
    "optimizer": {"name": "adam", "lr": 1e-4},
    "lr_scheduler": {"scheduler": {"name": "cosine_annealing_lr",
                                   "t_max": 300, "eta_min": 1e-7}},
}
trainer_cfg = {"max_epochs": 300, "monitor": ("psnr", "max")}
seed = 42
