"""HINet deblurring on GoPro (BASELINE.md config 3)."""
model = "hinet_re"
model_cfg = {"num_channels": 64, "depth": 5}
data = "gopro"
data_cfg = {"batch_size": 8, "shuffle": True, "drop_last": True}
image_size = 256
optimizer_cfg = {
    "optimizer": {"name": "adam", "lr": 2e-4, "betas": (0.9, 0.999)},
    "lr_scheduler": {"scheduler": {"name": "cosine_annealing_restart_lr",
                                   "periods": [100, 100],
                                   "restart_weights": [1.0, 0.5],
                                   "eta_min": 1e-7}},
}
trainer_cfg = {"max_epochs": 200, "monitor": ("psnr", "max")}
seed = 10
