"""NAFNet denoising on SIDD; use nafnet_local (TLC) for full-res eval."""
model = "nafnet"
model_cfg = {"width": 32, "middle_blk_num": 12,
             "enc_blk_nums": (2, 2, 4, 8), "dec_blk_nums": (2, 2, 2, 2)}
data = "sidd"
data_cfg = {"batch_size": 8, "shuffle": True, "drop_last": True}
image_size = 256
optimizer_cfg = {
    "optimizer": {"name": "adamw", "lr": 1e-3, "betas": (0.9, 0.9),
                  "weight_decay": 0.0},
    "lr_scheduler": {"scheduler": {"name": "cosine_annealing_lr",
                                   "t_max": 200, "eta_min": 1e-7}},
}
# ema_decay: BasicSR model_ema; NAFNet releases ship params_ema
trainer_cfg = {"max_epochs": 200, "monitor": ("psnr", "max"), "remat": True,
               "ema_decay": 0.999}
seed = 10
