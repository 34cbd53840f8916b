"""Training recipe mirroring reference src/mon/vision/enhance/multitask/hinet/config/hinet_re_rain13k.py (refload-executed; see tests/test_config_fidelity.py).

Uses the PSNR loss (upstream loss name psnr_loss).
"""

model = 'hinet_re'
model_cfg = {'num_channels': 64, 'depth': 5, 'relu_slope': 0.2, 'in_pos_left': 0, 'in_pos_right': 4}
data = 'rain13k'
data_cfg = {'batch_size': 32, 'shuffle': True, 'drop_last': True}
image_size = 256
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.0002, 'weight_decay': 0, 'betas': (0.9, 0.99)}, 'lr_scheduler': {'scheduler': {'name': 'cosine_annealing_lr', 'T_max': 400000, 'eta_min': 1e-07, 'last_epoch': -1}}}
trainer_cfg = {'max_epochs': 500, 'monitor': ('psnr', 'max')}
seed = 100
loss = 'psnr_loss'
