"""Training recipe mirroring reference src/mon/vision/enhance/llie/lyt_net/config/lyt_net_re_lol_v2_real.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'lyt_net_re'
model_cfg = {'filters': 32}
data = 'lol_v2_real'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 256
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.0002, 'weight_decay': 0, 'betas': (0.9, 0.999), 'eps': 1e-08}, 'lr_scheduler': {'scheduler': {'name': 'cosine_annealing_lr', 'T_max': 1500}}}
trainer_cfg = {'max_epochs': 1500, 'monitor': ('psnr', 'max')}
seed = 1
