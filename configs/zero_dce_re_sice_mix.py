"""Training recipe mirroring reference src/mon/vision/enhance/llie/zero_dce/config/zero_dce_re_sice_mix.py (refload-executed; see tests/test_config_fidelity.py).

max_epochs follows the upstream default.trainer (500); the config itself sets none.
"""

model = 'zero_dce_re'
model_cfg = {}
data = 'sice_mix'
data_cfg = {'batch_size': 8, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 500, 'monitor': ('psnr', 'max'), 'gradient_clip_val': 0.1}
seed = 100
