"""Training recipe mirroring reference src/mon/vision/enhance/llie/psenet/config/psenet_sice_mix.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'psenet'
model_cfg = {'base_channels': 16, 'tv_weight': 5, 'gamma_lower': -2, 'gamma_upper': 3, 'number_refs': 1}
data = 'sice_mix'
data_cfg = {'batch_size': 64, 'shuffle': True}
image_size = 256
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.0005, 'betas': (0.9, 0.999)}}
trainer_cfg = {'max_epochs': 140, 'monitor': ('psnr', 'max')}
seed = 42
