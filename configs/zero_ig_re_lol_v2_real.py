"""Training recipe mirroring reference src/mon/vision/enhance/llie/zero_ig/config/zero_ig_re_lol_v2_real.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'zero_ig_re'
model_cfg = {'num_channels': 64, 'embed_channels': 48}
data = 'lol_v2_real'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.0003, 'weight_decay': 0.0003, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 2000, 'monitor': ('psnr', 'max')}
seed = 2
