"""Training recipe mirroring reference src/mon/vision/enhance/llie/zero_mie/config/zero_mie_ms_wo_tv.py.
"""

model = 'zero_mie_ms_wo_tv'
model_cfg = {'window_size': 7, 'hidden_channels': 256, 'down_size': 256}
data = 'fivek_e'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 200, 'monitor': ('psnr', 'max')}
seed = 100
