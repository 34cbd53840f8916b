"""Training recipe mirroring reference src/mon/vision/enhance/llie/gcenet/config/gcenet_zsn2n_ulol.py.
"""

model = 'gcenet_zsn2n'
model_cfg = {'num_channels': 32}
data = 'ulol'
data_cfg = {'batch_size': 8, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 50, 'monitor': ('psnr', 'max')}
seed = 100
