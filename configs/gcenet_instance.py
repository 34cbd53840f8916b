"""Training recipe mirroring reference src/mon/vision/enhance/llie/gcenet/config/gcenet_instance.py.

Instance (per-image test-time optimization) recipe: data is supplied at predict time (--data), matching the upstream config's empty data_name.
"""

model = 'gcenet_instance'
model_cfg = {'num_channels': 32}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 50, 'monitor': ('psnr', 'max')}
seed = 100
