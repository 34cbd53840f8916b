"""Training recipe mirroring reference src/mon/vision/enhance/retouch/neurop/config/neurop_init.py.
"""

model = 'neurop_init'
model_cfg = {}
data = 'fivek_init'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 0, 'betas': (0.9, 0.999)}}
trainer_cfg = {'max_steps': 100000, 'max_epochs': 10000, 'monitor': ('psnr', 'max')}
seed = 0
