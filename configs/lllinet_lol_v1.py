"""Training recipe mirroring reference src/mon/vision/enhance/llie/lllinet/config/lllinet_lol_v1.py.
"""

model = 'lllinet'
model_cfg = {}
data = 'lol_v1'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 384
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 1e-05, 'weight_decay': 0.0001, 'betas': (0.9, 0.999)}, 'lr_scheduler': {'scheduler': {'name': 'exponential_lr', 'gamma': 0.99}}}
trainer_cfg = {'max_epochs': 300, 'monitor': ('psnr', 'max')}
seed = 1234
