"""Training recipe mirroring reference src/mon/vision/enhance/retouch/neurop/config/neurop_re_fivek_e.py.
"""

model = 'neurop_re'
model_cfg = {}
data = 'fivek_e'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 0, 'betas': (0.9, 0.999)}}
trainer_cfg = {'max_steps': 600000, 'max_epochs': 10000, 'monitor': ('psnr', 'max')}
seed = 0
