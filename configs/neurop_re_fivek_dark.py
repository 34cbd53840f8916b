"""Training recipe mirroring reference src/mon/vision/enhance/retouch/neurop/config/neurop_re_fivek_dark.py.

Upstream names data 'fivek_dark' without registering it (fivek.py registers init/a-e); enhax registers the darkened-FiveK variant so this recipe resolves.
"""

model = 'neurop_re'
model_cfg = {}
data = 'fivek_dark'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 0, 'betas': (0.9, 0.999)}}
trainer_cfg = {'max_steps': 600000, 'max_epochs': 10000, 'monitor': ('psnr', 'max')}
seed = 0
