"""Training recipe mirroring reference src/mon/vision/enhance/retouch/neurop/config/neurop_re_fivek_dark.py (refload-executed; see tests/test_config_fidelity.py).

Upstream names data 'fivek_dark' without registering it (fivek.py registers init/a-e); enhax registers the darkened-FiveK variant so this recipe resolves.
"""

model = 'neurop_re'
model_cfg = {'base_nf': 64, 'encode_nf': 32, 'pixel_weight': 10.0}
data = 'fivek_dark'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 0, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_steps': 600000, 'max_epochs': 500, 'monitor': ('psnr', 'max')}
seed = 0
