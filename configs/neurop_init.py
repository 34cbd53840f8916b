"""Training recipe mirroring reference src/mon/vision/enhance/retouch/neurop/config/neurop_init.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'neurop_init'
model_cfg = {'base_nf': 64, 'encode_nf': 32}
data = 'fivek_init'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 0, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_steps': 100000, 'max_epochs': 500, 'monitor': ('psnr', 'max')}
seed = 0
