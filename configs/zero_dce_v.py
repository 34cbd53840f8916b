"""Training recipe mirroring reference src/mon/vision/enhance/llie/zero_dce/config/zero_dce_v.py (refload-executed; see tests/test_config_fidelity.py).

Instance recipe: data supplied at predict time.
"""

model = 'zero_dce_v'
model_cfg = {'num_channels': 32, 'num_iters': 15, 'down_size': 256}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 200, 'monitor': ('psnr', 'max')}
seed = 100
