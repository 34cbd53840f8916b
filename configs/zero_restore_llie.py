"""Training recipe mirroring reference src/mon/vision/enhance/multitask/zero_restore/config/zero_restore_llie.py (refload-executed; see tests/test_config_fidelity.py).

Zero-shot recipe: data supplied at predict time.
"""

model = 'zero_restore_llie'
model_cfg = {'num_channels': 64}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.001, 'weight_decay': 0.01, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 1000, 'monitor': ('psnr', 'max')}
seed = 100
