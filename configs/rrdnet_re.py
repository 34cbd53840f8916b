"""Training recipe mirroring reference src/mon/vision/enhance/llie/rrdnet/config/rrdnet_re.py (refload-executed; see tests/test_config_fidelity.py).

Instance retinex recipe: data supplied at predict time.
"""

model = 'rrdnet_re'
model_cfg = {'gamma': 0.4, 'illu_factor': 1, 'reflect_factor': 1, 'noise_factor': 5000}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 1000, 'monitor': ('psnr', 'max')}
seed = 100
