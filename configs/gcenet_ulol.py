"""Training recipe mirroring reference src/mon/vision/enhance/llie/gcenet/config/gcenet_ulol.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'gcenet'
model_cfg = {'num_channels': 32, 'num_iters': 8, 'dba_eps': 0.05, 'gf_radius': 3, 'gf_eps': 0.0001, 'bam_gamma': 2.6, 'bam_ksize': 9, 'use_depth': True, 'use_edge': True}
data = 'ulol'
data_cfg = {'batch_size': 16, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 50, 'monitor': ('psnr', 'max')}
seed = 100
