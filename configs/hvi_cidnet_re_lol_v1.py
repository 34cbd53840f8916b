"""Training recipe mirroring reference src/mon/vision/enhance/llie/hvi_cidnet/config/hvi_cidnet_re_lol_v1.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'hvi_cidnet_re'
model_cfg = {'channels': [36, 36, 72, 144], 'heads': [1, 2, 4, 8], 'norm': False, 'hvi_weight': 1.0, 'loss_weights': [1.0, 0.5, 50.0, 0.01]}
data = 'lol_v1'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 256
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 0.0001}, 'lr_scheduler': {'scheduler': {'name': 'gradual_warmup_scheduler', 'multiplier': 1, 'total_epoch': 3, 'after_scheduler': {'name': 'cosine_annealing_restart_lr', 'periods': [997], 'restart_weights': [1], 'eta_min': 1e-07}}}}
trainer_cfg = {'max_epochs': 1000, 'monitor': ('psnr', 'max')}
seed = 1000000
