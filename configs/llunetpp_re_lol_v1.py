"""Training recipe mirroring reference src/mon/vision/enhance/llie/llunetpp/config/llunet++_re_lol_v1.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'llunet++_re'
model_cfg = {'loss_weights': [0.4, 0.05, 0.15, 0.4]}
data = 'lol_v1'
data_cfg = {'batch_size': 4, 'shuffle': True}
image_size = 384
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 1e-05, 'weight_decay': 0.0001, 'betas': (0.9, 0.999), 'eps': 1e-08}, 'lr_scheduler': {'scheduler': {'name': 'exponential_lr', 'gamma': 0.99}}}
trainer_cfg = {'max_epochs': 300, 'monitor': ('psnr', 'max')}
seed = 1234
