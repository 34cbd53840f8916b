"""Training recipe mirroring reference src/mon/vision/enhance/llie/colie/config/colie_re.py (refload-executed; see tests/test_config_fidelity.py).

Instance INR recipe: data supplied at predict time (upstream config's empty data_name). The upstream per-term weight_decay list [0.1, 1e-4, 1e-3] is the CoLIE loss weighting, carried inside the enhax colie loss.
"""

model = 'colie_re'
model_cfg = {'window_size': 7, 'down_size': 256, 'num_layers': 4, 'hidden_dim': 256, 'add_layer': 2, 'weight_decay': [0.1, 0.0001, 0.001], 'L': 0.3, 'alpha': 1, 'beta': 20, 'gamma': 8, 'delta': 5}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 200, 'monitor': ('psnr', 'max')}
seed = 100
