"""Training recipe mirroring reference src/mon/vision/enhance/llie/zero_mie/config/zero_mie_ms_wo_spar.py (refload-executed; see tests/test_config_fidelity.py).
"""

model = 'zero_mie_ms_wo_spar'
model_cfg = {'color_space': 'hsv_d', 'window_size': [3, 5, 7], 'hidden_channels': 256, 'down_size': 256, 'hidden_layers': 2, 'out_layers': 1, 'omega_0': 30.0, 'first_bias_scale': None, 'nonlinear': 'sine', 'use_ff': True, 'ff_gaussian_scale': 10, 'edge_threshold': 0.05, 'depth_gamma': 0, 'gf_radius': 3, 'use_denoise': False, 'denoise_ksize': [3, 3], 'denoise_color': 0.1, 'denoise_space': [1.5, 1.5], 'loss_hsv': True, 'exp_mean': 0.3, 'exp_weight': 8, 'spa_weight': 0, 'tv_weight': 20, 'spar_weight': 0, 'depth_weight': 1, 'edge_weight': 1, 'color_weight': 5}
data = 'fivek_e'
data_cfg = {'batch_size': 1, 'shuffle': True}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 200, 'monitor': ('psnr', 'max')}
seed = 100
