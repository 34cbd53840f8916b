"""Training recipe mirroring reference src/mon/vision/enhance/llie/colie/config/colie_hvid.py.

Instance INR recipe: data supplied at predict time (upstream config's empty data_name). The upstream per-term weight_decay list [0.1, 1e-4, 1e-3] is the CoLIE loss weighting, carried inside the enhax colie loss.
"""

model = 'colie_hvid'
model_cfg = {}
data = None
data_cfg = {'batch_size': 1}
image_size = 512
optimizer_cfg = {'optimizer': {'name': 'adam', 'lr': 5e-05, 'weight_decay': 1e-05, 'betas': (0.9, 0.99)}}
trainer_cfg = {'max_epochs': 200, 'monitor': ('psnr', 'max')}
seed = 100
