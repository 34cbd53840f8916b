"""Neural-network layer: losses, metrics, layers, optimizers, schedules.

TPU-native rebuild of the reference's ``src/mon/nn/`` — functional JAX
losses/metrics, flax.linen layer library, optax-based optimizers with the
reference's custom schedules, and the INR stack.
"""

from enhax.nn import losses
from enhax.nn import metrics
from enhax.nn import metrics_cls  # classification metric wrappers
from enhax.nn import metrics_reg  # regression metric wrappers
from enhax.nn import metrics_nom  # nominal metric wrappers
from enhax.nn import metrics_img  # extended image metrics
from enhax.nn import optim
from enhax.nn import layers
from enhax.nn import inr
from enhax.nn import niqe as _niqe_mod  # registers "niqe" metric
from enhax.nn.niqe import niqe, niqe_features, fit_niqe_params, make_niqe
from enhax.nn import brisque as _brisque_mod  # registers "brisque"
from enhax.nn.brisque import brisque, brisque_features, brisque_score
from enhax.nn import fid as _fid_mod  # registers "fid"
from enhax.nn.fid import fid, fid_from_features, frechet_distance
from enhax.nn.losses import *  # noqa: F401,F403
from enhax.nn.metrics import psnr, ssim, ms_ssim, mae, mse, rmse
