"""enhax — a TPU-native image enhancement & restoration framework.

enhax is a from-scratch, TPU-first (JAX/XLA/Pallas) framework with the
capabilities of SKKUAutoLab/ETSS-07-ImageEnhance (the ``mon`` framework):
low-light enhancement, denoising, deblurring, dehazing, deraining, desnowing,
retouch and SR model zoos, a dataset/datamodule layer, zero-reference loss
toolkit, metrics, a training loop and a batched inference engine.

Design stance (see SURVEY.md §7):
  * functional core — models are pure ``apply(params, datapoint) -> outputs``
  * NHWC layout everywhere (TPU-native), images are float arrays in [0, 1]
  * one datapoint convention: ``dict[str, Array]`` with keys like
    ``image``, ``ref_image``, ``depth``
  * parallelism via ``jax.sharding.Mesh`` + NamedSharding (data + spatial),
    not process-group strategies
"""

__version__ = "0.1.0"

from enhax import constants
from enhax.constants import (
    Task, Scheme, Split, RunMode,
    MODELS, DATASETS, DATAMODULES, LOSSES, METRICS, OPTIMIZERS,
    LR_SCHEDULERS, CALLBACKS, TRANSFORMS, FILE_HANDLERS,
)
from enhax.registry import Registry, ModelRegistry
# Importing subpackages populates the registries (losses, metrics, models,
# datasets register themselves at import time, like the reference's
# mon/__init__ chain).
from enhax import utils  # noqa: E402  (registers file handlers)
from enhax import ops  # noqa: E402
from enhax import nn  # noqa: E402  (registers losses/metrics/optimizers)
from enhax import models  # noqa: E402  (registers models)
from enhax import data  # noqa: E402  (registers datasets/datamodules)
from enhax import parallel  # noqa: E402  (registers mesh strategies)
from enhax import train  # noqa: E402  (registers callbacks/loggers)
from enhax import track  # noqa: E402  (registers trackers/motions)
from enhax.models.base import Model, build_model  # noqa: E402
