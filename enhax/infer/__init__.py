"""Batched inference engine: padding, bucketing, instance-mode, tiling, TLC."""

from enhax.infer.engine import Predictor, make_instance_infer
from enhax.infer.tiling import tiled_apply
