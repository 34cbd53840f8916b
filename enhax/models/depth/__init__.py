"""Depth estimation models."""

from enhax.models.depth import depth_anything_v2
from enhax.models.depth import depth_pro
