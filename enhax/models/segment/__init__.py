"""Segmentation models."""

from enhax.models.segment import unet
from enhax.models.segment import deeplabv3
from enhax.models.segment import sam
from enhax.models.segment import sam2
from enhax.models.segment import sam2_hiera
from enhax.models.segment import mobile_sam
