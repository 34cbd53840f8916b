"""Inpainting models."""

from enhax.models.inpaint import lama
from enhax.models.inpaint import sd_inpaint
