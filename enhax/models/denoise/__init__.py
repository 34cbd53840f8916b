"""Denoising models."""

from enhax.models.denoise import zsn2n
from enhax.models.denoise import tv_denoise
