"""Inpainting models."""

from enhax.models.inpaint import lama
