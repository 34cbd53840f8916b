"""Retouch models."""

from enhax.models.retouch import neurop
