"""Dehazing models."""

from enhax.models.dehaze import zid
