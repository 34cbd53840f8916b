"""Super-resolution models."""

from enhax.models.sr import srno
from enhax.models.sr import diinn
