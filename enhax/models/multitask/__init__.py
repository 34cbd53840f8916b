"""Multitask restoration models (deblur/denoise/derain/desnow/LES)."""

from enhax.models.multitask import hinet
from enhax.models.multitask import nafnet
from enhax.models.multitask import mprnet
from enhax.models.multitask import restormer
from enhax.models.multitask import uformer
from enhax.models.multitask import zero_restore
from enhax.models.multitask import airnet
from enhax.models.multitask import adair
