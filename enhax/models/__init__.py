"""Model zoo (TPU-native rebuild of ``src/mon/vision/`` + ``src/mon/nn/model.py``).

Importing this package registers every model into ``enhax.MODELS``.
"""

from enhax.models.base import Model, build_model
from enhax.models import llie
from enhax.models import denoise
from enhax.models import dehaze
from enhax.models import multitask
from enhax.models import retouch
from enhax.models import classify
from enhax.models import sr
from enhax.models import segment
from enhax.models import depth
from enhax.models import detect
from enhax.models import inpaint
