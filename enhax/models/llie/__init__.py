"""Low-light image enhancement models."""

from enhax.models.llie import zero_dce
from enhax.models.llie import gcenet
from enhax.models.llie import colie
from enhax.models.llie import hvi_cidnet
from enhax.models.llie import lyt_net
from enhax.models.llie import llunetpp
from enhax.models.llie import lllinet
from enhax.models.llie import psenet
from enhax.models.llie import rrdnet
from enhax.models.llie import rsfnet
from enhax.models.llie import zero_ig
from enhax.models.llie import zero_mie
from enhax.models.llie import retinexformer
from enhax.models.llie import sci
from enhax.models.llie import ruas
from enhax.models.llie import uretinexnet
