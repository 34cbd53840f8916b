"""Classification zoo (reference vision/classify/, ~70 registered variants)."""

from enhax.models.classify import base
from enhax.models.classify import resnet
from enhax.models.classify import vgg
from enhax.models.classify import mobilenet
from enhax.models.classify import simple
from enhax.models.classify import densenet
from enhax.models.classify import convnext
from enhax.models.classify import vit
from enhax.models.classify import swin
from enhax.models.classify import efficientnet
from enhax.models.classify import misc
from enhax.models.classify import inception
