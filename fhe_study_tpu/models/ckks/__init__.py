from .encoder import Encoder
from . import ckks
