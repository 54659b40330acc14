from .params import RingParam, TORUS_Q
from . import rq, rn, tn

__all__ = ["RingParam", "TORUS_Q", "rq", "rn", "tn"]
