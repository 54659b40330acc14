from . import modops, ntt
