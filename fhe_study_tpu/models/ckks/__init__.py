from .encoder import Encoder
from . import ckks


def __getattr__(name):
    # lazy: ckks_rns / eval / poly / bootstrap / encoder_device
    if name in ("ckks_rns", "eval", "poly", "bootstrap", "encoder_device"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
