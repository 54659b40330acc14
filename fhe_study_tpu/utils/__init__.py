from .rounding import round_half_away, round_half_away_int
from . import prng

__all__ = ["round_half_away", "round_half_away_int", "prng"]
