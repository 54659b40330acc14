"""Static ring parameters (hashable -> jit cache keys).

Mirror of the reference's RingParam (reference arith/src/ring.rs:7-10), but
kept as a frozen dataclass so it can be closed over by jitted functions.
"""

from dataclasses import dataclass

TORUS_Q = 0xFFFFFFFFFFFFFFFF  # the reference uses q = u64::MAX as the torus tag


@dataclass(frozen=True)
class RingParam:
    q: int
    n: int

    def __post_init__(self):
        assert self.n >= 1
        assert 1 < self.q <= TORUS_Q
