"""BFV noise-growth bounds (the reference's only written-down noise analysis).

The reference carries these formulas in a commented-out test
(reference bfv/src/lib.rs:379-502): the fresh-encryption bound
q/(2t) − r_t(q)/2 (lib.rs:423) and the multiplication bound built from the
expansion factor δ = 2√n (lib.rs:436-443).  Here they are a usable API:
estimate bounds, measure actual noise, assert headroom — the analysis
machinery the reference sketched but never wired up.
"""

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..arith import rq
from ..ops import modops, ntt


@dataclass(frozen=True)
class NoiseBounds:
    fresh_bound: float       # |v| must stay below this for decryption
    mul_bound: float         # bound after one multiplication (2021/204 form)
    rt: float                # r_t(q)/t


def bounds(q: int, n: int, t: int, b_key: float = 1.0) -> NoiseBounds:
    """Reference formulas (bfv/src/lib.rs:419-443)."""
    rt = (q % t) / t
    fresh = q / (2.0 * t) - rt / 2.0
    ef = 2.0 * math.sqrt(n)                 # expansion factor δ
    v = fresh - 1.0                         # max admissible operand noise
    mul = ((ef * t) / 2.0) * ((2.0 * v * v) / q
                              + (4.0 + ef * b_key) * (v + v)
                              + rt * (ef * b_key + 5.0)) \
        + (1.0 + ef * b_key + ef * ef * b_key * b_key) / 2.0
    return NoiseBounds(fresh_bound=fresh, mul_bound=mul, rt=rt)


def measure_noise(param, sk, ct, m):
    """∞-norm of v = (c0 + c1·s) − Δ·m  mod q, centered — the reference's
    `infinity_norm` probe applied to the decryption relation."""
    q, n, t = param.ring.q, param.ring.n, param.t
    cs = rq.add(ct.c0,
                ntt.intt(modops.mulmod(ntt.ntt(ct.c1, q), sk.s_evals, q), q), q)
    dm = rq.scalar_mul_u64(modops.coerce_u64(m, q), q // t, q)
    v = rq.sub(cs, dm, q)
    return rq.infinity_norm(v, q)


def fresh_noise_ok(param, sk, ct, m) -> bool:
    nb = bounds(param.ring.q, param.ring.n, param.t)
    return bool((jnp.max(measure_noise(param, sk, ct, m)) < nb.fresh_bound))
