"""R = Z[X]/(X^N+1): exact integer polynomial arithmetic on int64 [..., n].

Mirror of the reference's `R` ring (reference arith/src/ring_n.rs), used by the
BFV tensor/relinearization path which must avoid premature mod-q wraps
(reference bfv/src/lib.rs:59-85).

Products are exact as long as the true (i128-sized in the reference)
coefficients fit in the chosen path:
  * `naive_mul`: dense outer-product + anti-diagonal reduction, exact while
    every unreduced coefficient fits in int64 — true for all reference test
    parameters.  O(n^2), meant for the parity/test path.
  * `ntt.polymul_i64_crt`: 2-prime CRT NTT, exact for |c| < ~2^60.7, O(n log n)
    — the device/bench path.
Coefficients larger than that are handled by the scheme code via limb
splitting (see models/bfv.py).
"""

import jax.numpy as jnp

from ..ops import ntt
from ..utils.rounding import round_half_away
from . import rq


def from_rq(a):
    """Rq -> R: representatives in [0, q) as i64 (reference ring_n.rs:72-79)."""
    return a.astype(jnp.int64)


def reduce_negacyclic(c, n: int):
    """mod (X^n+1) over Z: p[i-n] -= p[i] (reference ring_n.rs:142-151)."""
    while c.shape[-1] > n:
        length = c.shape[-1]
        m = min(n, length - n)
        head, tail = c[..., :n], c[..., n:n + m]
        pad = [(0, 0)] * (c.ndim - 1) + [(0, n - m)]
        folded = head - jnp.pad(tail, pad)
        rest = c[..., n + m:]
        c = jnp.concatenate([folded, rest], axis=-1) if rest.shape[-1] else folded
    return c


def conv_full(a, b):
    """Full linear convolution -> [..., 2n-1], int64 exact (no reduction).
    (reference naive_mul, ring_n.rs:307-320)"""
    n = a.shape[-1]
    prod = a[..., :, None] * b[..., None, :]            # [..., n, n]
    i = jnp.arange(n)[:, None] + jnp.arange(n)[None, :]  # i+j
    out = jnp.zeros(a.shape[:-1] + (2 * n - 1,), dtype=jnp.int64)
    return out.at[..., i].add(prod)


def naive_mul(a, b):
    """Unreduced 2n-1 coefficient product (reference ring_n.rs:307-320)."""
    return conv_full(a, b)


def naive_poly_mul(a, b):
    """Product reduced mod (X^n+1) (reference ring_n.rs:265-292)."""
    n = a.shape[-1]
    return reduce_negacyclic(conv_full(a, b), n)


def mul(a, b):
    return naive_poly_mul(a, b)


def mod_centered_q(a, q: int):
    """coeff mod q, then centered: res > q/2 -> res - q (ring_n.rs:113-128).
    Note the reference uses Rust `%` (truncated toward zero) on possibly
    negative values; we reproduce that."""
    qq = jnp.int64(q)
    r = jnp.sign(a) * (jnp.abs(a) % qq)    # Rust truncated remainder
    return jnp.where(r > q // 2, r - qq, r)


def mul_div_round_to_rq(v, num: int, den: int, q: int, n: int):
    """round(num*v/den) per coeff (f64), then into Rq (ring_n.rs:130-138)."""
    r = round_half_away(float(num) * v.astype(jnp.float64) / float(den))
    return rq.from_i64(r.astype(jnp.int64), q, n)


def to_rq(a, q: int, n: int):
    return rq.from_i64(a, q, n)


def infinity_norm(a):
    return jnp.max(jnp.abs(a), axis=-1).astype(jnp.uint64)
