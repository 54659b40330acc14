"""Vectorized Z_q arithmetic on uint64 arrays.

TPU-first substrate replacing the reference's scalar ``Zq`` type
(reference arith/src/zq.rs).  There is no native 64x64->128 multiply on TPU
(or in XLA), so:

  * q < 2^32 (every NTT modulus and every reference test modulus): products of
    canonical representatives fit exactly in u64 -> plain ``(a * b) % q``.
  * 2^32 <= q < 2^63, q odd (e.g. the BFV relinearization modulus p*q):
    Montgomery multiplication built on a 32-bit-limb mul128.

All functions operate elementwise on arrays of any shape; ``q`` is a static
Python int baked into the jit cache.
"""

from functools import lru_cache

import jax.numpy as jnp

from ..utils.rounding import round_half_away

U64 = jnp.uint64
_MASK32 = (1 << 32) - 1


def u64(x):
    return jnp.asarray(x, dtype=jnp.uint64)


# ---------------------------------------------------------------------------
# add / sub / neg (conditional correction, reference zq.rs:219-313)
# ---------------------------------------------------------------------------

def addmod(a, b, q: int):
    s = a + b  # a, b < q < 2^63 -> no wrap
    return jnp.where(s >= U64(q), s - U64(q), s)


def submod(a, b, q: int):
    return jnp.where(a >= b, a - b, (U64(q) - b) + a)


def negmod(a, q: int):
    return jnp.where(a == U64(0), a, U64(q) - a)


def coerce_u64(v, q: int):
    """u64 values (any range) -> canonical [0, q)."""
    return u64(v) % U64(q)


def coerce_i64(v, q: int):
    """signed int64 values -> canonical [0, q) (Rust (e % q + q) % q)."""
    qq = jnp.int64(q)
    return (jnp.mod(jnp.mod(jnp.asarray(v, jnp.int64), qq) + qq, qq)).astype(jnp.uint64)


def coerce_f64(v, q: int):
    """f64 -> round-half-away -> canonical [0, q).  (reference zq.rs:32-39)"""
    return coerce_i64(round_half_away(jnp.asarray(v, jnp.float64)), q)


# ---------------------------------------------------------------------------
# mul
# ---------------------------------------------------------------------------

def mul128(a, b):
    """Full 64x64 -> 128-bit product as (hi, lo) u64 pair, via 32-bit limbs."""
    a0 = a & U64(_MASK32)
    a1 = a >> U64(32)
    b0 = b & U64(_MASK32)
    b1 = b >> U64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> U64(32)) + (p01 & U64(_MASK32)) + (p10 & U64(_MASK32))
    lo = (mid << U64(32)) | (p00 & U64(_MASK32))
    hi = p11 + (p01 >> U64(32)) + (p10 >> U64(32)) + (mid >> U64(32))
    return hi, lo


@lru_cache(maxsize=None)
def _mont_consts(q: int):
    assert q % 2 == 1 and q < (1 << 63), "Montgomery path needs odd q < 2^63"
    nqinv = (-pow(q, -1, 1 << 64)) % (1 << 64)  # -q^{-1} mod 2^64
    r2 = (1 << 128) % q                          # 2^128 mod q
    return nqinv, r2


def _mont_redc(hi, lo, q: int, nqinv: int):
    """Montgomery reduction of a 128-bit value (hi, lo): returns value * 2^-64 mod q."""
    m = lo * U64(nqinv)                       # wrapping low-64 product
    mh, ml = mul128(m, U64(q))
    carry = (lo != U64(0)).astype(jnp.uint64)  # lo + ml == 0 mod 2^64 by construction
    t = hi + mh + carry
    return jnp.where(t >= U64(q), t - U64(q), t)


def mulmod(a, b, q: int):
    """a * b mod q for canonical a, b in [0, q).  Exact for any q < 2^63."""
    if q < (1 << 32):
        return (a * b) % U64(q)
    nqinv, r2 = _mont_consts(q)
    hi, lo = mul128(a, b)
    t = _mont_redc(hi, lo, q, nqinv)          # a*b*2^-64 mod q
    hi2, lo2 = mul128(t, U64(r2 % (1 << 64)))
    return _mont_redc(hi2, lo2, q, nqinv)     # a*b mod q


def powmod(a, e: int, q: int):
    """a^e mod q (static exponent, square-and-multiply unrolled at trace time)."""
    result = jnp.full_like(u64(a), 1)
    base = u64(a)
    ee = int(e)
    while ee > 0:
        if ee & 1:
            result = mulmod(result, base, q)
        base = mulmod(base, base, q)
        ee >>= 1
    return result


def invmod_prime(a, q: int):
    """a^-1 mod q by Fermat (q prime)."""
    return powmod(a, q - 2, q)


def divmod_prime(a, b, q: int):
    """a / b = a * b^-1 mod q (q prime; reference zq.rs:329-337)."""
    return mulmod(a, invmod_prime(b, q), q)


# ---------------------------------------------------------------------------
# mod switch / scaled rounding  (reference zq.rs:133-138)
# ---------------------------------------------------------------------------

def mod_switch(v, q: int, q2: int):
    """round(v * q2 / q) mod q2, f64 semantics as in the reference."""
    r = round_half_away(v.astype(jnp.float64) * float(q2) / float(q))
    return coerce_i64(r, q2)


def mul_div_round(v, num: int, den: int, q: int):
    """round(num * v / den) mod q, f64 semantics (reference ring_nq.rs:106-113)."""
    r = round_half_away(float(num) * v.astype(jnp.float64) / float(den))
    return coerce_i64(r, q)


# ---------------------------------------------------------------------------
# gadget decomposition  (reference zq.rs:140-207)
# ---------------------------------------------------------------------------

def decompose_base_beta(v, q: int, beta: int, l: int):
    """Unsigned digits of v against denominators q // beta^i, i = 1..l.

    Saturates to beta-1 digits when v >= beta^l (the reference's
    "approximate" branch, zq.rs:151-160).  Returns an array with a new
    leading axis of length l (digit-major, most significant first).
    """
    digits = []
    rem = u64(v)
    for i in range(1, l + 1):
        den = U64(q // beta ** i)
        d = rem // den
        rem = rem % den
        digits.append(d)
    out = jnp.stack(digits, axis=0)
    sat = (u64(v) >= U64(beta ** l))
    return jnp.where(sat[None, ...], U64(beta - 1), out)


def decompose_base2(v, q: int, l: int):
    """Bit decomposition, MSB-of-l-bit-window first (reference zq.rs:174-207)."""
    shifts = jnp.arange(l - 1, -1, -1, dtype=jnp.uint64)
    shape = (l,) + (1,) * jnp.ndim(v)
    d = (u64(v)[None, ...] >> shifts.reshape(shape)) & U64(1)
    sat = (u64(v) >= U64(1 << l)) if l < 64 else jnp.zeros(jnp.shape(v), bool)
    return jnp.where(sat[None, ...], U64(1), d)


def decompose(v, q: int, beta: int, l: int):
    """Dispatch matching the reference (beta==2 -> pure bit path)."""
    if beta == 2:
        return decompose_base2(v, q, l)
    return decompose_base_beta(v, q, beta, l)


def recompose(digits, q: int, beta: int, l: int):
    """sum_i d_i * (q // beta^(i+1)) mod q — test helper (zq.rs:374-380)."""
    acc = jnp.zeros(digits.shape[1:], dtype=jnp.uint64)
    for i in range(l):
        acc = acc + digits[i] * U64(q // beta ** (i + 1))
    return coerce_u64(acc, q)
