"""BFV (eprint 2012/144, tensor/relinearization per eprint 2021/204 p.9).

Re-design of the reference bfv crate (reference bfv/src/lib.rs) with two
execution paths sharing one API:

  * parity path (`fast=False`, default): reproduces the reference pipeline —
    lift to Z[X] uncentered, dense exact i64 convolution, scale t/q in f64,
    THEN negacyclic fold (order matters: bfv/src/lib.rs:59-85).
  * device path (`fast=True`): CRT-NTT O(n log n) convolutions, fold-first.
    Differs from the parity path by at most ±1 per coefficient (absorbed by
    the noise budget) and is fully jittable at N = 2^14 — the bench path.

Exactness notes (the reference casts i128→i64 and divides huge values in f64,
reference bfv/src/lib.rs:264-267 — a numerical hazard; see SURVEY §2.5):
relinearization here splits rlk coefficients into 2 limbs so every
convolution stays exactly representable, then performs the final /p rounding
in compensated f64 (absolute error << 0.5).
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..arith.params import RingParam
from ..arith import rq, rn
from ..ops import modops, ntt
from ..utils import prng
from ..utils.rounding import round_half_away

ERR_SIGMA = 3.2
U64 = jnp.uint64


@dataclass(frozen=True)
class Param:
    ring: RingParam
    t: int
    p: int  # relinearization extension factor (modulus p*q)

    def pt(self) -> RingParam:
        return RingParam(self.t, self.ring.n)

    @property
    def pq(self) -> int:
        return self.p * self.ring.q

    @property
    def delta(self) -> int:
        return self.ring.q // self.t


class SecretKey(NamedTuple):
    s: jax.Array        # [..., n] binary in [0, q)
    s_evals: jax.Array  # NTT(s) — the reference's precomputed evals cache
                        # (bfv/src/lib.rs:129-133)


class PublicKey(NamedTuple):
    b: jax.Array  # -a·s + e
    a: jax.Array


class RLK(NamedTuple):
    r0: jax.Array  # mod p*q
    r1: jax.Array


class RLWE(NamedTuple):
    c0: jax.Array
    c1: jax.Array


# -- keys -------------------------------------------------------------------

def new_key(key, param: Param, batch=()):
    q, n = param.ring.q, param.ring.n
    k_s, k_a, k_e = prng.split(key, 3)
    s = prng.binary(k_s, tuple(batch) + (n,))
    a = prng.uniform_mod(k_a, tuple(batch) + (n,), q)
    e = prng.gaussian_mod(k_e, tuple(batch) + (n,), ERR_SIGMA, q)
    s_evals = ntt.ntt(s, q)
    neg_as = rq.neg(ntt.intt(modops.mulmod(ntt.ntt(a, q), s_evals, q), q), q)
    return SecretKey(s, s_evals), PublicKey(b=rq.add(neg_as, e, q), a=a)


def rlk_key(key, param: Param, sk: SecretKey, batch=()):
    """rlk = (-(a·s + e) + p·s^2 mod p·q, a)  (bfv/src/lib.rs:202-225).

    The reference computes a·s and s^2 with exact integer convolutions then
    reduces mod p·q; s is binary so the products fit i64 exactly."""
    pq, n = param.pq, param.ring.n
    assert pq < (1 << 62)
    k_a, k_e = prng.split(key, 2)
    s = sk.s.astype(jnp.int64)
    a = prng.uniform_mod(k_a, tuple(batch) + (n,), pq)
    e = prng.gaussian_mod(k_e, tuple(batch) + (n,), ERR_SIGMA, pq)
    a_s = rn.naive_poly_mul(a.astype(jnp.int64), s)     # < n * pq — needs n*pq < 2^63
    s2 = rn.naive_poly_mul(s, s)
    r0 = modops.submod(
        modops.mulmod(rq.from_i64(s2, pq, n), U64(param.p % pq), pq),
        rq.from_i64(a_s, pq, n),
        pq)
    r0 = modops.submod(r0, e, pq)
    return RLK(r0=r0, r1=a)


# -- encrypt / decrypt ------------------------------------------------------

def encrypt(key, param: Param, pk: PublicKey, m, batch=()):
    """c = (pk0·u + e1 + Δ·m, pk1·u + e2); u ternary (bfv/src/lib.rs:142-162)."""
    q, n = param.ring.q, param.ring.n
    k_u, k_e1, k_e2 = prng.split(key, 3)
    u = modops.coerce_i64(prng.ternary(k_u, tuple(batch) + (n,)), q)
    e1 = prng.gaussian_mod(k_e1, tuple(batch) + (n,), ERR_SIGMA, q)
    e2 = prng.gaussian_mod(k_e2, tuple(batch) + (n,), ERR_SIGMA, q)
    m_q = modops.coerce_u64(m, q)
    eu = ntt.ntt(u, q)
    c0 = rq.add(rq.add(ntt.intt(modops.mulmod(ntt.ntt(pk.b, q), eu, q), q), e1, q),
                rq.scalar_mul_u64(m_q, param.delta, q), q)
    c1 = rq.add(ntt.intt(modops.mulmod(ntt.ntt(pk.a, q), eu, q), q), e2, q)
    return RLWE(c0, c1)


def decrypt(param: Param, sk: SecretKey, c: RLWE):
    """m = round(t/q · (c0 + c1·s)) mod t (bfv/src/lib.rs:164-178)."""
    q = param.ring.q
    cs = rq.add(c.c0, ntt.intt(modops.mulmod(ntt.ntt(c.c1, q), sk.s_evals, q), q), q)
    return modops.coerce_u64(rq.mul_div_round(cs, param.t, q, q), param.t)


# -- linear homomorphic ops -------------------------------------------------

def add(c0: RLWE, c1: RLWE, param: Param) -> RLWE:
    q = param.ring.q
    return RLWE(rq.add(c0.c0, c1.c0, q), rq.add(c0.c1, c1.c1, q))


def add_const(param: Param, c: RLWE, m) -> RLWE:
    """c0 + Δ·m (bfv/src/lib.rs:180-188)."""
    q = param.ring.q
    m_q = modops.coerce_u64(m, q)
    return RLWE(rq.add(c.c0, rq.scalar_mul_u64(m_q, param.delta, q), q), c.c1)


# -- multiplication ---------------------------------------------------------

def tensor(param: Param, a: RLWE, b: RLWE, fast: bool = False):
    """Degree-2 product scaled by t/q (bfv/src/lib.rs:59-85).

    parity path: uncentered [0,q) lift -> exact i64 dense convolution
    (unreduced, 2n-1 coeffs) -> f64 round(t·v/q) -> mod q -> negacyclic fold.
    This replicates the reference bit-for-bit but its noise grows ~n^2·q·t
    (uncentered representatives) and stops decrypting beyond n ≈ 32 — a
    reference limitation, observable in its own n=16 test choice.

    fast path (production): CENTERED lift to (-q/2, q/2] (textbook BFV),
    CRT-NTT convolution (folded), then the same f64 scaling — correct noise
    growth, scales to N = 2^14, fully jittable."""
    q, n, t = param.ring.q, param.ring.n, param.t
    a0, a1 = a.c0.astype(jnp.int64), a.c1.astype(jnp.int64)
    b0, b1 = b.c0.astype(jnp.int64), b.c1.astype(jnp.int64)
    if fast:
        a0, a1, b0, b1 = (rq.to_centered_i64(x.astype(jnp.uint64), q)
                          for x in (a0, a1, b0, b1))
        mul = ntt.polymul_i64_crt
        post = lambda v: rq.from_i64(  # noqa: E731
            round_half_away(float(t) * v.astype(jnp.float64) / float(q)
                            ).astype(jnp.int64), q, n)
    else:
        assert n * q * q < (1 << 62), "parity tensor needs n*q^2 < 2^62"
        mul = rn.naive_mul          # unreduced 2n-1 coefficients
        post = lambda v: rn.mul_div_round_to_rq(v, t, q, q, n)  # noqa: E731
    c0 = post(mul(a0, b0))
    c1 = post(mul(a0, b1) + mul(a1, b0))
    c2 = post(mul(a1, b1))
    return c0, c1, c2


def relinearize(param: Param, rlk: RLK, c0, c1, c2, fast: bool = False) -> RLWE:
    """(c0, c1) + round(c2·rlk / p) (bfv/src/lib.rs:251-271).

    Exact-value formulation: rlk coefficients are split into two limbs
    (rlk = hi·2^w + lo) so each convolution fits i64/CRT range exactly;
    the /p rounding runs in compensated f64 (abs err << 0.5)."""
    q, n, p = param.ring.q, param.ring.n, param.p
    w = 28 if fast else 32
    assert param.pq < (1 << (2 * w))
    hi = (rlk.r0 >> U64(w)).astype(jnp.int64)
    lo = (rlk.r0 & U64((1 << w) - 1)).astype(jnp.int64)
    hi1 = (rlk.r1 >> U64(w)).astype(jnp.int64)
    lo1 = (rlk.r1 & U64((1 << w) - 1)).astype(jnp.int64)
    # fast path: centered c2 keeps the relin rounding error independent of
    # the representative range (matches the centered tensor above)
    c2i = rq.to_centered_i64(c2, q) if fast else c2.astype(jnp.int64)
    mul = ntt.polymul_i64_crt if fast else rn.naive_mul

    def scaled(hi_limb, lo_limb):
        A = mul(c2i, hi_limb)
        B = mul(c2i, lo_limb)
        v = A.astype(jnp.float64) * (float(1 << w) / float(p)) \
            + B.astype(jnp.float64) / float(p)
        r = round_half_away(v).astype(jnp.int64)
        return rq.from_i64(r, q, n)

    r0 = scaled(hi, lo)
    r1 = scaled(hi1, lo1)
    return RLWE(rq.add(c0, r0, q), rq.add(c1, r1, q))


def relinearize_f64(param: Param, rlk: RLK, c0, c1, c2) -> RLWE:
    """The reference's f64 relinearization variant
    (bfv/src/lib.rs:227-250 — DEAD there; relinearize_204 is the used one).

    Semantic: fold c2·rlk_i negacyclically over Z FIRST (the reference
    multiplies in R = Z[X]/(X^n+1) via to_r()), THEN round each folded
    coefficient / p in f64 — the opposite fold/round order of
    relinearize_204 above, which rounds the unreduced 2n-1 coefficients
    before folding (per-coefficient results can differ by the fold of
    rounding residues).  Intentional divergence (COMPONENTS.md): the
    reference computes the product in i128 and CASTS to i64
    (ring_n.rs:269-279) — coefficients beyond 2^63 silently wrap there; we
    implement the intended exact value via the same two-limb split as
    `relinearize`, so this port is exact wherever the i128 interim is
    (always), not just below the reference's wrap point."""
    q, n, p = param.ring.q, param.ring.n, param.p
    w = 32
    assert param.pq < (1 << (2 * w))
    c2i = c2.astype(jnp.int64)

    def scaled(r):
        hi = (r >> U64(w)).astype(jnp.int64)
        lo = (r & U64((1 << w) - 1)).astype(jnp.int64)
        A = rn.naive_poly_mul(c2i, hi)       # folded, exact i64
        B = rn.naive_poly_mul(c2i, lo)
        v = A.astype(jnp.float64) * (float(1 << w) / float(p)) \
            + B.astype(jnp.float64) / float(p)
        return rq.from_i64(round_half_away(v).astype(jnp.int64), q, n)

    return RLWE(rq.add(c0, scaled(rlk.r0), q),
                rq.add(c1, scaled(rlk.r1), q))


def mul(param: Param, rlk: RLK, a: RLWE, b: RLWE, fast: bool = False) -> RLWE:
    c0, c1, c2 = tensor(param, a, b, fast=fast)
    return relinearize(param, rlk, c0, c1, c2, fast=fast)


def mul_const(param: Param, rlk: RLK, c: RLWE, m, fast: bool = False) -> RLWE:
    """Noiseless encrypt of Δ·m then full ct×ct mul (bfv/src/lib.rs:189-200)."""
    q = param.ring.q
    m_q = modops.coerce_u64(m, q)
    md = RLWE(rq.scalar_mul_u64(m_q, param.delta, q), jnp.zeros_like(c.c0))
    return mul(param, rlk, c, md, fast=fast)
