"""CKKS scheme (eprint 2016/421) — encrypt/decrypt/add/sub over R_q.

Re-design of the reference ckks crate (reference ckks/src/lib.rs).  Keys and
encryption masks are ternary (U[-1,1) rounded), matching the reference
distributions (ckks/src/lib.rs:49-59).

NOTE on `sub`: the reference computes (c0.0 - c1.0, c0.1 + c1.1) — the second
component is ADDED (ckks/src/lib.rs:117), a sign bug masked only by the
reference's ternary public keys (SURVEY §2.4).  This implementation provides
the correct subtraction; `sub_reference_quirk` reproduces the reference's
observable behavior for parity testing.
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...arith.params import RingParam
from ...arith import rq
from ...ops import modops, ntt
from ...utils import prng

ERR_SIGMA = 3.2


@dataclass(frozen=True)
class Param:
    ring: RingParam
    t: int


class SecretKey(NamedTuple):
    s: jax.Array
    s_evals: jax.Array


class PublicKey(NamedTuple):
    b: jax.Array  # -a·s + e
    a: jax.Array


class CT(NamedTuple):
    c0: jax.Array
    c1: jax.Array


def new_key(key, param: Param, batch=()):
    """s, a ternary; pk = (-a·s + e, a) (ckks/src/lib.rs:46-63)."""
    q, n = param.ring.q, param.ring.n
    k_s, k_a, k_e = prng.split(key, 3)
    s = modops.coerce_i64(prng.ternary(k_s, tuple(batch) + (n,)), q)
    a = modops.coerce_i64(prng.ternary(k_a, tuple(batch) + (n,)), q)
    e = prng.gaussian_mod(k_e, tuple(batch) + (n,), ERR_SIGMA, q)
    s_evals = ntt.ntt(s, q)
    neg_as = rq.neg(ntt.intt(modops.mulmod(ntt.ntt(a, q), s_evals, q), q), q)
    return SecretKey(s, s_evals), PublicKey(b=rq.add(neg_as, e, q), a=a)


def encrypt(key, param: Param, pk: PublicKey, m, batch=()):
    """m: int64 R coefficients. c = (m + e0 + v·pk0, v·pk1 + e1)
    (ckks/src/lib.rs:66-85)."""
    q, n = param.ring.q, param.ring.n
    k_v, k_e0, k_e1 = prng.split(key, 3)
    v = modops.coerce_i64(prng.ternary(k_v, tuple(batch) + (n,)), q)
    e0 = prng.gaussian_mod(k_e0, tuple(batch) + (n,), ERR_SIGMA, q)
    e1 = prng.gaussian_mod(k_e1, tuple(batch) + (n,), ERR_SIGMA, q)
    m_q = modops.coerce_i64(jnp.asarray(m, jnp.int64), q)
    ev = ntt.ntt(v, q)
    c0 = rq.add(rq.add(m_q, e0, q),
                ntt.intt(modops.mulmod(ntt.ntt(pk.b, q), ev, q), q), q)
    c1 = rq.add(ntt.intt(modops.mulmod(ntt.ntt(pk.a, q), ev, q), q), e1, q)
    return CT(c0, c1)


def decrypt(param: Param, sk: SecretKey, c: CT):
    """centered lift of c0 + c1·s -> int64 R coefficients (lib.rs:87-94)."""
    q = param.ring.q
    m = rq.add(c.c0, ntt.intt(modops.mulmod(ntt.ntt(c.c1, q), sk.s_evals, q), q), q)
    return rq.to_centered_i64(m, q)


def add(param: Param, a: CT, b: CT) -> CT:
    q = param.ring.q
    return CT(rq.add(a.c0, b.c0, q), rq.add(a.c1, b.c1, q))


def sub(param: Param, a: CT, b: CT) -> CT:
    """Correct homomorphic subtraction."""
    q = param.ring.q
    return CT(rq.sub(a.c0, b.c0, q), rq.sub(a.c1, b.c1, q))


def sub_reference_quirk(param: Param, a: CT, b: CT) -> CT:
    """The reference's (c0.0 - c1.0, c0.1 + c1.1) (ckks/src/lib.rs:116-118)."""
    q = param.ring.q
    return CT(rq.sub(a.c0, b.c0, q), rq.add(a.c1, b.c1, q))
