"""Generalized LWE over a Ring — the core cryptosystem layer.

Functional, batched re-design of the reference gfhe crate
(reference gfhe/src/glwe.rs).  Ciphertexts are NamedTuple pytrees:

    GLWE(a=[..., k, n] u64, b=[..., n] u64)

Any leading batch dims are supported; every function vmaps "for free" via
broadcasting.  PRNG keys are explicit.

Distribution notes (cf. utils/prng.py docstring):
  * encrypt_s samples its mask from the KEY distribution, i.e. near-zero
    binary — a faithful reproduction of the reference quirk
    (gfhe/src/glwe.rs:149: `a ← Xi_key`), which is *load-bearing* for the
    reference's TFHE bootstrapping behavior.  Use encrypt (pk) for
    uniformly-masked ciphertexts.
  * secret keys are true uniform bits (the reference rounds U[0,2) to {0,1,2};
    binary keys are required for a correct blind rotation).
"""

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...arith.params import RingParam, TORUS_Q
from ...arith.ring import ring_for
from ...ops import modops
from ...utils import prng

# sigma = 3.2, eprint 2022/162 p.5 (reference glwe.rs:17)
ERR_SIGMA = 3.2

U64 = jnp.uint64


@dataclass(frozen=True)
class Param:
    err_sigma: float
    ring: RingParam
    k: int
    t: int

    def pt(self) -> RingParam:
        return RingParam(self.t, self.ring.n)

    def lwe(self) -> "Param":
        """Flattened LWE view: n=1, k=K*N (the TFHE key-reinterpretation
        trick, reference glwe.rs:41-51)."""
        return Param(ERR_SIGMA, RingParam(self.ring.q, 1),
                     self.k * self.ring.n, self.t)

    @property
    def kn(self) -> int:
        return self.k * self.ring.n


class GLWE(NamedTuple):
    a: jax.Array  # [..., k, n]
    b: jax.Array  # [..., n]


class PublicKey(NamedTuple):
    b: jax.Array  # [..., n]      (a·s + e)
    a: jax.Array  # [..., k, n]


class GLev(NamedTuple):
    """l GLWEs stacked on a leading level axis: a [..., l, k, n], b [..., l, n]."""
    a: jax.Array
    b: jax.Array


class KSK(NamedTuple):
    """k_src GLevs: a [..., k_src, l, k, n], b [..., k_src, l, n]."""
    a: jax.Array
    b: jax.Array


def zero(param: Param, batch=()):
    ring = ring_for(param.ring)
    return GLWE(a=ring.zeros(tuple(batch) + (param.k,)), b=ring.zeros(batch))


def from_plaintext(param: Param, p):
    ring = ring_for(param.ring)
    batch = p.shape[:-1]
    return GLWE(a=ring.zeros(tuple(batch) + (param.k,)), b=p)


# -- keys -------------------------------------------------------------------

def new_key(key, param: Param, batch=()):
    """(sk, pk): s ← bits, a ← uniform, pk = (a·s + e, a) (glwe.rs:76-91)."""
    ring = ring_for(param.ring)
    k_s, k_a, k_e = prng.split(key, 3)
    s = ring.rand_bin(k_s, tuple(batch) + (param.k,))
    a = ring.rand_uniform(k_a, tuple(batch) + (param.k,))
    e = ring.rand_err(k_e, batch, param.err_sigma)
    b = ring.add(ring.contract(a, s), e)
    return s, PublicKey(b=b, a=a)


def pk_from_sk(key, param: Param, s):
    """pk = (a·s + e, a) for an existing secret key (glwe.rs:92-105)."""
    ring = ring_for(param.ring)
    k_a, k_e = prng.split(key, 2)
    batch = s.shape[:-2]
    a = ring.rand_uniform(k_a, tuple(batch) + (param.k,))
    e = ring.rand_err(k_e, batch, param.err_sigma)
    return PublicKey(b=ring.add(ring.contract(a, s), e), a=a)


# -- encrypt / decrypt ------------------------------------------------------

def encrypt_s(key, param: Param, sk, m, batch=()):
    """Secret-key encryption; mask from the KEY distribution (binary),
    reproducing the reference (glwe.rs:140-154). m: already-scaled [..., n]."""
    ring = ring_for(param.ring)
    k_a, k_e = prng.split(key, 2)
    a = ring.rand_bin(k_a, tuple(batch) + (param.k,))
    e = ring.rand_err(k_e, batch, param.err_sigma)
    b = ring.add(ring.add(ring.contract(a, sk), m), e)
    return GLWE(a=a, b=b)


def encrypt(key, param: Param, pk: PublicKey, m, batch=()):
    """Public-key encryption (glwe.rs:155-173)."""
    ring = ring_for(param.ring)
    k_u, k_e0, k_e1 = prng.split(key, 3)
    u = ring.rand_bin(k_u, batch)
    e0 = ring.rand_err(k_e0, batch, param.err_sigma)
    e1 = ring.rand_err(k_e1, tuple(batch) + (param.k,), param.err_sigma)
    b = ring.add(ring.add(ring.mul(pk.b, u), m), e0)
    d = ring.add(ring.mul(pk.a, u[..., None, :]), e1)
    return GLWE(a=d, b=b)


def decrypt(param: Param, sk, ct: GLWE):
    """b - a·s; result is the scaled plaintext + noise (glwe.rs:175-179)."""
    ring = ring_for(param.ring)
    return ring.sub(ct.b, ring.contract(ct.a, sk))


# -- encode / decode (Rq world: Δ = floor(q/t); glwe.rs:183-196) ------------

def encode(param: Param, m):
    """m mod t -> Δ·m mod q."""
    delta = param.ring.q // param.t
    ring = ring_for(param.ring)
    m_q = modops.coerce_u64(m, param.ring.q)
    return ring.scalar_mul_u64(m_q, delta)


def decode(param: Param, p):
    ring = ring_for(param.ring)
    return ring.decode_scale(p, param.t)


# -- homomorphic ops (glwe.rs:207-280) --------------------------------------

def add(param: Param, c0: GLWE, c1: GLWE) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=ring.add(c0.a, c1.a), b=ring.add(c0.b, c1.b))


def sub(param: Param, c0: GLWE, c1: GLWE) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=ring.sub(c0.a, c1.a), b=ring.sub(c0.b, c1.b))


def neg(param: Param, c: GLWE) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=ring.neg(c.a), b=ring.neg(c.b))


def add_pt(param: Param, c: GLWE, p) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=c.a, b=ring.add(c.b, p))


def sub_pt(param: Param, c: GLWE, p) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=c.a, b=ring.sub(c.b, p))


def mul_pt(param: Param, c: GLWE, p) -> GLWE:
    """ct · plaintext (ring product on every component)."""
    ring = ring_for(param.ring)
    return GLWE(a=ring.mul(c.a, p[..., None, :]), b=ring.mul(c.b, p))


def mod_switch(param: Param, c: GLWE, p: int) -> GLWE:
    ring = ring_for(param.ring)
    return GLWE(a=ring.mod_switch(c.a, p), b=ring.mod_switch(c.b, p))


# -- key switching ----------------------------------------------------------

def new_ksk(key, param: Param, beta: int, l: int, sk, new_sk) -> KSK:
    """KSK = k GLevs, GLev_i = Enc_s(sk_i) at levels i=1..l (glwe.rs:107-125)."""
    from . import glev
    keys = prng.split(key, param.k)
    as_, bs = [], []
    for i in range(param.k):
        g = glev.encrypt_s(keys[i], param, beta, l, new_sk, sk[..., i, :])
        as_.append(g.a)
        bs.append(g.b)
    return KSK(a=jnp.stack(as_, axis=-4), b=jnp.stack(bs, axis=-3))


def key_switch(param: Param, beta: int, l: int, ksk: KSK, ct: GLWE) -> GLWE:
    """(0, b) - sum_i GLev_i · decompose(a_i)  (glwe.rs:126-137).

    Implemented as ONE fused contraction over the (k_src · l) axis — the
    gadget products and their sum ride a single transform/reduce pipeline.
    """
    ring = ring_for(param.ring)
    k, n = param.k, param.ring.n
    # digits: [l, ..., k_src, n] -> [..., k_src, l, n]
    d = ring.decompose(ct.a, beta, l)
    d = jnp.moveaxis(d, 0, -2)
    batch = ct.b.shape[:-1]
    # flatten (k_src, l) -> M; the KSK keeps its OWN leading dims (it may be
    # unbatched while the ciphertext is batched — broadcasting handles it)
    M = k * l
    d_flat = d.reshape(batch + (M, n))
    kb = ksk.b.reshape(ksk.b.shape[:-3] + (M, n))
    rhs_b = ring.contract(kb, d_flat)
    # a-components: contract each of the k output columns (column axis is
    # moved in front so it broadcasts against the digit array)
    ka = ksk.a.reshape(ksk.a.shape[:-4] + (M, k, n))
    ka_m = jnp.moveaxis(ka, -2, 0)                          # [k, ksk_batch, M, n]
    extra = d_flat.ndim - (ka_m.ndim - 1)                   # ct batch dims not in ksk
    if extra > 0:
        ka_m = ka_m.reshape(ka_m.shape[:1] + (1,) * extra + ka_m.shape[1:])
    rhs_a = ring.contract(ka_m, d_flat)                     # [k, ..., n]
    rhs_a = jnp.moveaxis(rhs_a, 0, -2)                      # [..., k, n]
    lhs = GLWE(a=ring.zeros(batch + (k,)), b=ct.b)
    return GLWE(a=ring.sub(lhs.a, rhs_a), b=ring.sub(lhs.b, rhs_b))
