"""TLWE: LWE over the scalar torus T64 (reference tfhe/src/tlwe.rs).

Flat-array representation (no length-1 poly axis):

    TLWE(a=[..., kn] u64, b=[...] u64)

All torus arithmetic is wrapping u64 — exact mod 2^64.  The kn-dim dot
products (encrypt/decrypt/key-switch) are single fused multiply-reduce ops.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...models.gfhe.glwe import Param
from ...arith import tn
from ...ops import modops
from ...utils import prng

U64 = jnp.uint64
TORUS_MAX = 0xFFFFFFFFFFFFFFFF  # u64::MAX — the reference's Δ denominator


class TLWE(NamedTuple):
    a: jax.Array  # [..., kn]
    b: jax.Array  # [...]


class PublicKey(NamedTuple):
    b: jax.Array  # [...]
    a: jax.Array  # [..., kn]


class KSK(NamedTuple):
    """kn_src TLevs: a [kn_src, l, kn_dst], b [kn_src, l]."""
    a: jax.Array
    b: jax.Array


def zero(param: Param, batch=()):
    return TLWE(a=jnp.zeros(tuple(batch) + (param.kn,), U64),
                b=jnp.zeros(batch, U64))


# -- keys -------------------------------------------------------------------

def new_key(key, param: Param, batch=()):
    """s ← bits^kn; pk = (a·s + e, a) (via GLWE<T64>, glwe.rs:76-91)."""
    kn = param.kn
    k_s, k_a, k_e = prng.split(key, 3)
    s = prng.binary(k_s, tuple(batch) + (kn,))
    a = prng.uniform_u64(k_a, tuple(batch) + (kn,))
    e = prng.gaussian_torus(k_e, batch, param.err_sigma)
    b = jnp.sum(a * s, axis=-1) + e
    return s, PublicKey(b=b, a=a)


# -- encode / decode (tlwe.rs:52-69) ----------------------------------------

def encode(param: Param, m):
    """m mod t -> m * (u64::MAX // t)."""
    delta = TORUS_MAX // param.t
    return jnp.asarray(m, U64) * U64(delta)


def decode(param: Param, p):
    """round(t * p / u64::MAX) mod t."""
    return modops.coerce_u64(tn.mul_div_round(p, param.t, TORUS_MAX), param.t)


def new_const(param: Param, m):
    """Unscaled constant for ct-pt multiplication (tlwe.rs:66-69)."""
    return jnp.asarray(m, U64)


# -- encrypt / decrypt ------------------------------------------------------

def encrypt_s(key, param: Param, s, p, batch=()):
    """Secret-key encrypt with the reference's BINARY mask quirk
    (glwe.rs:149: a ← Xi_key) — near-zero mask, load-bearing for the
    reference bootstrapping observable.  See encrypt_uniform for the
    standard LWE encryption."""
    kn = param.kn
    k_a, k_e = prng.split(key, 2)
    a = prng.binary(k_a, tuple(batch) + (kn,))
    e = prng.gaussian_torus(k_e, batch, param.err_sigma)
    b = jnp.sum(a * s, axis=-1) + jnp.asarray(p, U64) + e
    return TLWE(a=a, b=b)


def encrypt_uniform(key, param: Param, s, p, batch=()):
    """Standard LWE secret-key encryption: a ← U(T^kn) (the cryptographically
    meaningful mask; exercises the full CMux chain in blind rotation)."""
    kn = param.kn
    k_a, k_e = prng.split(key, 2)
    a = prng.uniform_u64(k_a, tuple(batch) + (kn,))
    e = prng.gaussian_torus(k_e, batch, param.err_sigma)
    b = jnp.sum(a * s, axis=-1) + jnp.asarray(p, U64) + e
    return TLWE(a=a, b=b)


def encrypt(key, param: Param, pk: PublicKey, p, batch=()):
    """Public-key encrypt (glwe.rs:155-173): u scalar bit, b = pk.b*u + p + e0,
    a = pk.a*u + e1."""
    kn = param.kn
    k_u, k_e0, k_e1 = prng.split(key, 3)
    u = prng.binary(k_u, batch)
    e0 = prng.gaussian_torus(k_e0, batch, param.err_sigma)
    e1 = prng.gaussian_torus(k_e1, tuple(batch) + (kn,), param.err_sigma)
    b = pk.b * u + jnp.asarray(p, U64) + e0
    a = pk.a * u[..., None] + e1
    return TLWE(a=a, b=b)


def decrypt(param: Param, s, ct: TLWE):
    return ct.b - jnp.sum(ct.a * s, axis=-1)


# -- homomorphic ops (tlwe.rs:216-279) --------------------------------------

def add(c0: TLWE, c1: TLWE) -> TLWE:
    return TLWE(c0.a + c1.a, c0.b + c1.b)


def sub(c0: TLWE, c1: TLWE) -> TLWE:
    return TLWE(c0.a - c1.a, c0.b - c1.b)


def add_pt(c: TLWE, p) -> TLWE:
    return TLWE(c.a, c.b + jnp.asarray(p, U64))


def sub_pt(c: TLWE, p) -> TLWE:
    return TLWE(c.a, c.b - jnp.asarray(p, U64))


def mul_pt(c: TLWE, p) -> TLWE:
    p = jnp.asarray(p, U64)
    return TLWE(c.a * p[..., None], c.b * p)


# -- switching --------------------------------------------------------------

def mod_switch(c: TLWE, q2: int) -> TLWE:
    """2^64 -> q2 = 2^j (tlwe.rs:114-118)."""
    return TLWE(tn.mod_switch(c.a, q2), tn.mod_switch(c.b, q2))


def new_ksk(key, param: Param, beta: int, l: int, s_src, s_dst, batch=(),
            uniform_mask: bool = False) -> KSK:
    """KSK[i] = TLev_s_dst(s_src_i), levels i=1..l (tlwe.rs:84-100).

    Built as ONE batched encryption over the (kn_src, l) grid.  Source and
    destination dimensions come from the key arrays (they may differ — the
    short-LWE bootstrap switches kn -> n_lwe).  uniform_mask=True uses the
    standard uniform LWE mask instead of the reference's binary-mask quirk
    (glwe.rs:149)."""
    kn_src = s_src.shape[-1]
    kn_dst = s_dst.shape[-1]
    scales = _tlev_scales(beta, l)                       # [l]
    msgs = s_src[..., :, None] * scales                  # [..., kn_src, l]
    k_a, k_e = prng.split(key, 2)
    shape = tuple(batch) + (kn_src, l)
    mask = prng.uniform_u64 if uniform_mask else prng.binary
    a = mask(k_a, shape + (kn_dst,))
    e = prng.gaussian_torus(k_e, shape, param.err_sigma)
    b = jnp.sum(a * s_dst[..., None, None, :], axis=-1) + msgs + e
    return KSK(a=a, b=b)


def key_switch(param: Param, beta: int, l: int, ksk: KSK, ct: TLWE) -> TLWE:
    """(0, b) - sum_i TLev_i · decompose(a_i) — one fused contraction over
    (kn_src · l) (tlwe.rs:101-112)."""
    d = tn.decompose(ct.a, beta, l)        # [l, ..., kn_src]
    d = jnp.moveaxis(d, 0, -1)             # [..., kn_src, l]
    rhs_b = jnp.sum(d * ksk.b, axis=(-1, -2))
    rhs_a = jnp.sum(d[..., None] * ksk.a, axis=(-2, -3))   # [..., kn_dst]
    return TLWE(a=U64(0) - rhs_a, b=ct.b - rhs_b)


def _tlev_scales(beta: int, l: int):
    """u64::MAX // beta^i for i=1..l (scale 1 once beta^i overflows 64 bits)
    (tlev.rs:38-47)."""
    vals = []
    for i in range(1, l + 1):
        bi = beta ** i
        vals.append(TORUS_MAX // bi if bi <= TORUS_MAX else 1)
    return jnp.asarray(vals, U64)
