"""TLev: gadget vector of l TLWEs (reference tfhe/src/tlev.rs).

    TLev(a=[..., l, kn], b=[..., l])

Scales are u64::MAX // beta^i for i=1..l (tlev.rs:38-47); decrypt reads level
[0] and rescales by beta / u64::MAX (tlev.rs:79-82).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...arith import tn
from ...ops import modops
from ...utils import prng
from ..gfhe.glwe import Param
from . import tlwe as tlwe_mod
from .tlwe import TLWE, TORUS_MAX, _tlev_scales

U64 = jnp.uint64


class TLev(NamedTuple):
    a: jax.Array  # [..., l, kn]
    b: jax.Array  # [..., l]


def encode(param: Param, m):
    """Unscaled (tlev.rs:15-21)."""
    return jnp.asarray(m, U64)


def decode(param: Param, p):
    return modops.coerce_u64(p, param.t)


def _encrypt_impl(key, param, enc, l, beta, m, batch):
    scales = _tlev_scales(beta, l)
    msgs = jnp.asarray(m, U64)[..., None] * scales          # [..., l]
    ct = enc(key, msgs, tuple(batch) + (l,))
    return TLev(a=ct.a, b=ct.b)


def encrypt(key, param: Param, beta: int, l: int, pk, m, batch=()) -> TLev:
    return _encrypt_impl(
        key, param,
        lambda k, p, sh: tlwe_mod.encrypt(k, param, pk, p, batch=sh),
        l, beta, m, batch)


def encrypt_s(key, param: Param, beta: int, l: int, s, m, batch=()) -> TLev:
    return _encrypt_impl(
        key, param,
        lambda k, p, sh: tlwe_mod.encrypt_s(k, param, s, p, batch=sh),
        l, beta, m, batch)


def decrypt(param: Param, s, c: TLev, beta: int):
    pt = tlwe_mod.decrypt(param, s, TLWE(a=c.a[..., 0, :], b=c.b[..., 0]))
    return tn.mul_div_round(pt, beta, TORUS_MAX)


def mul_vec(c: TLev, v) -> TLWE:
    """sum_i TLWE_i · v_i, v: [..., l] (tlev.rs:95-105)."""
    v = jnp.asarray(v, U64)
    return TLWE(a=jnp.sum(c.a * v[..., None], axis=-2),
                b=jnp.sum(c.b * v, axis=-1))
