"""TGSW over the scalar torus: (kn+1) TLevs (reference tfhe/src/tgsw.rs).

    TGSW(a=[..., kn+1, l, kn], b=[..., kn+1, l])

Row j < kn encrypts -s_j·m; row kn encrypts m.  The external product
TGSW × TLWE decomposes every ciphertext component and contracts over the
(kn+1)·l grid in one fused reduce (tgsw.rs:45-64).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...arith import tn
from ...utils import prng
from ..gfhe.glwe import Param
from . import tlev as tlev_mod
from .tlwe import TLWE, _tlev_scales

U64 = jnp.uint64


class TGSW(NamedTuple):
    a: jax.Array  # [..., kn+1, l, kn]
    b: jax.Array  # [..., kn+1, l]


def encrypt_s(key, param: Param, beta: int, l: int, s, m, batch=()) -> TGSW:
    """One batched encryption over the (kn+1, l) grid (tgsw.rs:17-30)."""
    kn = param.kn
    m = jnp.asarray(m, U64)
    # messages per row: -s_j·m (j < kn), then m
    row_m = jnp.concatenate(
        [(U64(0) - s) * m[..., None], m[..., None]], axis=-1)  # [..., kn+1]
    scales = _tlev_scales(beta, l)
    msgs = row_m[..., :, None] * scales                        # [..., kn+1, l]
    k_a, k_e = prng.split(key, 2)
    shape = tuple(batch) + (kn + 1, l)
    a = prng.binary(k_a, shape + (kn,))
    e = prng.gaussian_torus(k_e, shape, param.err_sigma)
    b = jnp.sum(a * s[..., None, None, :], axis=-1) + msgs + e
    return TGSW(a=a, b=b)


def decrypt(param: Param, s, c: TGSW, beta: int):
    last = tlev_mod.TLev(a=c.a[..., -1, :, :], b=c.b[..., -1, :])
    return tlev_mod.decrypt(param, s, last, beta)


def external_product(param: Param, beta: int, l: int, g: TGSW, c: TLWE) -> TLWE:
    """TGSW ⊠ TLWE: decompose [a | b] and contract over (kn+1)·l
    (tgsw.rs:45-64)."""
    ab = jnp.concatenate([c.a, c.b[..., None]], axis=-1)  # [..., kn+1]
    d = tn.decompose(ab, beta, l)                         # [l, ..., kn+1]
    d = jnp.moveaxis(d, 0, -1)                            # [..., kn+1, l]
    out_a = jnp.sum(d[..., None] * g.a, axis=(-2, -3))    # [..., kn]
    out_b = jnp.sum(d * g.b, axis=(-1, -2))
    return TLWE(a=out_a, b=out_b)


def cmux(param: Param, beta: int, l: int, bit: TGSW, c1: TLWE, c2: TLWE) -> TLWE:
    """c1 + bit ⊠ (c2 - c1) (tgsw.rs:39-41)."""
    diff = TLWE(c2.a - c1.a, c2.b - c1.b)
    prod = external_product(param, beta, l, bit, diff)
    return TLWE(c1.a + prod.a, c1.b + prod.b)
