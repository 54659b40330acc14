"""GLev: gadget vector of l GLWEs (reference gfhe/src/glev.rs).

Level indexing reproduces the reference exactly:
  * pk-encrypt scales by q // beta^i for i = 0..l-1   (glev.rs:23-32)
  * sk-encrypt scales by q // beta^i for i = 1..l     (glev.rs:44-53)
  * decrypt reads level [1] and rescales by beta/q    (glev.rs:58-61)
(the two encrypt paths use different index bases; each is self-consistent
with decrypt — see SURVEY §2.5 quirk 1).
"""

import jax.numpy as jnp

from ...arith.ring import ring_for
from ...utils import prng
from . import glwe as glwe_mod
from .glwe import GLWE, Param, GLev


def _scales(param: Param, beta: int, l: int, start: int):
    q = param.ring.q
    return [q // beta ** i for i in range(start, start + l)]


def encrypt(key, param: Param, beta: int, l: int, pk, m, batch=()) -> GLev:
    keys = prng.split(key, l)
    ring = ring_for(param.ring)
    as_, bs = [], []
    for i, scale in enumerate(_scales(param, beta, l, 0)):
        ct = glwe_mod.encrypt(keys[i], param, pk, ring.scalar_mul_u64(m, scale),
                              batch=batch)
        as_.append(ct.a)
        bs.append(ct.b)
    return GLev(a=jnp.stack(as_, axis=-3), b=jnp.stack(bs, axis=-2))


def encrypt_s(key, param: Param, beta: int, l: int, sk, m, batch=()) -> GLev:
    keys = prng.split(key, l)
    ring = ring_for(param.ring)
    as_, bs = [], []
    for i, scale in enumerate(_scales(param, beta, l, 1)):
        ct = glwe_mod.encrypt_s(keys[i], param, sk, ring.scalar_mul_u64(m, scale),
                                batch=batch)
        as_.append(ct.a)
        bs.append(ct.b)
    return GLev(a=jnp.stack(as_, axis=-3), b=jnp.stack(bs, axis=-2))


def decrypt(param: Param, sk, glev: GLev, beta: int):
    ring = ring_for(param.ring)
    pt = glwe_mod.decrypt(param, sk,
                          GLWE(a=glev.a[..., 1, :, :], b=glev.b[..., 1, :]))
    return ring.mul_div_round(pt, beta, param.ring.q)


def mul_vec(param: Param, glev: GLev, v) -> GLWE:
    """Gadget dot product: sum_i GLWE_i · v_i, v: [..., l, n]
    (glev.rs:67-80) — one fused contraction per output component."""
    ring = ring_for(param.ring)
    b = ring.contract(glev.b, v)                               # [..., n]
    a = ring.contract(jnp.moveaxis(glev.a, -2, 0), v)          # [k, ..., n]
    return GLWE(a=jnp.moveaxis(a, 0, -2), b=b)
