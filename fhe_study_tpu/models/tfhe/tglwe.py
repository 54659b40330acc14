"""TGLWE: RLWE over torus polynomials, GLWE<Tn> (reference tfhe/src/tglwe.rs).

    TGLWE(a=[..., K, N], b=[..., N])  — the generic gfhe GLWE pytree.

Key reinterpretation (TFHE 2018/421 §TLWE/TRLWE equivalence): a TLWE key in
B^{KN} and a TGLWE key in B_N[X]^K are reshapes of each other
(tglwe.rs:14-25, tlwe.rs:16-32).
"""

import jax.numpy as jnp

from ...arith import tn
from ...ops import modops
from ...utils import prng
from ..gfhe import glwe as G
from ..gfhe.glwe import GLWE, Param
from .tlwe import TLWE, TORUS_MAX

U64 = jnp.uint64

TGLWE = GLWE  # alias: a [..., K, N], b [..., N]


def sk_to_tlwe(s):
    """B_N[X]^K -> B^{KN}: flatten [..., K, N] -> [..., K*N] (tglwe.rs:15-24)."""
    return s.reshape(s.shape[:-2] + (s.shape[-2] * s.shape[-1],))


def sk_to_tglwe(s, k: int, n: int):
    """B^{KN} -> B_N[X]^K (tlwe.rs:20-31)."""
    return s.reshape(s.shape[:-1] + (k, n))


def new_key(key, param: Param, batch=()):
    """Sample a TLWE key of length K·N, reinterpret as K polys, derive pk
    (tglwe.rs:40-47)."""
    from . import tlwe as tlwe_mod
    k_s, k_pk = prng.split(key, 2)
    s_flat, _ = tlwe_mod.new_key(k_s, param.lwe(), batch=batch)
    s = sk_to_tglwe(s_flat, param.k, param.ring.n)
    pk = G.pk_from_sk(k_pk, param, s)
    return s, pk


def encode(param: Param, m):
    """m mod t -> coeffs · (u64::MAX // t) (tglwe.rs:49-58)."""
    delta = TORUS_MAX // param.t
    return jnp.asarray(m, U64) * U64(delta)


def decode(param: Param, p):
    return modops.coerce_u64(tn.mul_div_round(p, param.t, TORUS_MAX), param.t)


def new_const(param: Param, m):
    """Unscaled constant (tglwe.rs:66-73)."""
    return jnp.asarray(m, U64)


# encryption / ops delegate to the generic GLWE layer
def from_plaintext(param: Param, p):
    return G.from_plaintext(param, p)


def encrypt_s(key, param: Param, s, p, batch=()):
    return G.encrypt_s(key, param, s, p, batch=batch)


def encrypt(key, param: Param, pk, p, batch=()):
    return G.encrypt(key, param, pk, p, batch=batch)


def decrypt(param: Param, s, ct: TGLWE):
    return G.decrypt(param, s, ct)


def sample_extraction(param: Param, ct: TGLWE, h) -> TLWE:
    """Extract coefficient h as a TLWE over the flattened K·N key
    (tglwe.rs:89-115): a'_{ni+j} = a_{i,h-j} if j<=h else -a_{i,n+h-j}."""
    n = param.ring.n
    j = jnp.arange(n)
    h = jnp.asarray(h, jnp.int64)
    idx = jnp.where(j <= h, h - j, n + h - j)
    sign_flip = j > h
    vals = jnp.take(ct.a, idx, axis=-1)                     # [..., K, N]
    vals = jnp.where(sign_flip, U64(0) - vals, vals)
    new_a = vals.reshape(vals.shape[:-2] + (param.kn,))
    b_h = jnp.take(ct.b, h[None], axis=-1)[..., 0]
    return TLWE(a=new_a, b=b_h)


def left_rotate(param: Param, ct: TGLWE, h) -> TGLWE:
    """Multiply every component by X^{-h}, h in [0, 2N) (tglwe.rs:116-119).
    h broadcasts per batch; the mask gets an extra axis to broadcast over K."""
    n = param.ring.n
    h = jnp.asarray(h)
    h_a = h[..., None] if h.ndim > 0 else h
    return TGLWE(a=tn.left_rotate(ct.a, h_a, n), b=tn.left_rotate(ct.b, h, n))


def add(param: Param, c0, c1):
    return G.add(param, c0, c1)


def sub(param: Param, c0, c1):
    return G.sub(param, c0, c1)


def add_pt(param: Param, c, p):
    return G.add_pt(param, c, p)


def sub_pt(param: Param, c, p):
    return G.sub_pt(param, c, p)


def mul_pt(param: Param, c, p):
    return G.mul_pt(param, c, p)
