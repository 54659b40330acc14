"""BFV scheme tests (reference bfv/src/lib.rs tests, batched)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.arith import RingParam, rn
from fhe_study_tpu.models import bfv
from fhe_study_tpu.ops import modops
from fhe_study_tpu.utils import prng

Q = 2 ** 16 + 1


def _msg(key, param, batch=()):
    return prng.uniform_mod(key, tuple(batch) + (param.ring.n,), param.t)


def _naive_pt_mul(m1, m2, t, n):
    """(m1.to_r() * m2.to_r()).to_rq(t) — exact integer product mod t."""
    return rn.to_rq(rn.naive_poly_mul(m1.astype(jnp.int64), m2.astype(jnp.int64)), t, n)


def test_encrypt_decrypt():
    # reference bfv/src/lib.rs:281-307 (n=512, t=32)
    param = bfv.Param(RingParam(Q, 512), 32, 0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = prng.split(key, 3)
    B = 32
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    m = _msg(k2, param, (B,))
    c = bfv.encrypt(k3, param, pk, m, batch=(B,))
    rec = bfv.decrypt(param, sk, c)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


def test_addition():
    # reference bfv/src/lib.rs:309-340 (n=128, t=32)
    param = bfv.Param(RingParam(Q, 128), 32, 0)
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4, k5 = prng.split(key, 5)
    B = 32
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    m1 = _msg(k2, param, (B,))
    m2 = _msg(k3, param, (B,))
    c1 = bfv.encrypt(k4, param, pk, m1, batch=(B,))
    c2 = bfv.encrypt(k5, param, pk, m2, batch=(B,))
    rec = bfv.decrypt(param, sk, bfv.add(c1, c2, param))
    want = modops.coerce_u64(m1 + m2, param.t)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


def test_constant_add_mul():
    # reference bfv/src/lib.rs:342-377 (n=16, t=8, p=q^2)
    param = bfv.Param(RingParam(Q, 16), 8, Q * Q)
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4, k5 = prng.split(key, 5)
    B = 16
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    m1 = _msg(k2, param, (B,))
    m2 = _msg(k3, param, (B,))
    c1 = bfv.encrypt(k4, param, pk, m1, batch=(B,))

    rec = bfv.decrypt(param, sk, bfv.add_const(param, c1, m2))
    want = modops.coerce_u64(m1 + m2, param.t)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))

    rlk = bfv.rlk_key(k5, param, sk, batch=(B,))
    rec = bfv.decrypt(param, sk, bfv.mul_const(param, rlk, c1, m2))
    want = _naive_pt_mul(m1, m2, param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


def test_tensor():
    # reference bfv/src/lib.rs:504-555 (n=16, t=2, p=q^2; 1000 iters -> batch)
    param = bfv.Param(RingParam(Q, 16), 2, Q * Q)
    q, n = Q, 16
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = prng.split(key, 5)
    B = 1000
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    m1 = _msg(k2, param, (B,))
    m2 = _msg(k3, param, (B,))
    c1 = bfv.encrypt(k4, param, pk, m1, batch=(B,))
    c2 = bfv.encrypt(k5, param, pk, m2, batch=(B,))

    ca, cb, cc = bfv.tensor(param, c1, c2)
    # decrypt the degree-2 ciphertext: ca + cb*s + cc*s^2
    from fhe_study_tpu.arith import rq
    s = sk.s
    s2 = rq.from_i64(rn.naive_poly_mul(s.astype(jnp.int64), s.astype(jnp.int64)), q, n)
    m3 = rq.add(rq.add(ca, rq.mul(cb, s, q), q), rq.mul(cc, s2, q), q)
    m3 = modops.coerce_u64(rq.mul_div_round(m3, param.t, q, q), param.t)
    want = _naive_pt_mul(m1, m2, param.t, n)
    np.testing.assert_array_equal(np.asarray(m3), np.asarray(want))


def test_mul_relin():
    # reference bfv/src/lib.rs:557-601 (n=16, t=2, p=q^2; 1000 iters -> batch)
    param = bfv.Param(RingParam(Q, 16), 2, Q * Q)
    key = jax.random.PRNGKey(4)
    k1, k2, k3, k4, k5, k6 = prng.split(key, 6)
    B = 1000
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    rlk = bfv.rlk_key(k2, param, sk, batch=(B,))
    m1 = _msg(k3, param, (B,))
    m2 = _msg(k4, param, (B,))
    c1 = bfv.encrypt(k5, param, pk, m1, batch=(B,))
    c2 = bfv.encrypt(k6, param, pk, m2, batch=(B,))

    c3 = bfv.mul(param, rlk, c1, c2)
    rec = bfv.decrypt(param, sk, c3)
    want = _naive_pt_mul(m1, m2, param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


def test_mul_relin_f64_variant():
    """The reference's dead f64 relinearization (bfv/src/lib.rs:227-250):
    fold-then-round order; decrypts to the same product as relinearize."""
    param = bfv.Param(RingParam(Q, 16), 2, Q * Q)
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4, k5, k6 = prng.split(key, 6)
    B = 64
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    rlk = bfv.rlk_key(k2, param, sk, batch=(B,))
    m1 = _msg(k3, param, (B,))
    m2 = _msg(k4, param, (B,))
    c1 = bfv.encrypt(k5, param, pk, m1, batch=(B,))
    c2 = bfv.encrypt(k6, param, pk, m2, batch=(B,))
    t0, t1, t2 = bfv.tensor(param, c1, c2)
    c3 = bfv.relinearize_f64(param, rlk, t0, t1, t2)
    rec = bfv.decrypt(param, sk, c3)
    want = _naive_pt_mul(m1, m2, param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


def test_mul_relin_fast_path():
    """Device (CRT-NTT) path decrypts correctly too (n=64 to engage NTT)."""
    param = bfv.Param(RingParam(Q, 64), 2, Q * Q)
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4, k5, k6 = prng.split(key, 6)
    B = 64
    sk, pk = bfv.new_key(k1, param, batch=(B,))
    rlk = bfv.rlk_key(k2, param, sk, batch=(B,))
    m1 = _msg(k3, param, (B,))
    m2 = _msg(k4, param, (B,))
    c1 = bfv.encrypt(k5, param, pk, m1, batch=(B,))
    c2 = bfv.encrypt(k6, param, pk, m2, batch=(B,))

    c3 = bfv.mul(param, rlk, c1, c2, fast=True)
    rec = bfv.decrypt(param, sk, c3)
    want = _naive_pt_mul(m1, m2, param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))
