"""TFHE tests (reference tfhe/src/{tlwe,tlev,tgsw,tglwe,tggsw}.rs tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.arith import RingParam, tn
from fhe_study_tpu.arith.params import TORUS_Q
from fhe_study_tpu.models.gfhe.glwe import Param, ERR_SIGMA
from fhe_study_tpu.models.tfhe import tlwe, tlev, tgsw, tglwe, tggsw
from fhe_study_tpu.ops import modops
from fhe_study_tpu.utils import prng
import pytest

B = 32


def _param(n, k, t):
    return Param(ERR_SIGMA, RingParam(TORUS_Q, n), k, t)


def _msgs(key, t, shape):
    return prng.uniform_mod(key, shape, t)


# -- TLWE (tlwe.rs:289-463) -------------------------------------------------

def test_tlwe_encrypt_decrypt():
    param = _param(1, 16, 128)
    k1, k2, k3, k4 = prng.split(jax.random.PRNGKey(0), 4)
    s, pk = tlwe.new_key(k1, param)
    m = _msgs(k2, param.t, (B,))
    p = tlwe.encode(param, m)
    c = tlwe.encrypt(k3, param, pk, p, batch=(B,))
    np.testing.assert_array_equal(np.asarray(tlwe.decode(param, tlwe.decrypt(param, s, c))),
                                  np.asarray(m))
    c = tlwe.encrypt_s(k4, param, s, p, batch=(B,))
    np.testing.assert_array_equal(np.asarray(tlwe.decode(param, tlwe.decrypt(param, s, c))),
                                  np.asarray(m))


def test_tlwe_ops():
    param = _param(1, 16, 128)
    k1, k2, k3, k4, k5 = prng.split(jax.random.PRNGKey(1), 5)
    s, pk = tlwe.new_key(k1, param)
    m1 = _msgs(k2, param.t, (B,))
    m2 = _msgs(k3, param.t, (B,))
    c1 = tlwe.encrypt(k4, param, pk, tlwe.encode(param, m1), batch=(B,))
    c2 = tlwe.encrypt(k5, param, pk, tlwe.encode(param, m2), batch=(B,))

    # ct + ct
    rec = tlwe.decode(param, tlwe.decrypt(param, s, tlwe.add(c1, c2)))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 + m2, param.t)))
    # ct + pt
    rec = tlwe.decode(param, tlwe.decrypt(param, s, tlwe.add_pt(c1, tlwe.encode(param, m2))))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 + m2, param.t)))
    # ct * pt (unscaled const)
    rec = tlwe.decode(param, tlwe.decrypt(param, s, tlwe.mul_pt(c1, tlwe.new_const(param, m2))))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 * m2, param.t)))


def test_tlwe_key_switch():
    # tlwe.rs:424-463 (beta=2, l=64)
    param = _param(1, 16, 128)
    k1, k2, k3, k4, k5 = prng.split(jax.random.PRNGKey(2), 5)
    s, pk = tlwe.new_key(k1, param)
    s2, _ = tlwe.new_key(k2, param)
    ksk = tlwe.new_ksk(k3, param, 2, 64, s, s2)
    m = _msgs(k4, param.t, (B,))
    p = tlwe.encode(param, m)

    for enc_key, enc in ((k5, lambda k: tlwe.encrypt_s(k, param, s, p, batch=(B,))),
                         (k5, lambda k: tlwe.encrypt(k, param, pk, p, batch=(B,)))):
        c = enc(enc_key)
        c2 = tlwe.key_switch(param, 2, 64, ksk, c)
        rec = tlwe.decode(param, tlwe.decrypt(param, s2, c2))
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


# -- TLev (tlev.rs:114-181) -------------------------------------------------

def test_tlev_encrypt_decrypt():
    param = _param(1, 16, 2)
    k1, k2, k3 = prng.split(jax.random.PRNGKey(3), 3)
    s, pk = tlwe.new_key(k1, param)
    m = _msgs(k2, param.t, (B,))
    c = tlev.encrypt(k3, param, 2, 16, pk, m, batch=(B,))
    rec = tlev.decode(param, tlev.decrypt(param, s, c, 2))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


def test_tlev_vec_product():
    # tlev.rs:145-181 (l=64)
    param = _param(1, 16, 2)
    k1, k2, k3, k4 = prng.split(jax.random.PRNGKey(4), 4)
    s, pk = tlwe.new_key(k1, param)
    m1 = _msgs(k2, param.t, (B,))
    m2 = _msgs(k3, param.t, (B,))
    c1 = tlev.encrypt(k4, param, 2, 64, pk, m1, batch=(B,))
    d2 = jnp.moveaxis(tn.decompose(tlwe.encode(param, m2), 2, 64), 0, -1)  # [B, l]
    c3 = tlev.mul_vec(c1, d2)
    rec = tlwe.decode(param, tlwe.decrypt(param, s, c3))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 * m2, param.t)))


# -- TGSW (tgsw.rs:74-188) --------------------------------------------------

def test_tgsw_encrypt_decrypt():
    param = _param(1, 16, 2)
    k1, k2, k3 = prng.split(jax.random.PRNGKey(5), 5)[:3]
    s, _ = tlwe.new_key(k1, param)
    m = _msgs(k2, param.t, (B,))
    c = tgsw.encrypt_s(k3, param, 2, 16, s, m, batch=(B,))
    rec = tlev.decode(param, tgsw.decrypt(param, s, c, 2))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


def test_tgsw_external_product_and_cmux():
    # tgsw.rs:104-188 (k=32, l=64)
    param = _param(1, 32, 2)
    k1, k2, k3, k4, k5, k6 = prng.split(jax.random.PRNGKey(6), 6)
    s, _ = tlwe.new_key(k1, param)
    m1 = _msgs(k2, param.t, (B,))
    m2 = _msgs(k3, param.t, (B,))
    g = tgsw.encrypt_s(k4, param, 2, 64, s, m1, batch=(B,))
    c = tlwe.encrypt_s(k5, param, s, tlwe.encode(param, m2), batch=(B,))
    res = tgsw.external_product(param, 2, 64, g, c)
    rec = tlwe.decode(param, tlwe.decrypt(param, s, res))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 * m2, param.t)))

    # cmux truth table
    for bit_raw in (0, 1):
        bit = tgsw.encrypt_s(k6, param, 2, 64, s,
                             jnp.full((B,), bit_raw, jnp.uint64), batch=(B,))
        c1 = tlwe.encrypt_s(k5, param, s, tlwe.encode(param, m1), batch=(B,))
        c2 = tlwe.encrypt_s(k4, param, s, tlwe.encode(param, m2), batch=(B,))
        res = tgsw.cmux(param, 2, 64, bit, c1, c2)
        rec = tlwe.decode(param, tlwe.decrypt(param, s, res))
        want = m2 if bit_raw else m1
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


# -- TGLWE (tglwe.rs:203-368) -----------------------------------------------

def test_tglwe_encrypt_decrypt_and_ops():
    param = _param(64, 16, 128)
    k1, k2, k3, k4, k5 = prng.split(jax.random.PRNGKey(7), 5)
    s, pk = tglwe.new_key(k1, param)
    m1 = _msgs(k2, param.t, (B, param.ring.n))
    m2 = _msgs(k3, param.t, (B, param.ring.n))
    p1 = tglwe.encode(param, m1)
    p2 = tglwe.encode(param, m2)

    c1 = tglwe.encrypt(k4, param, pk, p1, batch=(B,))
    rec = tglwe.decode(param, tglwe.decrypt(param, s, c1))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m1))

    c1s = tglwe.encrypt_s(k5, param, s, p1, batch=(B,))
    rec = tglwe.decode(param, tglwe.decrypt(param, s, c1s))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m1))

    c2 = tglwe.encrypt(k5, param, pk, p2, batch=(B,))
    rec = tglwe.decode(param, tglwe.decrypt(param, s, tglwe.add(param, c1, c2)))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 + m2, param.t)))

    rec = tglwe.decode(param, tglwe.decrypt(param, s, tglwe.add_pt(param, c1, p2)))
    np.testing.assert_array_equal(np.asarray(rec),
                                  np.asarray(modops.coerce_u64(m1 + m2, param.t)))

    # ct * pt: exact integer negacyclic product mod t
    from fhe_study_tpu.arith import rn
    c3 = tglwe.mul_pt(param, c1, tglwe.new_const(param, m2))
    rec = tglwe.decode(param, tglwe.decrypt(param, s, c3))
    want = rn.to_rq(rn.naive_poly_mul(m1.astype(jnp.int64), m2.astype(jnp.int64)),
                    param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))


def test_sample_extraction():
    # tglwe.rs:337-368: extract every coefficient h
    param = _param(64, 4, 128)
    k1, k2, k3 = prng.split(jax.random.PRNGKey(8), 3)
    s, pk = tglwe.new_key(k1, param)
    s_flat = tglwe.sk_to_tlwe(s)
    m = _msgs(k2, param.t, (8, param.ring.n))
    c = tglwe.encrypt(k3, param, pk, tglwe.encode(param, m), batch=(8,))
    for h in range(0, param.ring.n, 7):
        c_h = tglwe.sample_extraction(param, c, h)
        rec = tlwe.decode(param, tlwe.decrypt(param.lwe(), s_flat, c_h))
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(m[:, h]))


# -- TGGSW (tggsw.rs:157-196) ----------------------------------------------

@pytest.mark.slow
def test_tggsw_external_product_evals_fast_path():
    """Pre-transformed (Fourier-domain-BSK style) external product is
    bit-identical to the generic path."""
    param = _param(128, 1, 16)
    k1, k2, k3, k4 = prng.split(jax.random.PRNGKey(20), 4)
    s, _ = tglwe.new_key(k1, param)
    beta, l = 256, 3
    m1 = prng.uniform_mod(k2, (4, param.ring.n), 2)
    m2 = prng.uniform_mod(k3, (4, param.ring.n), param.t)
    g = tggsw.encrypt_s(k4, param, beta, l, s, tggsw.tglev_encode(param, m1),
                        batch=(4,))
    c = tglwe.encrypt_s(k4, param, s, tglwe.encode(param, m2), batch=(4,))
    want = tggsw.external_product(param, beta, l, g, c)
    gev = tggsw.precompute_evals(param, g)
    got = tggsw.external_product_evals(param, gev, c, beta, l)
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))


def test_tggsw_external_product():
    param = _param(64, 4, 16)
    k1, k2, k3, k4, k5 = prng.split(jax.random.PRNGKey(9), 5)
    s, _ = tglwe.new_key(k1, param)
    m1 = _msgs(k2, param.t, (4, param.ring.n))
    m2 = _msgs(k3, param.t, (4, param.ring.n))
    g = tggsw.encrypt_s(k4, param, 2, 64, s, tggsw.tglev_encode(param, m1), batch=(4,))
    c = tglwe.encrypt_s(k5, param, s, tglwe.encode(param, m2), batch=(4,))
    res = tggsw.external_product(param, 2, 64, g, c)
    rec = tglwe.decode(param, tglwe.decrypt(param, s, res))
    from fhe_study_tpu.arith import rn
    want = rn.to_rq(rn.naive_poly_mul(m1.astype(jnp.int64), m2.astype(jnp.int64)),
                    param.t, param.ring.n)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(want))
