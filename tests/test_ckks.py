"""CKKS tests (reference ckks/src/encoder.rs + lib.rs tests, batched)."""

import numpy as np
import jax

from fhe_study_tpu.arith import RingParam
from fhe_study_tpu.models.ckks import Encoder, ckks
from fhe_study_tpu.utils import prng

Q = 2 ** 16 + 1


def _rand_z(rng, batch, half, t):
    return (rng.integers(0, t, size=batch + (half,)) +
            1j * rng.integers(0, t, size=batch + (half,))).astype(np.complex128)


def test_encode_decode():
    # reference encoder.rs:155-187 (n=32, delta=64, values < 128)
    n, delta, t = 32, 64.0, 128
    rng = np.random.default_rng(0)
    enc = Encoder(n, delta)
    z = _rand_z(rng, (100,), n // 2, t)
    m = enc.encode(z)
    z2 = enc.decode(m)
    np.testing.assert_array_equal(np.round(z2.real), z.real)
    np.testing.assert_array_equal(np.round(z2.imag), z.imag)


def test_encoder_equals_vandermonde_solve():
    """The FFT encoder computes EXACTLY what the reference's
    projection + Vandermonde linear solve computes (encoder.rs:57-99):
    build V_{ji} = w^{(2j+1)i}, run the reference pipeline with numpy's
    solver, compare rounded coefficients."""
    n, delta, t = 16, 512.0, 8
    rng = np.random.default_rng(42)
    enc = Encoder(n, delta)
    z = _rand_z(rng, (), n // 2, t)

    w = np.exp(2j * np.pi / (2 * n))
    V = np.array([[w ** ((2 * j + 1) * i) for i in range(n)] for j in range(n)])
    expanded = np.concatenate([z, np.conj(z[::-1])]) * delta
    # projection onto the rows of V^T (columns of V), real part only
    zp = np.array([np.real(np.vdot(V[:, i], expanded)) / n for i in range(n)])
    discretized = V @ zp
    alpha = np.linalg.solve(V, discretized)
    want = np.round(alpha.real).astype(np.int64)

    got = enc.encode(z)
    np.testing.assert_array_equal(got, want)


def test_encrypt_decrypt():
    # reference ckks/src/lib.rs:125-161 (n=32, t=50, delta=512)
    n, t, delta = 32, 50, 512
    param = ckks.Param(RingParam(Q, n), t)
    key = jax.random.PRNGKey(0)
    k1, k2 = prng.split(key, 2)
    B = 200
    rng = np.random.default_rng(1)
    sk, pk = ckks.new_key(k1, param, batch=(B,))

    m_raw = rng.integers(0, t, size=(B, n)).astype(np.int64)
    m = m_raw * int(delta)
    ct = ckks.encrypt(k2, param, pk, m, batch=(B,))
    dec = np.asarray(ckks.decrypt(param, sk, ct))
    rec = np.round(dec / delta).astype(np.int64)
    np.testing.assert_array_equal(rec % Q, m_raw % Q)


def test_encode_encrypt_decrypt_decode():
    # reference ckks/src/lib.rs:163-210 (n=16, t=8, delta=512)
    n, t, delta = 16, 8, 512.0
    param = ckks.Param(RingParam(Q, n), t)
    enc = Encoder(n, delta)
    key = jax.random.PRNGKey(2)
    k1, k2 = prng.split(key, 2)
    B = 200
    rng = np.random.default_rng(3)
    sk, pk = ckks.new_key(k1, param, batch=(B,))
    z = _rand_z(rng, (B,), n // 2, t)
    m = enc.encode(z)
    # sanity: encode/decode round trip
    z_dec = enc.decode(m)
    np.testing.assert_array_equal(np.round(z_dec.real), z.real)

    ct = ckks.encrypt(k2, param, pk, m, batch=(B,))
    m_dec = np.asarray(ckks.decrypt(param, sk, ct))
    z2 = enc.decode(m_dec)
    np.testing.assert_array_equal(np.round(z2.real), z.real)
    np.testing.assert_array_equal(np.round(z2.imag), z.imag)


def test_add_sub():
    # reference ckks/src/lib.rs:212-304 (n=16, delta=1024); sub here is the
    # CORRECT subtraction (the reference's sign bug is documented in ckks.py)
    n, t, delta = 16, 8, 1024.0
    param = ckks.Param(RingParam(Q, n), t)
    enc = Encoder(n, delta)
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = prng.split(key, 3)
    B = 200
    rng = np.random.default_rng(5)
    sk, pk = ckks.new_key(k1, param, batch=(B,))
    z0 = _rand_z(rng, (B,), n // 2, t)
    z1 = _rand_z(rng, (B,), n // 2, t)
    ct0 = ckks.encrypt(k2, param, pk, enc.encode(z0), batch=(B,))
    ct1 = ckks.encrypt(k3, param, pk, enc.encode(z1), batch=(B,))

    za = enc.decode(np.asarray(ckks.decrypt(param, sk, ckks.add(param, ct0, ct1))))
    np.testing.assert_array_equal(np.round(za.real), (z0 + z1).real)
    np.testing.assert_array_equal(np.round(za.imag), (z0 + z1).imag)

    zs = enc.decode(np.asarray(ckks.decrypt(param, sk, ckks.sub(param, ct0, ct1))))
    np.testing.assert_array_equal(np.round(zs.real), (z0 - z1).real)
    np.testing.assert_array_equal(np.round(zs.imag), (z0 - z1).imag)


def test_sub_reference_quirk_matches_reference_observable():
    """The reference's buggy sub still decrypts correctly ONLY because its
    public keys are ternary (tiny c1) — reproduce that observable."""
    n, t, delta = 16, 2, 1024.0
    param = ckks.Param(RingParam(Q, n), t)
    enc = Encoder(n, delta)
    key = jax.random.PRNGKey(6)
    k1, k2, k3 = prng.split(key, 3)
    B = 100
    rng = np.random.default_rng(7)
    sk, pk = ckks.new_key(k1, param, batch=(B,))
    z0 = _rand_z(rng, (B,), n // 2, t)
    z1 = _rand_z(rng, (B,), n // 2, t)
    ct0 = ckks.encrypt(k2, param, pk, enc.encode(z0), batch=(B,))
    ct1 = ckks.encrypt(k3, param, pk, enc.encode(z1), batch=(B,))
    zs = enc.decode(np.asarray(ckks.decrypt(
        param, sk, ckks.sub_reference_quirk(param, ct0, ct1))))
    np.testing.assert_array_equal(np.round(zs.real), (z0 - z1).real)
    np.testing.assert_array_equal(np.round(zs.imag), (z0 - z1).imag)
