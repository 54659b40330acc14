"""RNS-CKKS: limb-partitioned encode/encrypt/add + multiply-rescale."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.utils import prng
import pytest


def _slots(rng, B, half, t):
    return (rng.uniform(-t, t, (B, half)), rng.uniform(-t, t, (B, half)))


def test_encode_encrypt_add_decrypt_decode():
    param = C.Param(n=256, L=3, delta=2.0 ** 28)
    rng = np.random.default_rng(0)
    B = 8
    z0r, z0i = _slots(rng, B, param.n // 2, 8)
    z1r, z1i = _slots(rng, B, param.n // 2, 8)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = prng.split(key, 3)
    sk, pk = C.new_key(k1, param)

    c0 = C.encrypt(k2, param, pk, C.encode(param, z0r, z0i), batch=(B,))
    c1 = C.encrypt(k3, param, pk, C.encode(param, z1r, z1i), batch=(B,))
    ct = C.add(param, c0, c1)
    zr, zi = C.decode(param, C.decrypt_to_coeffs(param, sk, ct))
    np.testing.assert_allclose(np.asarray(zr), z0r + z1r, atol=1e-3)
    np.testing.assert_allclose(np.asarray(zi), z0i + z1i, atol=1e-3)

    ct = C.sub(param, c0, c1)
    zr, zi = C.decode(param, C.decrypt_to_coeffs(param, sk, ct))
    np.testing.assert_allclose(np.asarray(zr), z0r - z1r, atol=1e-3)


def test_mul_rescale():
    param = C.Param(n=256, L=3, delta=2.0 ** 25)
    rng = np.random.default_rng(1)
    B = 4
    z0r, z0i = _slots(rng, B, param.n // 2, 2)
    z1r, z1i = _slots(rng, B, param.n // 2, 2)
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = prng.split(key, 4)
    sk, pk = C.new_key(k1, param)
    rlk = C.rlk_key(k2, param, sk)

    c0 = C.encrypt(k3, param, pk, C.encode(param, z0r, z0i), batch=(B,))
    c1 = C.encrypt(k4, param, pk, C.encode(param, z1r, z1i), batch=(B,))
    ct, p2 = C.mul(param, rlk, c0, c1)
    sk2 = C.SecretKey(sk.s_evals[: p2.L])
    zr, zi = C.decode(p2, C.decrypt_to_coeffs(p2, sk2, ct))
    want = (z0r + 1j * z0i) * (z1r + 1j * z1i)
    np.testing.assert_allclose(np.asarray(zr), want.real, atol=3e-2)
    np.testing.assert_allclose(np.asarray(zi), want.imag, atol=3e-2)


@pytest.mark.slow
def test_high_precision_double_prime_scale():
    """Double-prime scale delta ~= q_{L-1}*q_{L-2} ~= 2^60: a two-deep
    hybrid multiply chain keeps ~40+ bits of slot precision (vs ~2^-24 at
    the single-prime delta=2^30 ceiling).  Decrypt goes through the 3-limb
    centered Garner CRT."""
    L = 7
    qs = C.Param(n=256, L=L, delta=1.0).qs
    param = C.Param(n=256, L=L, delta=C.delta2(qs))
    assert param.delta > 2.0 ** 58
    rng = np.random.default_rng(5)
    B = 2
    z0r, z0i = _slots(rng, B, param.n // 2, 1)
    z1r, z1i = _slots(rng, B, param.n // 2, 1)
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4, k5 = prng.split(key, 5)
    sk, pk = C.new_key(k1, param)
    hrlk = C.hybrid_rlk(k2, param, sk)

    c0 = C.encrypt(k3, param, pk, C.encode(param, z0r, z0i), batch=(B,))
    c1 = C.encrypt(k4, param, pk, C.encode(param, z1r, z1i), batch=(B,))

    # fresh decrypt at delta=2^60: ~50-bit precision
    zr, zi = C.decode(param, C.decrypt_to_coeffs(param, sk, c0))
    np.testing.assert_allclose(np.asarray(zr), z0r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(zi), z0i, atol=1e-12)

    # multiply 1: L -> L-2, scale stays ~2^60
    ct, p2 = C.mul_hybrid2(param, hrlk, c0, c1)
    assert p2.L == L - 2 and p2.delta > 2.0 ** 58
    sk2 = C.SecretKey(sk.s_evals[: p2.L])
    zr, zi = C.decode(p2, C.decrypt_to_coeffs(p2, sk2, ct))
    want = (z0r + 1j * z0i) * (z1r + 1j * z1i)
    np.testing.assert_allclose(np.asarray(zr), want.real, atol=1e-9)
    np.testing.assert_allclose(np.asarray(zi), want.imag, atol=1e-9)

    # multiply 2 (squaring the product): L-2 -> L-4, still high precision
    hrlk2 = C.hybrid_rlk(k5, p2, sk)
    ct2, p3 = C.mul_hybrid2(p2, hrlk2, ct, ct)
    assert p3.L == L - 4
    sk3 = C.SecretKey(sk.s_evals[: p3.L])
    zr, zi = C.decode(p3, C.decrypt_to_coeffs(p3, sk3, ct2))
    want2 = want * want
    np.testing.assert_allclose(np.asarray(zr), want2.real, atol=1e-8)
    np.testing.assert_allclose(np.asarray(zi), want2.imag, atol=1e-8)
