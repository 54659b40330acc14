"""Homomorphic polynomial evaluation (hybrid relin, level alignment)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng


def _setup(n=32, L=8, delta=2.0 ** 28, seed=0):
    param = C.Param(n=n, L=L, delta=delta)
    ks = prng.split(jax.random.PRNGKey(seed), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(seed + 1)
    z = rng.uniform(-1, 1, n // 2)  # real inputs in [-1, 1]
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z), jnp.zeros(n // 2)))
    return param, sk, ks[2], z, ct


def _dec(param, sk, ct):
    rr, ri = C.decode(param, C.decrypt_to_coeffs(param, sk, ct))
    return np.asarray(rr) + 1j * np.asarray(ri)


def test_mul_hybrid_chain():
    """Three chained squarings at delta=2^28: x^8 with low noise."""
    param, sk, kk, z, ct = _setup()
    hrlks = P.rlk_keys_all_levels(kk, param, sk)
    x, px = ct, param
    for _ in range(3):
        x, px = P.mul_ct(hrlks, x, px, x, px)
    got = _dec(px, sk, x)
    np.testing.assert_allclose(got.real, z ** 8, atol=3e-3)
    np.testing.assert_allclose(got.imag, 0, atol=3e-3)


def test_poly_eval_degree7():
    """p(x) = 1 - 2x + 0.5 x^3 - 0.25 x^7 evaluated slot-wise."""
    param, sk, kk, z, ct = _setup(seed=2)
    hrlks = P.rlk_keys_all_levels(kk, param, sk)
    coeffs = [1.0, -2.0, 0.0, 0.5, 0.0, 0.0, 0.0, -0.25]
    out, pout = P.poly_eval(hrlks, ct, param, coeffs)
    want = sum(c * z ** k for k, c in enumerate(coeffs))
    got = _dec(pout, sk, out)
    np.testing.assert_allclose(got.real, want, atol=5e-3)
    np.testing.assert_allclose(got.imag, 0, atol=5e-3)
