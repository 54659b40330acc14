"""Double-prime-scale (delta ~ 2^60) polynomial evaluation: mul_ct2 chains
and poly_eval2 keep ~49-bit slot precision (vs ~24-bit for the single-prime
ladder) — the EvalMod substrate of the high-precision bootstrap."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng
import pytest


def _setup(n=64, L=10, seed=3):
    delta = C.delta2(C.Param(n=n, L=L, delta=1.0))
    param = C.Param(n=n, L=L, delta=delta)
    ks = prng.split(jax.random.PRNGKey(seed), 3)
    sk, pk = C.new_key(ks[0], param)
    rlks = P.rlk_keys_all_levels(ks[1], param, sk)
    rng = np.random.default_rng(7)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ct = C.encrypt(ks[2], param, pk,
                   C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    return param, sk, rlks, z, ct


@pytest.mark.slow
def test_mul_ct2_chain():
    param, sk, rlks, z, ct = _setup()
    y2, p2 = P.mul_ct2(rlks, ct, param, ct, param)
    y3, p3 = P.mul_ct2(rlks, y2, p2, ct, param)
    assert p3.L == param.L - 4
    # scale stays stationary at ~delta (exact-float bookkeeping)
    assert 0.5 < p3.delta / param.delta < 2.0
    rr, ri = C.decode(p3, C.decrypt_to_coeffs(p3, sk, y3))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    np.testing.assert_allclose(got, z ** 3, atol=1e-12)


def test_poly_eval2_precision():
    # smallest config with the full double-drop ladder: deg-3 poly consumes
    # 6 levels and decrypt_to_coeffs needs 3 left (L=9); n=32 keeps every
    # compile tiny (same code paths as the L=10 slow-tier chain test)
    param, sk, rlks, z, ct = _setup(n=32, L=9)
    out, pout = P.poly_eval2(rlks, ct, param, [0.5, 1.0, 0.0, -0.25])
    assert pout.delta == param.delta          # fold restores the scale EXACTLY
    rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    np.testing.assert_allclose(got, 0.5 + z - 0.25 * z ** 3, atol=1e-12)
