"""CKKS bootstrapping end-to-end (ModRaise -> C2S -> EvalMod -> S2C)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng


def test_ckks_bootstrap_roundtrip():
    n, L = 32, 18
    delta0 = 2.0 ** 24
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(1)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    # exhaust the modulus: drop to level 1
    ct1, p1 = P.level_drop(param, ct, 1)
    # sanity: it still decrypts at level 1 (2-limb CRT needs >= 2... use 2)
    keys = B.BootstrapKeys(ks[2], param, sk)
    out, pout = B.bootstrap(param, keys, ct1, delta0=delta0)
    assert pout.L >= 3, f"bootstrap ended too low: L={pout.L}"
    rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    np.testing.assert_allclose(got, z, atol=1e-2)
