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


def test_ckks_bootstrap_frozen_jit():
    """freeze() -> FrozenKeys: the whole bootstrap as ONE jitted function
    with key material passed as a pytree argument."""
    n, L = 32, 18
    delta0 = 2.0 ** 24
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(5), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(6)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    ct1, _ = P.level_drop(param, ct, 1)
    keys = B.BootstrapKeys(ks[2], param, sk)
    out_e, pout = B.bootstrap(param, keys, ct1, delta0=delta0)  # eager warmup
    arrays, static = B.freeze(keys)

    def _step(c0, c1, arr):
        fk = B.FrozenKeys(arr, static)
        out, _ = B.bootstrap(param, fk, C.CT(c0, c1), delta0=delta0)
        return out.c0, out.c1

    o0, o1 = jax.jit(_step)(ct1.c0, ct1.c1, arrays)
    rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, C.CT(o0, o1)))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    np.testing.assert_allclose(got, z, atol=1e-2)
    # jitted and eager paths agree bit-for-bit (same keys, same graph math)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(out_e.c0))


def test_ckks_bootstrap_staged_jits():
    """make_staged (per-stage jits) == the single-graph bootstrap,
    bit-for-bit (same keys, same math, smaller compiles)."""
    n, L = 32, 18
    delta0 = 2.0 ** 24
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(9), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(10)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    ct1, _ = P.level_drop(param, ct, 1)
    keys = B.BootstrapKeys(ks[2], param, sk)
    out_e, pout = B.bootstrap(param, keys, ct1, delta0=delta0)  # eager warmup
    arrays, static = B.freeze(keys)
    run = B.make_staged(param, static, delta0)
    out_s, pout_s = run(arrays, ct1.c0, ct1.c1)
    assert pout_s == pout
    np.testing.assert_array_equal(np.asarray(out_e.c0), np.asarray(out_s.c0))
    np.testing.assert_array_equal(np.asarray(out_e.c1), np.asarray(out_s.c1))
