"""u32 Montgomery elementwise ops: exactness against Python big ints."""

import numpy as np
import jax.numpy as jnp

from fhe_study_tpu.ops import modops32 as M32
from fhe_study_tpu.ops.primes import ntt_primes


def test_mont_mulmod_exact():
    qs = ntt_primes(4, 30, 1 << 16)
    qv, nqv, r2v = M32.consts(qs, 2)
    rng = np.random.default_rng(0)
    a = np.stack([rng.integers(0, q, 1000) for q in qs])
    b = np.stack([rng.integers(0, q, 1000) for q in qs])
    got = np.asarray(M32.mulmod(jnp.asarray(a, jnp.uint32),
                                jnp.asarray(b, jnp.uint32),
                                jnp.asarray(qv), jnp.asarray(nqv),
                                jnp.asarray(r2v)))
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(got[i], (a[i] * b[i]) % q)


def test_mont_domain_roundtrip_and_edge_values():
    qs = (ntt_primes(1, 30, 1 << 16))
    q = qs[0]
    qv, nqv, r2v = M32.consts(qs, 1)
    vals = np.array([0, 1, 2, q - 1, q - 2, q // 2], np.uint32)
    vm = M32.to_mont(jnp.asarray(vals), jnp.asarray(qv), jnp.asarray(nqv),
                     jnp.asarray(r2v))
    # multiply by 1 (normal) through mont: recovers the value
    back = M32.mont_mul(jnp.ones_like(vm), vm, jnp.asarray(qv),
                        jnp.asarray(nqv))
    np.testing.assert_array_equal(np.asarray(back), vals)


def test_addsub():
    qs = ntt_primes(2, 30, 1 << 16)
    qv, _, _ = M32.consts(qs, 2)
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, q, 500) for q in qs])
    b = np.stack([rng.integers(0, q, 500) for q in qs])
    ja, jb, jq = map(jnp.asarray, (a.astype(np.uint32), b.astype(np.uint32), qv))
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(np.asarray(M32.addmod(ja, jb, jq))[i],
                                      (a[i] + b[i]) % q)
        np.testing.assert_array_equal(np.asarray(M32.submod(ja, jb, jq))[i],
                                      (a[i] - b[i]) % q)
        np.testing.assert_array_equal(np.asarray(M32.negmod(ja, jq))[i],
                                      (-a[i]) % q)
