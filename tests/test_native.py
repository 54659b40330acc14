"""Cross-check the JAX arithmetic paths against the independent native C++
golden model (shares no code/tables; catches modmul/NTT edge-case bugs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from fhe_study_tpu.runtime import native
from fhe_study_tpu.ops import ntt, modops
from fhe_study_tpu.arith import rq, tn, rn

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_mulmod_cross():
    rng = np.random.default_rng(0)
    for q in (65537, 2013265921, 65537 ** 3):
        a = rng.integers(0, q, 32, dtype=np.uint64)
        b = rng.integers(0, q, 32, dtype=np.uint64)
        got = np.asarray(modops.mulmod(jnp.asarray(a), jnp.asarray(b), q))
        want = np.array([native.mulmod(int(x), int(y), q) for x, y in zip(a, b)],
                        np.uint64)
        np.testing.assert_array_equal(got, want)


def test_ntt_cross():
    rng = np.random.default_rng(1)
    for q, n in ((65537, 256), (2013265921, 512)):
        x = rng.integers(0, q, n, dtype=np.uint64)
        got = np.asarray(ntt.ntt(jnp.asarray(x), q))
        want = native.ntt(x, q)
        np.testing.assert_array_equal(got, want)
        back = native.ntt(want, q, inverse=True)
        np.testing.assert_array_equal(back, x)
        np.testing.assert_array_equal(np.asarray(ntt.intt(jnp.asarray(want), q)),
                                      back)


def test_polymul_cross():
    rng = np.random.default_rng(2)
    q, n = 65537, 128
    a = rng.integers(0, q, n, dtype=np.uint64)
    b = rng.integers(0, q, n, dtype=np.uint64)
    np.testing.assert_array_equal(
        np.asarray(rq.mul(jnp.asarray(a), jnp.asarray(b), q)),
        native.polymul_mod(a, b, q))

    at = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    bt = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    np.testing.assert_array_equal(
        np.asarray(tn.mul_crt(jnp.asarray(at), jnp.asarray(bt))),
        native.polymul_torus(at, bt))

    ai = rng.integers(-(1 << 20), 1 << 20, n, dtype=np.int64)
    bi = rng.integers(-(1 << 20), 1 << 20, n, dtype=np.int64)
    np.testing.assert_array_equal(
        np.asarray(ntt.polymul_i64_crt(jnp.asarray(ai), jnp.asarray(bi))),
        native.polymul_i64(ai, bi))
