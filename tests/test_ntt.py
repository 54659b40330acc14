"""NTT round-trip + SageMath golden-vector parity
(reference arith/src/ntt.rs tests and arith/src/ring_nq.rs:667-704)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.ops import ntt, modops
from fhe_study_tpu.arith import rq


Q = 2 ** 16 + 1


def test_ntt_roundtrip_small():
    a = jnp.asarray([1, 2, 3, 4], dtype=jnp.uint64)
    ea = ntt.ntt(a, Q)
    back = ntt.intt(ea, Q)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_ntt_roundtrip_n512_batched():
    # reference runs 1000 serial iterations; we run one batched shot of 1000
    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (1000, 512), 0, Q, dtype=jnp.int64).astype(jnp.uint64)
    back = ntt.intt(ntt.ntt(a, Q), Q)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_rq_mul_sage_vectors():
    # reference ring_nq.rs:667-704 (generated with SageMath)
    n = 4
    a = rq.from_u64(jnp.asarray([1, 2, 3, 4], jnp.uint64), Q, n)
    c = rq.mul(a, a, Q)
    np.testing.assert_array_equal(np.asarray(c), [65513, 65517, 65531, 20])

    a = rq.from_u64(jnp.asarray([0, 0, 0, 2], jnp.uint64), Q, n)
    c = rq.mul(a, a, Q)
    np.testing.assert_array_equal(np.asarray(c), [0, 0, 65533, 0])


def test_rq_mul_matches_naive_random():
    rng = np.random.default_rng(3)
    n = 64
    a = rng.integers(0, Q, size=(8, n), dtype=np.uint64)
    b = rng.integers(0, Q, size=(8, n), dtype=np.uint64)
    got = np.asarray(rq.mul(jnp.asarray(a), jnp.asarray(b), Q))
    # naive negacyclic over Python ints
    for bi in range(8):
        c = [0] * (2 * n)
        for i in range(n):
            for j in range(n):
                c[i + j] += int(a[bi, i]) * int(b[bi, j])
        want = [(c[k] - c[k + n]) % Q for k in range(n)]
        np.testing.assert_array_equal(got[bi], want)


def test_ntt_montgomery_large_modulus():
    """NTT with a >=2^32 prime exercises the Montgomery mulmod path."""
    q = 1099511628161  # prime, ~2^40, q ≡ 1 (mod 128)
    n = 64
    a = jnp.asarray(np.random.default_rng(4).integers(0, q, size=(n,), dtype=np.uint64))
    back = ntt.intt(ntt.ntt(a, q), q)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_crt_polymul_i64():
    rng = np.random.default_rng(5)
    n = 128
    a = rng.integers(-(2 ** 20), 2 ** 20, size=(n,), dtype=np.int64)
    b = rng.integers(-(2 ** 20), 2 ** 20, size=(n,), dtype=np.int64)
    got = np.asarray(ntt.polymul_i64_crt(jnp.asarray(a), jnp.asarray(b)))
    c = [0] * (2 * n)
    for i in range(n):
        for j in range(n):
            c[i + j] += int(a[i]) * int(b[j])
    want = [c[k] - c[k + n] for k in range(n)]
    np.testing.assert_array_equal(got, want)
