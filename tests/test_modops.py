"""Z_q scalar-op parity tests (reference arith/src/zq.rs tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.ops import modops


def test_exp():
    # reference zq.rs:355-365
    q = 1021
    assert int(modops.powmod(jnp.uint64(3), 3, q)) == 27
    assert int(modops.powmod(jnp.uint64(1000), 3, q)) == 949


def test_neg():
    q = 1021
    a = modops.coerce_f64(jnp.float64(101.0), q)
    b = modops.coerce_f64(jnp.float64(-1.0), q)
    assert int(modops.negmod(a, q)) == int(modops.mulmod(a, b, q))


def test_inv():
    for q in (7, 41, 257, 1021, 65537):
        for v in (1, 2, 3, q - 1, q // 2):
            inv = modops.invmod_prime(jnp.uint64(v), q)
            assert int(modops.mulmod(jnp.uint64(v), inv, q)) == 1


def test_inv_composite():
    """invmod: reference-parity egcd semantics (zq.rs:113-130) — valid for
    ANY modulus with gcd(v, q)=1, not just primes; vectorized + jittable."""
    import numpy as np
    rng = np.random.default_rng(0)
    for q in (15, 21, 3 ** 5 * 7 * 11, 2 ** 16, 12, 2 ** 20 * 9,
              65537, (1 << 31) - 1, 6700417 * 641):
        vs = [v for v in (1, 2, 3, 5, q - 1, q // 2, 7, 11, 97)
              if 0 < v < q and np.gcd(v, q) == 1]
        vs += [int(v) for v in rng.integers(1, q, 32) if np.gcd(int(v), q) == 1]
        arr = jnp.asarray(np.array(vs, np.uint64))
        out = jax.jit(lambda a: modops.invmod(a, q))(arr)
        want = np.array([pow(v, -1, q) for v in vs], np.uint64)
        np.testing.assert_array_equal(np.asarray(out), want)
        # and division built on it
        d = modops.divmod_any(jnp.uint64(1) % jnp.uint64(q), arr, q)
        np.testing.assert_array_equal(np.asarray(d), want)


def test_decompose_roundtrip():
    # reference zq.rs:382-405
    q1, beta, l = 16, 2, 4
    x = jnp.uint64(9)
    d = modops.decompose(x, q1, beta, l)
    assert int(modops.recompose(d, q1, beta, l)) == 9

    q, beta, l = 5 ** 3, 5, 3
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(0, q, size=1000, dtype=np.uint64))
    d = modops.decompose(xs, q, beta, l)
    assert d.shape == (l, 1000)
    np.testing.assert_array_equal(np.asarray(modops.recompose(d, q, beta, l)),
                                  np.asarray(xs))


def test_decompose_approx():
    # reference zq.rs:407-435 (saturation cases)
    q, beta, l = 2 ** 4 + 1, 2, 4
    d = modops.decompose(jnp.uint64(16), q, beta, l)
    assert int(modops.recompose(d, q, beta, l)) == 15

    q2, beta, l = 5 ** 3 + 1, 5, 3
    d = modops.decompose(jnp.uint64(125), q2, beta, l)
    assert int(modops.recompose(d, q2, beta, l)) == 124

    q3, beta, l = 2 ** 16 + 1, 2, 16
    d = modops.decompose(jnp.uint64(q3 - 1), q3, beta, l)
    assert int(modops.recompose(d, q3, beta, l)) == 2 ** 16 - 1


def test_mulmod_wide_montgomery():
    """mulmod correctness for q >= 2^32 (Montgomery path) vs Python ints."""
    q = 65537 ** 3  # the BFV p*q modulus shape, ~2^48, odd
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, size=64, dtype=np.uint64)
    b = rng.integers(0, q, size=64, dtype=np.uint64)
    got = np.asarray(modops.mulmod(jnp.asarray(a), jnp.asarray(b), q))
    want = (a.astype(object) * b.astype(object)) % q
    np.testing.assert_array_equal(got.astype(object), want)


def test_mul128():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 64, size=128, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=128, dtype=np.uint64)
    hi, lo = modops.mul128(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi).astype(object), full >> 64)
    np.testing.assert_array_equal(np.asarray(lo).astype(object), full % (1 << 64))


def test_mod_switch():
    # round(v * q2 / q) mod q2, f64 semantics
    q, q2 = 2 ** 16 + 1, 2 ** 8 + 1
    v = jnp.arange(0, q, 97, dtype=jnp.uint64)
    got = np.asarray(modops.mod_switch(v, q, q2))
    vv = np.arange(0, q, 97, dtype=np.float64)
    want = np.floor(vv * q2 / q + 0.5).astype(np.int64) % q2  # all positive
    np.testing.assert_array_equal(got, want.astype(np.uint64))
