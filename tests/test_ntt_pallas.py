"""Pallas fused-NTT kernel: bit-parity with the XLA path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from fhe_study_tpu.ops import ntt, ntt_pallas


def test_pallas_ntt_matches_xla_bit_exact():
    for q in (65537, 2013265921):
        for n in (128, 512):
            rng = np.random.default_rng(1)
            x = jnp.asarray(rng.integers(0, q, size=(8, n), dtype=np.uint64))
            got = np.asarray(ntt_pallas.ntt_u32(x, q, interpret=True))
            want = np.asarray(ntt.ntt(x, q))
            np.testing.assert_array_equal(got, want)


def test_pallas_intt_matches_xla_bit_exact():
    q, n = 65537, 256
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    ex = ntt.ntt(x, q)
    got = np.asarray(ntt_pallas.ntt_u32(ex, q, inverse=True, interpret=True))
    want = np.asarray(ntt.intt(ex, q))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(x))


def test_pallas_polymul_sage_vectors_scaled():
    """End-to-end negacyclic product through the kernel (batched, n=128)."""
    q, n = 65537, 128
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    ea = ntt_pallas.ntt_u32(a, q, interpret=True)
    eb = ntt_pallas.ntt_u32(b, q, interpret=True)
    prod = (ea * eb) % jnp.uint64(q)
    got = np.asarray(ntt_pallas.ntt_u32(prod, q, inverse=True, interpret=True))
    want = np.asarray(ntt.negacyclic_mul(a, b, q))
    np.testing.assert_array_equal(got, want)
