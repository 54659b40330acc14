"""MXU four-step NTT: bit-exactness against the canonical butterfly path.

The matmul formulation (ops/ntt_mxu.py) must produce BIT-IDENTICAL results
to ops/ntt.py's ntt_multi/intt_multi in the canonical evaluation order —
keys transformed on one path must interoperate with ciphertexts transformed
on the other."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_study_tpu.ops import ntt as N
from fhe_study_tpu.ops import ntt_mxu as M
from fhe_study_tpu.ops.primes import ntt_primes


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_mxu_matches_butterfly(n):
    qs = ntt_primes(3, 30, 1 << 16)
    rng = np.random.default_rng(n)
    x = jnp.asarray(np.stack([rng.integers(0, q, (2, n)) for q in qs]),
                    jnp.uint64)
    ref = N.ntt_multi(x, qs)
    got = M.ntt_multi_mxu(x, qs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    back = M.intt_multi_mxu(got, qs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # cross-path: MXU forward -> butterfly inverse
    np.testing.assert_array_equal(np.asarray(N.intt_multi(got, qs)),
                                  np.asarray(x))


def test_mxu_supported_gate():
    """Square splits only (even log2 n) — every production ring size; the
    dispatch in ops/ntt.py must reject the rest."""
    assert M.mxu_supported(1 << 10) and M.mxu_supported(1 << 14)
    assert M.mxu_supported(1 << 16)
    assert not M.mxu_supported(1 << 13)   # odd log2
    assert not M.mxu_supported(1 << 18)   # m > 256
    assert not M.mxu_supported(64)        # too small to pay off


def test_mxu_31bit_primes():
    """Largest supported prime magnitude (just below 2^31)."""
    qs = ntt_primes(2, 30, 1 << 16)  # ~2^30/2^31 primes
    n = 1024
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.stack([np.full(n, q - 1) for q in qs]), jnp.uint64)
    ref = N.intt_multi(N.ntt_multi(x, qs), qs)
    got = M.intt_multi_mxu(M.ntt_multi_mxu(x, qs), qs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("n", [256, 4096])
def test_mxu_pallas_kernel_matches(n):
    """The VMEM-fused Pallas variant of the MXU four-step (interpret mode on
    CPU) is bit-identical to the canonical path, both directions."""
    from fhe_study_tpu.ops import ntt_mxu_pallas as MP
    qs = ntt_primes(3, 30, 1 << 16)
    rng = np.random.default_rng(n + 1)
    x = jnp.asarray(np.stack([rng.integers(0, q, (4, n)) for q in qs]),
                    jnp.uint64)
    ref = N.ntt_multi(x, qs)
    got = MP.ntt_multi_mxu_pallas(x, qs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    back = MP.ntt_multi_mxu_pallas(got, qs, inverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
