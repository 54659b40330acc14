"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.arith import rq
from fhe_study_tpu.parallel import mesh as mesh_mod
from fhe_study_tpu.parallel import ntt_sharded

Q = 2 ** 16 + 1


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_negacyclic_mul_matches_single_device():
    m = mesh_mod.make_mesh(dp=1, ep=1, sp=8)
    rng = np.random.default_rng(0)
    n = 1024
    a = jnp.asarray(rng.integers(0, Q, size=(4, n), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, Q, size=(4, n), dtype=np.uint64))
    got = ntt_sharded.negacyclic_mul_sharded(a, b, Q, m, axis="sp")
    want = rq.mul(a, b, Q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_mul_sp2_with_batch_dp():
    m = mesh_mod.make_mesh(dp=4, ep=1, sp=2)
    rng = np.random.default_rng(1)
    n = 256
    a = jnp.asarray(rng.integers(0, Q, size=(8, n), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, Q, size=(8, n), dtype=np.uint64))
    got = ntt_sharded.negacyclic_mul_sharded(a, b, Q, m, axis="sp")
    want = rq.mul(a, b, Q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cyclic_ntt_roundtrip_and_convolution():
    from fhe_study_tpu.ops import ntt, modops
    rng = np.random.default_rng(2)
    n = 128
    a = jnp.asarray(rng.integers(0, Q, size=(3, n), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, Q, size=(3, n), dtype=np.uint64))
    back = ntt.intt_cyclic(ntt.ntt_cyclic(a, Q), Q)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))
    # cyclic convolution property
    c = ntt.intt_cyclic(modops.mulmod(ntt.ntt_cyclic(a, Q), ntt.ntt_cyclic(b, Q), Q), Q)
    aa, bb = np.asarray(a), np.asarray(b)
    for i in range(3):
        want = [sum(int(aa[i, j]) * int(bb[i, (k - j) % n]) for j in range(n)) % Q
                for k in range(n)]
        np.testing.assert_array_equal(np.asarray(c[i]), want)
