"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.arith import rq
from fhe_study_tpu.parallel import mesh as mesh_mod
from fhe_study_tpu.parallel import ntt_sharded
import pytest

Q = 2 ** 16 + 1


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.slow
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
    # fast-tier proxy for the 8-way shard test above (same collective
    # exchange path at sp=2; the sp=8/n=1024 variant is slow-tier)
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


@pytest.mark.slow
def test_dp_sharded_galois_rotation():
    """Batched BFV slot rotation with the ciphertext batch sharded over dp:
    bit-identical to the single-device result (rotation = static gather +
    RNS-gadget key switch — both shard trivially over the batch axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fhe_study_tpu.models import bfv_rns as R
    from fhe_study_tpu.models import galois
    from fhe_study_tpu.utils import prng

    m = mesh_mod.make_mesh(dp=8, ep=1, sp=1)
    param = R.RnsParam(n=64, t=65537, L=3, M=4)
    ks = prng.split(jax.random.PRNGKey(21), 4)
    sk, pk = R.new_key(ks[0], param)
    B = 8
    msg = prng.uniform_mod(ks[1], (B, param.n), param.t)
    c = R.encrypt(ks[2], param, pk, msg, batch=(B,))
    g = 5
    gk = galois.galois_key(ks[3], param, sk, g)

    want = galois.apply_to_ct(param, gk, c, g)            # single device

    shard = NamedSharding(m, P(None, "dp", None))         # [L, B, n]
    c_sh = R.CT(jax.device_put(c.c0, shard), jax.device_put(c.c1, shard))
    rot = jax.jit(lambda c0, c1, kb, ka: galois.apply_to_ct(
        param, R.RLK(kb, ka), R.CT(c0, c1), g))
    got = rot(c_sh.c0, c_sh.c1, gk.b, gk.a)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want.c0))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want.c1))
    rec = np.asarray(R.decrypt(param, sk, R.CT(got[0], got[1])))
    assert rec.shape == (B, param.n)
