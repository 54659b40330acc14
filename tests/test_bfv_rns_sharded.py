"""RNS-BFV with the LIMB axis sharded over `ep` and batch over `dp`:
the full multiply (base extensions reduce across limbs -> XLA inserts the
collectives) must produce bit-identical results to single-device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.parallel import mesh as mesh_mod
from fhe_study_tpu.utils import prng
import pytest


@pytest.mark.slow
def test_mul_limb_and_batch_sharded():
    param = R.RnsParam(n=256, t=16, L=4, M=5)
    ks = prng.split(jax.random.PRNGKey(0), 6)
    B = 8
    sk, pk = R.new_key(ks[0], param)
    rlk = R.rlk_key(ks[1], param, sk)
    m1 = prng.uniform_mod(ks[2], (B, param.n), param.t)
    m2 = prng.uniform_mod(ks[3], (B, param.n), param.t)
    c1 = R.encrypt(ks[4], param, pk, m1, batch=(B,))
    c2 = R.encrypt(ks[5], param, pk, m2, batch=(B,))

    want = jax.tree.map(np.asarray, tuple(R.mul(param, rlk, c1, c2)))

    mesh = mesh_mod.make_mesh(dp=4, ep=2, sp=1)
    sh = NamedSharding(mesh, P("ep", "dp", None))   # [L, B, n]
    c1s = R.CT(*[jax.device_put(x, sh) for x in c1])
    c2s = R.CT(*[jax.device_put(x, sh) for x in c2])

    mul = jax.jit(lambda a, b: R.mul(param, rlk, a, b))
    got = mul(c1s, c2s)
    np.testing.assert_array_equal(np.asarray(got.c0), want[0])
    np.testing.assert_array_equal(np.asarray(got.c1), want[1])
