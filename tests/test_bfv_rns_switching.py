"""RNS-BFV key switching + noise-budget observability."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.utils import prng
import pytest


def test_key_switch():
    param = R.RnsParam(n=256, t=16, L=3, M=4)
    ks = prng.split(jax.random.PRNGKey(0), 6)
    B = 4
    sk1, pk1 = R.new_key(ks[0], param)
    sk2, _ = R.new_key(ks[1], param)
    ksk = R.ksk_key(ks[2], param, sk1, sk2)
    m = prng.uniform_mod(ks[3], (B, param.n), param.t)
    c = R.encrypt(ks[4], param, pk1, m, batch=(B,))

    c2 = R.key_switch(param, ksk, c)
    rec = R.decrypt(param, sk2, c2)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


@pytest.mark.slow
def test_noise_budget_decreases_with_mul():
    param = R.RnsParam(n=256, t=4, L=4, M=5)
    ks = prng.split(jax.random.PRNGKey(1), 6)
    sk, pk = R.new_key(ks[0], param)
    rlk = R.rlk_key(ks[1], param, sk)
    m = prng.uniform_mod(ks[2], (2, param.n), param.t)
    c = R.encrypt(ks[3], param, pk, m, batch=(2,))
    fresh = np.asarray(R.noise_budget_bits(param, sk, c, m))
    c2 = R.mul(param, rlk, c, c)
    from fhe_study_tpu.ops import ntt as ntt_mod
    from fhe_study_tpu.ops import modops
    m_sq = modops.coerce_i64(
        ntt_mod.polymul_i64_crt(m.astype(jnp.int64), m.astype(jnp.int64)),
        param.t)
    after = np.asarray(R.noise_budget_bits(param, sk, c2, m_sq))
    assert (fresh > after).all(), (fresh, after)
    assert (fresh > 100).all()     # ~120-bit Q, tiny fresh noise
    assert (after > 1).all()       # still decryptable
