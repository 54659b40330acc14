"""The reference's noise-bound formulas, wired up and validated
(reference bfv/src/lib.rs:379-502, a commented-out analysis)."""

import numpy as np
import jax

from fhe_study_tpu.arith import RingParam
from fhe_study_tpu.models import bfv, bfv_noise
from fhe_study_tpu.utils import prng


def test_fresh_noise_under_reference_bound():
    q = 2 ** 16 + 1
    param = bfv.Param(RingParam(q, 128), 32, 0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
    B = 32
    sk, pk = bfv.new_key(ks[0], param, batch=(B,))
    m = prng.uniform_mod(ks[1], (B, param.ring.n), param.t)
    ct = bfv.encrypt(ks[2], param, pk, m, batch=(B,))

    nb = bfv_noise.bounds(q, param.ring.n, param.t)
    # r_t(q)/t == q/t − Δ identity (lib.rs:413-418)
    assert np.isclose(nb.rt, q / param.t - q // param.t)

    noise = np.asarray(bfv_noise.measure_noise(param, sk, ct, m))
    assert (noise < nb.fresh_bound).all(), (noise.max(), nb.fresh_bound)
    assert bfv_noise.fresh_noise_ok(param, sk, ct, m)
