"""Generic GLWE layer instantiated over the TORUS ring: KSK/key-switch and
GLev gadget products must work identically to the Rq instantiation
(the reference's GLWE<Tn> is only exercised for encrypt/decrypt; this
exercises the full generic surface)."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.arith import RingParam
from fhe_study_tpu.arith.params import TORUS_Q
from fhe_study_tpu.arith.ring import ring_for
from fhe_study_tpu.models.gfhe import glwe as G
from fhe_study_tpu.utils import prng
import pytest


@pytest.mark.slow
def test_key_switch_torus():
    param = G.Param(G.ERR_SIGMA, RingParam(TORUS_Q, 64), 2, 16)
    beta, l = 2, 64
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = prng.split(key, 5)
    sk, _ = G.new_key(k1, param)
    sk2, _ = G.new_key(k2, param)
    ksk = G.new_ksk(k3, param, beta, l, sk, sk2)

    m = prng.uniform_mod(k4, (8, param.ring.n), param.t)
    delta = TORUS_Q // param.t
    p = m * jnp.uint64(delta)
    c = G.encrypt_s(k5, param, sk, p, batch=(8,))
    c2 = G.key_switch(param, beta, l, ksk, c)

    ring = ring_for(param.ring)
    rec = ring.decode_scale(G.decrypt(param, sk2, c2), param.t)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


def test_glwe_torus_k32_envelope():
    """Reference workload envelope upper edge (SURVEY §6: k ∈ {1..32}):
    encrypt/decrypt round-trip at k=32 over the torus ring."""
    param = G.Param(G.ERR_SIGMA, RingParam(TORUS_Q, 32), 32, 8)
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = prng.split(key, 3)
    sk, _ = G.new_key(k1, param)
    m = prng.uniform_mod(k2, (4, param.ring.n), param.t)
    p = m * jnp.uint64(TORUS_Q // param.t)
    c = G.encrypt_s(k3, param, sk, p, batch=(4,))
    ring = ring_for(param.ring)
    rec = ring.decode_scale(G.decrypt(param, sk, c), param.t)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))


def test_mod_switch_torus_to_power_of_two():
    param = G.Param(G.ERR_SIGMA, RingParam(TORUS_Q, 32), 2, 8)
    key = jax.random.PRNGKey(1)
    k1, k2 = prng.split(key, 2)
    sk, _ = G.new_key(k1, param)
    m = prng.uniform_mod(k2, (4, param.ring.n), param.t)
    p = m * jnp.uint64(TORUS_Q // param.t)
    c = G.encrypt_s(k2, param, sk, p, batch=(4,))
    q2 = 1 << 32
    c2 = G.mod_switch(param, c, q2)
    # decrypt in the switched modulus (wrapping mod 2^32 arithmetic)
    mask = jnp.uint64(q2 - 1)
    phase = (c2.b - jnp.sum(c2.a * sk, axis=-2)) & mask
    rec = jnp.round(phase.astype(jnp.float64) * param.t / q2).astype(jnp.uint64) \
        % jnp.uint64(param.t)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(m))
