"""Galois automorphisms, rotation keys, BFV batching, CKKS slot rotation."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.models import bfv_batch, galois
from fhe_study_tpu.ops import ntt as ntt_mod
from fhe_study_tpu.utils import prng


def _phi_np(m, g, n, t=None):
    """Direct numpy automorphism m(X^g) mod (X^n + 1) — independent of the
    gather construction in galois.galois_map."""
    out = np.zeros(n, np.int64)
    for i in range(n):
        e = (i * g) % (2 * n)
        if e < n:
            out[e] += m[i]
        else:
            out[e - n] -= m[i]
    if t is not None:
        out %= t
    return out


def test_galois_map_matches_direct():
    n = 32
    rng = np.random.default_rng(0)
    m = rng.integers(-50, 50, n)
    for g in (3, 5, 2 * n - 1, pow(5, 7, 2 * n)):
        got = np.asarray(galois.apply_galois_i64(jnp.asarray(m), g))
        np.testing.assert_array_equal(got, _phi_np(m, g, n))


def test_galois_residues_match_direct():
    n = 32
    qs = (97, 193)
    rng = np.random.default_rng(1)
    m = rng.integers(0, 90, n)
    x = jnp.stack([jnp.asarray(m % q, jnp.uint64) for q in qs], 0)
    got = np.asarray(galois.apply_galois(x, 5, qs))
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(got[i], _phi_np(m, 5, n, q))


def test_bfv_rotate_coefficient_semantics():
    """Encrypt, apply phi_5 homomorphically, decrypt == plaintext phi_5."""
    param = R.RnsParam(n=64, t=65537, L=3, M=4)
    ks = prng.split(jax.random.PRNGKey(0), 4)
    sk, pk = R.new_key(ks[0], param)
    m = prng.uniform_mod(ks[1], (param.n,), param.t)
    c = R.encrypt(ks[2], param, pk, m)
    g = 5
    gk = galois.galois_key(ks[3], param, sk, g)
    c_rot = galois.apply_to_ct(param, gk, c, g)
    rec = np.asarray(R.decrypt(param, sk, c_rot))
    want = _phi_np(np.asarray(m).astype(np.int64), g, param.n, param.t)
    np.testing.assert_array_equal(rec, want)


def test_batch_encode_roundtrip_and_simd_mul():
    t, n = 65537, 64
    rng = np.random.default_rng(2)
    a = rng.integers(0, t, (2, n // 2))
    b = rng.integers(0, t, (2, n // 2))
    ea = bfv_batch.batch_encode(t, n, jnp.asarray(a))
    np.testing.assert_array_equal(
        np.asarray(bfv_batch.batch_decode(t, n, ea)), a)
    # slot-wise product: poly-mul mod (X^n+1, t) == elementwise mod t
    eb = bfv_batch.batch_encode(t, n, jnp.asarray(b))
    prod = ntt_mod.negacyclic_mul(ea, eb, t)
    got = np.asarray(bfv_batch.batch_decode(t, n, prod))
    np.testing.assert_array_equal(got, (a * b) % t)


def test_bfv_batched_rotation_end_to_end():
    """Full pipeline: batch encode -> encrypt -> homomorphic row rotation +
    row swap -> decrypt -> decode; slots move like SEAL's rotate_rows."""
    param = R.RnsParam(n=64, t=65537, L=3, M=4)
    n, t = param.n, param.t
    ks = prng.split(jax.random.PRNGKey(7), 4)
    sk, pk = R.new_key(ks[0], param)
    slots = np.arange(n).reshape(2, n // 2) % t
    m = bfv_batch.batch_encode(t, n, jnp.asarray(slots))
    c = R.encrypt(ks[1], param, pk, m)
    gks = galois.GaloisKeys.for_rotations(ks[2], param, sk, conj=True)
    for k in (1, 3, n // 2 - 1):
        c_rot = gks.rotate(param, c, k)
        rec = np.asarray(R.decrypt(param, sk, c_rot)).astype(np.uint64)
        got = np.asarray(bfv_batch.batch_decode(t, n, jnp.asarray(rec)))
        np.testing.assert_array_equal(got, np.roll(slots, -k, axis=-1),
                                      err_msg=f"rotation by {k}")
    c_sw = gks.conjugate(param, c)
    rec = np.asarray(R.decrypt(param, sk, c_sw)).astype(np.uint64)
    got = np.asarray(bfv_batch.batch_decode(t, n, jnp.asarray(rec)))
    np.testing.assert_array_equal(got, slots[::-1])


def test_ckks_rotation():
    """CKKS slot rotation through the same Galois machinery."""
    from fhe_study_tpu.models.ckks import ckks_rns as C
    param = C.Param(n=64, L=3, delta=2.0 ** 45)
    ks = prng.split(jax.random.PRNGKey(3), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(4)
    z_re = rng.uniform(-10, 10, param.n // 2)
    z_im = rng.uniform(-10, 10, param.n // 2)
    m_res = C.encode(param, jnp.asarray(z_re), jnp.asarray(z_im))
    c = C.encrypt(ks[1], param, pk, m_res)
    g = galois.rotation_element(param.n, 1)
    gk = galois.galois_key(ks[2], param, sk, g)
    c_rot = galois.apply_to_ct(param, gk, c, g)
    rr, ri = C.decode(param, C.decrypt_to_coeffs(param, sk, c_rot))
    perm, conj = galois.ckks_slot_perm(param.n, g)
    want = (z_re + 1j * z_im)[perm]
    want = np.where(conj, want.conj(), want)
    got = np.asarray(rr) + 1j * np.asarray(ri)
    # key-switch noise ~ sqrt(n L) * 2^30 * sigma / delta ≈ 2^-4 absolute
    np.testing.assert_allclose(got, want, atol=0.5)


def test_hybrid_key_switch_bfv():
    """P-extended key switch moves a ciphertext between keys with tiny
    noise (decrypt stays exact)."""
    from fhe_study_tpu.models import hybrid_ks as H
    param = R.RnsParam(n=64, t=65537, L=3, M=4)
    ks = prng.split(jax.random.PRNGKey(11), 5)
    sk1, pk1 = R.new_key(ks[0], param)
    sk2, _ = R.new_key(ks[1], param)
    m = prng.uniform_mod(ks[2], (param.n,), param.t)
    c = R.encrypt(ks[3], param, pk1, m)
    hksk = H.hybrid_ksk(ks[4], param, sk1.s_evals, sk2.s_evals)
    c2 = H.hybrid_key_switch(param, hksk, c)
    rec = np.asarray(R.decrypt(param, sk2, c2))
    np.testing.assert_array_equal(rec, np.asarray(m))


def test_ckks_rotation_hybrid_low_noise():
    """Hybrid Galois key makes CKKS rotation accurate at delta = 2^25
    (the plain gadget key needs 2^45; P suppresses the digit noise)."""
    from fhe_study_tpu.models import hybrid_ks as H
    from fhe_study_tpu.models.ckks import ckks_rns as C
    param = C.Param(n=64, L=3, delta=2.0 ** 25)
    ks = prng.split(jax.random.PRNGKey(12), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(13)
    z_re = rng.uniform(-10, 10, param.n // 2)
    z_im = rng.uniform(-10, 10, param.n // 2)
    c = C.encrypt(ks[1], param, pk,
                  C.encode(param, jnp.asarray(z_re), jnp.asarray(z_im)))
    g = galois.rotation_element(param.n, 1)
    hgk = H.galois_key_hybrid(ks[2], param, sk, g)
    c_rot = H.rotate_hybrid(param, hgk, c, g)
    rr, ri = C.decode(param, C.decrypt_to_coeffs(param, sk, c_rot))
    perm, conj = galois.ckks_slot_perm(param.n, g)
    want = (z_re + 1j * z_im)[perm]
    want = np.where(conj, want.conj(), want)
    got = np.asarray(rr) + 1j * np.asarray(ri)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_eval_perm_matches_coeff_automorphism():
    """NTT(phi_g(x)) == NTT(x)[eval_perm] for several primes (the exponent
    schedule — hence the permutation — is prime-independent)."""
    n = 64
    rng = np.random.default_rng(21)
    for q in (ntt_mod.get_plan(12289, n).q, 65537, 1152921504606830593):
        x = jnp.asarray(rng.integers(0, q, n).astype(np.uint64))
        for g in (5, 2 * n - 1, pow(5, 9, 2 * n)):
            lhs = np.asarray(ntt_mod.ntt(
                galois.apply_galois(x[None], g, (q,))[0], q))
            rhs = np.asarray(ntt_mod.ntt(x, q))[galois.eval_perm(n, g)]
            np.testing.assert_array_equal(lhs, rhs)


def test_np_ntt_ref_matches_library():
    """The host-side butterfly mirror used to derive eval exponents stays in
    lockstep with ops.ntt.ntt."""
    n, q = 32, 12289
    rng = np.random.default_rng(22)
    x = rng.integers(0, q, n).astype(np.uint64)
    plan = ntt_mod.get_plan(q, n)
    got = galois._np_ntt_ref(x, plan).astype(np.uint64)
    want = np.asarray(ntt_mod.ntt(jnp.asarray(x), q))
    np.testing.assert_array_equal(got, want)


def test_ckks_rotation_hoisted():
    """rotate_hoisted == rotate_hybrid up to noise: one decomposition, many
    rotations."""
    from fhe_study_tpu.models import hybrid_ks as H
    from fhe_study_tpu.models.ckks import ckks_rns as C
    param = C.Param(n=64, L=3, delta=2.0 ** 25)
    ks = prng.split(jax.random.PRNGKey(14), 6)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(15)
    z = rng.uniform(-10, 10, param.n // 2) + 1j * rng.uniform(-10, 10, param.n // 2)
    c = C.encrypt(ks[1], param, pk,
                  C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    edm = H.hoist_digits(param, c.c1)
    for i, k in enumerate((1, 3, 7)):
        g = galois.rotation_element(param.n, k)
        hgk = H.galois_key_hybrid(ks[2 + i], param, sk, g)
        c_rot = H.rotate_hoisted(param, hgk, c, g, edm)
        rr, ri = C.decode(param, C.decrypt_to_coeffs(param, sk, c_rot))
        perm, conj = galois.ckks_slot_perm(param.n, g)
        want = np.where(conj, z[perm].conj(), z[perm])
        got = np.asarray(rr) + 1j * np.asarray(ri)
        np.testing.assert_allclose(got, want, atol=2e-3)
