"""CKKS evaluation toolkit: homomorphic slot linear transforms."""

import numpy as np
import jax
import jax.numpy as jnp

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import eval as E
from fhe_study_tpu.utils import prng
import pytest


def _setup(n=32, L=3, delta=2.0 ** 25, seed=0):
    param = C.Param(n=n, L=L, delta=delta)
    ks = prng.split(jax.random.PRNGKey(seed), 3)
    sk, pk = C.new_key(ks[0], param)
    rng = np.random.default_rng(seed + 1)
    z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
    return param, sk, ks[2], z, ct


def _dec(param, sk, ct):
    rr, ri = C.decode(param, C.decrypt_to_coeffs(param, sk, ct))
    return np.asarray(rr) + 1j * np.asarray(ri)


def test_mul_pt_slotwise():
    param, sk, kk, z, ct = _setup()
    rng = np.random.default_rng(9)
    w = rng.uniform(-1, 1, param.n // 2) + 1j * rng.uniform(-1, 1, param.n // 2)
    from fhe_study_tpu.models.ckks import encoder_device
    from fhe_study_tpu.models import bfv_rns
    scale = float(param.qs[-1])
    m = bfv_rns._to_residues(encoder_device.encode(
        jnp.asarray(w.real), jnp.asarray(w.imag), param.n, scale), param.qs)
    prod = C.mul_pt(param, ct, m)
    ct2, param2 = C.rescale(param, prod)
    param2 = C.Param(n=param.n, L=param.L - 1, delta=param.delta)
    got = _dec(param2, sk, ct2)
    np.testing.assert_allclose(got, z * w, atol=2e-3)


def test_matvec_dense():
    """Fully dense random complex matrix — exercises direct AND conjugate
    diagonals."""
    param, sk, kk, z, ct = _setup()
    half = param.n // 2
    rng = np.random.default_rng(3)
    M = rng.uniform(-1, 1, (half, half)) + 1j * rng.uniform(-1, 1, (half, half))
    rk = E.RotKeys.build(kk, param, sk, steps=range(half), conj=True)
    ct2, param2 = E.matvec(param, rk, ct, M)
    got = _dec(param2, sk, ct2)
    np.testing.assert_allclose(got, M @ z, atol=5e-2)


def test_matvec_banded_needs_few_keys():
    """Diagonal-structure awareness: an identity-plus-shift matrix touches
    only a couple of rotations."""
    param, sk, kk, z, ct = _setup(seed=5)
    half = param.n // 2
    d, e = E.matrix_diagonals(np.eye(half), param.n)
    assert set(d.keys()) == {0} and not e    # identity = rotation 0 only
    # permutation matrix of rho_1 = exactly rotation 1 (+ possibly conj part)
    perm, cj = E._orbit_maps(param.n)[0][1]
    P = np.zeros((half, half))
    for j in range(half):
        if not cj[j]:
            P[j, perm[j]] = 1.0
    d, e = E.matrix_diagonals(P, param.n)
    assert set(d.keys()) == {1} and not e


@pytest.mark.slow
def test_coeff_to_slot_and_back():
    """C2S exposes the polynomial coefficients in slots; S2C re-packs them.
    The full C2S -> S2C pipeline returns the original slot vector."""
    from fhe_study_tpu.models.ckks import encoder_device
    param, sk, kk, z, ct = _setup(n=32, L=6)
    half = param.n // 2
    rk = E.RotKeys.build(kk, param, sk, steps=range(half), conj=True)
    # ground-truth coefficient vector of the encoded message
    p_true = np.asarray(encoder_device.encode(
        jnp.asarray(z.real), jnp.asarray(z.imag), param.n,
        param.delta)).astype(np.float64) / param.delta

    c1, c2, p1 = E.coeff_to_slot(param, rk, ct)
    s1 = _dec(p1, sk, c1)
    s2 = _dec(p1, sk, c2)
    np.testing.assert_allclose(s1.real, p_true[:half], atol=2e-2)
    np.testing.assert_allclose(s2.real, p_true[half:], atol=2e-2)
    np.testing.assert_allclose(s1.imag, 0, atol=2e-2)

    back, p2 = E.slot_to_coeff(p1, rk, c1, c2)
    got = _dec(p2, sk, back)
    np.testing.assert_allclose(got, z, atol=5e-2)


def test_rmap_bsgs_matches_dense():
    """BSGS (hoisted babies + pre-rotated diagonals) == dense matvec path ==
    plaintext A z + B conj(z)."""
    param, sk, kk, z, ct = _setup(seed=5)
    half = param.n // 2
    rng = np.random.default_rng(6)
    A = rng.uniform(-1, 1, (half, half)) + 1j * rng.uniform(-1, 1, (half, half))
    B = rng.uniform(-1, 1, (half, half)) + 1j * rng.uniform(-1, 1, (half, half))
    rk = E.RotKeys.build(kk, param, sk, steps=range(half), conj=True)
    got_b, p2 = E.rmap_bsgs(param, rk, ct, A, B)
    want = A @ z + B @ z.conj()
    np.testing.assert_allclose(_dec(p2, sk, got_b), want, atol=5e-2)
    got_d, _ = E.linear_rmap(param, rk, ct, A, B)
    np.testing.assert_allclose(_dec(p2, sk, got_d), want, atol=5e-2)


def test_rmap_bsgs_multi_shares_babies():
    """Two maps of one input through rmap_bsgs_multi both come out right."""
    param, sk, kk, z, ct = _setup(seed=7)
    half = param.n // 2
    rng = np.random.default_rng(8)
    A1 = rng.uniform(-1, 1, (half, half)) * (1 + 0.5j)
    A2 = rng.uniform(-1, 1, (half, half)) * (0.5 - 1j)
    rk = E.RotKeys.build(kk, param, sk, steps=range(half), conj=True)
    (c1, c2), p2 = E.rmap_bsgs_multi(param, rk, ct, [(A1, None), (None, A2)])
    np.testing.assert_allclose(_dec(p2, sk, c1), A1 @ z, atol=5e-2)
    np.testing.assert_allclose(_dec(p2, sk, c2), A2 @ z.conj(), atol=5e-2)
