"""CKKS evaluation toolkit: slot rotations, conjugation, and general slot
linear transforms (matrix-vector via rotation diagonals).

These are the building blocks of encrypted linear algebra (and of CKKS
bootstrapping's CoeffToSlot/SlotToCoeff): for the device encoder's natural
slot order (slot j = m(zeta^{2j+1}), encoder_device.py), the automorphism
phi_g moves slot values by the permutation/conjugation of
galois.ckks_slot_perm.  The odd-unit group mod 2n factors as <5> x <-1>, so
every complex-LINEAR slot map decomposes over rotations of z and rotations
of conj(z):

    M z = sum_k d_k * rho_k(z)  +  sum_k e_k * rho_k(z_c)

with rho_k = phi_{5^k}, z_c = phi_{2n-1}(z) (the conjugated ciphertext), and
host-computed diagonals d_k/e_k (each matrix entry M[j,c] lands in exactly
one of them).  Key switching uses the hybrid (P-extended) keys so the
rotation noise stays ~1 unit.

Plaintext diagonals are encoded at scale q_last so the trailing rescale
returns the ciphertext to its input scale (the standard level-consume).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .. import bfv_rns, galois, hybrid_ks
from . import ckks_rns, encoder_device


class RotKeys:
    """Hybrid Galois keys for a set of rotation steps (+ conjugation)."""

    def __init__(self, param, keys: dict, conj_key=None):
        self.keys = dict(keys)        # g -> HybridKSK
        self.conj_key = conj_key

    @classmethod
    def build(cls, key, param, sk, steps, conj: bool = True, K: int = 2):
        n = param.n
        keys = {}
        gs = sorted({galois.rotation_element(n, k) for k in steps if
                     k % (n // 2)})
        for i, g in enumerate(gs):
            keys[g] = hybrid_ks.galois_key_hybrid(
                jax.random.fold_in(key, i), param, sk, g, K=K)
        ck = None
        if conj:
            ck = hybrid_ks.galois_key_hybrid(
                jax.random.fold_in(key, len(gs) + 1), param, sk,
                galois.conj_element(n), K=K)
        return cls(param, keys, ck)


def rotate(param, rk: RotKeys, ct, k: int):
    """phi_{5^k}: slots move by galois.ckks_slot_perm(n, 5^k)."""
    g = galois.rotation_element(param.n, k)
    if g == 1:
        return ct
    assert g in rk.keys, f"missing rotation key for step {k}"
    return hybrid_ks.rotate_hybrid(param, rk.keys[g], ct, g)


def conjugate(param, rk: RotKeys, ct):
    assert rk.conj_key is not None, "keyring built without conj"
    return hybrid_ks.rotate_hybrid(param, rk.conj_key, ct,
                                   galois.conj_element(param.n))


@lru_cache(maxsize=None)
def _orbit_maps(n: int):
    """For each rotation step k: (perm, conj) of phi_{5^k}; plus the
    conjugation map."""
    half = n // 2
    rots = [galois.ckks_slot_perm(n, pow(5, k, 2 * n)) for k in range(half)]
    conj = galois.ckks_slot_perm(n, 2 * n - 1)
    return rots, conj


def matrix_diagonals(M, n: int):
    """Host-side: decompose complex [n/2, n/2] M into rotation diagonals.

    Returns (d, e): dicts k -> complex [n/2] vector with
    M z = sum_k d[k] * rho_k(z) + sum_k e[k] * rho_k(z_c); zero diagonals
    are omitted (banded matrices touch few rotations)."""
    half = n // 2
    M = np.asarray(M, np.complex128)
    assert M.shape == (half, half)
    rots, (pc, _) = _orbit_maps(n)
    d, e = {}, {}
    for k in range(half):
        perm, cj = rots[k]
        dk = np.zeros(half, np.complex128)
        ek = np.zeros(half, np.complex128)
        any_d = any_e = False
        for j in range(half):
            if not cj[j]:
                # rho_k(z)[j] = z[perm[j]] — linear: direct diagonal
                v = M[j, perm[j]]
                if v != 0:
                    dk[j] = v
                    any_d = True
            else:
                # rho_k(z)[j] = conj(z[perm[j]]) — antilinear; reach the
                # entry through z_c: rho_k(z_c)[j] = conj(z_c[perm[j]])
                #   = conj(conj(z[pc[perm[j]]])) = z[pc[perm[j]]]
                v = M[j, pc[perm[j]]]
                if v != 0:
                    ek[j] = v
                    any_e = True
        if any_d:
            d[k] = dk
        if any_e:
            e[k] = ek
    return d, e


def _encode_diag(param, vec, scale: float):
    m = encoder_device.encode(jnp.asarray(vec.real), jnp.asarray(vec.imag),
                              param.n, scale)
    return bfv_rns._to_residues(m, param.qs)


def matvec(param, rk: RotKeys, ct, M):
    """Homomorphic y = M z: rotations + plaintext diagonal multiplies +
    one rescale.  Returns (ct', param') at the input scale, one level down.

    Keys: rk must contain every rotation step with a nonzero diagonal
    (matrix_diagonals(M, n) tells you which; RotKeys.build(steps=...))."""
    n = param.n
    d, e = matrix_diagonals(np.asarray(M), n)
    scale_pt = float(param.qs[-1])        # rescale eats exactly this
    acc = None
    zc = conjugate(param, rk, ct) if e else None
    for k, vec in sorted(d.items()):
        term = ckks_rns.mul_pt(param, rotate(param, rk, ct, k),
                               _encode_diag(param, vec, scale_pt))
        acc = term if acc is None else ckks_rns.add(param, acc, term)
    for k, vec in sorted(e.items()):
        term = ckks_rns.mul_pt(param, rotate(param, rk, zc, k),
                               _encode_diag(param, vec, scale_pt))
        acc = term if acc is None else ckks_rns.add(param, acc, term)
    assert acc is not None, "zero matrix"
    # acc carries scale delta * q_last; the drop returns it to delta
    ct2, _ = ckks_rns.rescale(param, acc)
    param2 = ckks_rns.Param(n=param.n, L=param.L - 1, delta=param.delta,
                            prime_bits=param.prime_bits)
    return ct2, param2
