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
    """Hybrid Galois keys for a set of rotation steps (+ conjugation),
    built PER LEVEL (the RNS gadget is basis-dependent — the same reason
    relinearization keys are per-level in poly.py)."""

    def __init__(self, keys: dict):
        self.keys = dict(keys)        # (L, g) -> HybridKSK

    @classmethod
    def build(cls, key, param, sk, steps, conj: bool = True, K: int = 2,
              min_L: int = 2):
        n = param.n
        gs = sorted({galois.rotation_element(n, k) for k in steps if
                     k % (n // 2)})
        if conj:
            gs.append(galois.conj_element(n))
        keys = {}
        for L in range(min_L, param.L + 1):
            pL = ckks_rns.Param(n=n, L=L, delta=param.delta,
                                prime_bits=param.prime_bits)
            skL = ckks_rns.SecretKey(sk.s_evals[:L])
            for i, g in enumerate(gs):
                keys[(L, g)] = hybrid_ks.galois_key_hybrid(
                    jax.random.fold_in(key, L * 4096 + i), pL, skL, g, K=K)
        return cls(keys)

    def get(self, L: int, g: int):
        assert (L, g) in self.keys, f"missing Galois key (L={L}, g={g})"
        return self.keys[(L, g)]


def rotate(param, rk: RotKeys, ct, k: int):
    """phi_{5^k}: slots move by galois.ckks_slot_perm(n, 5^k)."""
    g = galois.rotation_element(param.n, k)
    if g == 1:
        return ct
    return hybrid_ks.rotate_hybrid(param, rk.get(param.L, g), ct, g)


def conjugate(param, rk: RotKeys, ct):
    g = galois.conj_element(param.n)
    return hybrid_ks.rotate_hybrid(param, rk.get(param.L, g), ct, g)


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


# ---------------------------------------------------------------------------
# CoeffToSlot / SlotToCoeff — the linear stages of CKKS bootstrapping.
#
# For the device encoder, slot_j(ct) = m(zeta^{2j+1})/delta with
# D[j,k] = zeta^{(2j+1)k} satisfying D D^H = n I and D conj(D)^T = 0, so the
# (real) coefficient vector recovers as p = (1/n)(D^H z + conj(D^H z)).
# ---------------------------------------------------------------------------

def linear_rmap(param, rk: RotKeys, ct, A, B):
    """Homomorphic R-linear slot map y = A z + B conj(z) (two matvecs; one
    level).  Zero matrices are skipped."""
    A = np.asarray(A)
    B = np.asarray(B)
    outs = []
    if np.any(A):
        outs.append(matvec(param, rk, ct, A))
    if np.any(B):
        outs.append(matvec(param, rk, conjugate(param, rk, ct), B))
    assert outs, "zero map"
    if len(outs) == 1:
        return outs[0]
    (c1, p1), (c2, _) = outs
    return ckks_rns.add(p1, c1, c2), p1


@lru_cache(maxsize=None)
def _c2s_matrices(n: int):
    """A1/B1 (slots -> first-half coeffs) and A2/B2 (second half)."""
    half = n // 2
    k = np.arange(n)[:, None]
    j = np.arange(half)[None, :]
    zeta = np.exp(1j * np.pi / n)
    Dh = zeta ** (-((2 * j + 1) * k))          # [n, half] = D^H
    A = Dh / n
    return ((A[:half], A[:half].conj()), (A[half:], A[half:].conj()))


@lru_cache(maxsize=None)
def _s2c_matrices(n: int):
    """D1, D2: coeffs-in-slots -> slots of the packed polynomial."""
    half = n // 2
    j = np.arange(half)[:, None]
    k = np.arange(n)[None, :]
    zeta = np.exp(1j * np.pi / n)
    D = zeta ** ((2 * j + 1) * k)              # [half, n]
    return D[:, :half], D[:, half:]


def coeff_to_slot(param, rk: RotKeys, ct):
    """-> (ct1, ct2, param'): slots(ct1) = coeffs p[0:n/2]/1, slots(ct2) =
    p[n/2:n] (both real; one level consumed)."""
    (A1, B1), (A2, B2) = _c2s_matrices(param.n)
    c1, p1 = linear_rmap(param, rk, ct, A1, B1)
    c2, _ = linear_rmap(param, rk, ct, A2, B2)
    return c1, c2, p1


def slot_to_coeff(param, rk: RotKeys, ct1, ct2):
    """Inverse of coeff_to_slot: packs slots(ct1)|slots(ct2) back into the
    coefficient positions.  -> (ct, param')."""
    D1, D2 = _s2c_matrices(param.n)
    c1, p1 = matvec(param, rk, ct1, D1)
    c2, _ = matvec(param, rk, ct2, D2)
    return ckks_rns.add(p1, c1, c2), p1
