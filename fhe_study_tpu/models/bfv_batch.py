"""BFV SIMD batching: pack 2 x n/2 plaintext slots into one ciphertext.

The reference encodes plaintexts coefficient-wise only (bfv/src/lib.rs has no
CRT batching).  This module adds the standard production slot packing: for a
plaintext modulus t that is prime with t = 1 (mod 2n), Z_t[X]/(X^n+1) splits
by CRT into n copies of Z_t; homomorphic add/mul become slot-wise SIMD ops
and Galois automorphisms become slot rotations (galois.py).

Slot layout (SEAL BatchEncoder semantics): a [2, n/2] matrix.  Slot (r, j)
is the evaluation of m at psi^{E(r,j)} with E(0,j) = 5^j mod 2n and
E(1,j) = -5^j mod 2n.  Then:
  * phi_{5^k}  : both rows rotate LEFT by k   (galois.rotation_element)
  * phi_{2n-1} : the rows swap                (galois.conj_element)

Encode/decode ride the existing negacyclic NTT over q = t — the slot<->
coefficient transform is one transform plus a static permutation.
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..ops import ntt as ntt_mod

U64 = jnp.uint64


def _np_ntt(a, q: int, n: int):
    """Host-side numpy mirror of ops/ntt.py::ntt (same schedule, same
    tables) used only to derive the output-exponent map."""
    plan = ntt_mod.get_plan(q, n)
    r = a.astype(object).copy()
    t, m = n // 2, 1
    while m < n:
        r = r.reshape(m, 2, t)
        u = r[:, 0, :]
        s = plan.roots[m:2 * m].astype(object)
        v = (r[:, 1, :] * s[:, None]) % q
        r = np.stack([(u + v) % q, (u - v) % q], axis=1)
        t //= 2
        m *= 2
    return r.reshape(n)


@lru_cache(maxsize=None)
def _slot_maps(t: int, n: int):
    """(enc_perm, dec_perm): static permutations between the NTT's output
    order and the [2, n/2] slot matrix (row-major flattened).

    dec_perm[s] = NTT output position holding slot s;
    enc_perm[i] = slot index stored at NTT output position i."""
    assert (t - 1) % (2 * n) == 0, f"t={t} must be 1 mod 2n for batching"
    # exponent of the evaluation point at each NTT output position, by
    # evaluating the transform of X (whose eval at psi^e is psi^e) and
    # taking discrete logs against the 2n-th root psi
    plan = ntt_mod.get_plan(t, n)
    psi = plan.root
    x = np.zeros(n, dtype=object)
    x[1] = 1
    evals = _np_ntt(x, t, n)
    dlog = {}
    acc = 1
    for e in range(2 * n):
        dlog[acc] = e
        acc = acc * psi % t
    exp_at = np.array([dlog[int(v)] for v in evals], np.int64)  # [n]
    pos_of_exp = {int(e): i for i, e in enumerate(exp_at)}
    dec = np.zeros(n, np.int32)
    for j in range(n // 2):
        e = pow(5, j, 2 * n)
        dec[j] = pos_of_exp[e]                   # row 0
        dec[n // 2 + j] = pos_of_exp[2 * n - e]  # row 1
    enc = np.zeros(n, np.int32)
    enc[dec] = np.arange(n, dtype=np.int32)
    return enc, dec


def batch_encode(t: int, n: int, slots):
    """slots: integer [..., 2, n/2] (values mod t) -> coefficients [..., n]
    u64 in [0, t)."""
    enc, _ = _slot_maps(t, n)
    flat = jnp.asarray(slots, jnp.int64).reshape(slots.shape[:-2] + (n,))
    flat = ((flat % t) + t) % t
    evals = jnp.take(flat.astype(U64), jnp.asarray(enc), axis=-1)
    return ntt_mod.intt(evals, t)


def batch_decode(t: int, n: int, m):
    """coefficients [..., n] (mod t) -> slots [..., 2, n/2] u64."""
    _, dec = _slot_maps(t, n)
    evals = ntt_mod.ntt(jnp.asarray(m, U64) % U64(t), t)
    flat = jnp.take(evals, jnp.asarray(dec), axis=-1)
    return flat.reshape(m.shape[:-1] + (2, n // 2))
