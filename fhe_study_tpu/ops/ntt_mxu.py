"""MXU (systolic-array) negacyclic NTT: the four-step transform as matmuls.

The butterfly kernels (ntt_pallas.py) are VPU-bound: ~40 u32 ops per
butterfly, log2(n) stages.  The TPU's FLOPs live in the MXU, which only
speaks matmul — so this module reformulates the transform to feed it:

    negacyclic NTT(n = m*m)  =  psi-twist
                                . [m-point DFTs along i2]    (matmul #1)
                                . elementwise twiddle w^{i1*k2}
                                . [m-point DFTs along i1]    (matmul #2)
                                . bit-reversal permutation

(the classic four-step/Bailey decomposition).  Three TPU-critical choices,
driven by device microbenchmarks (scripts/bench_mxu_pieces.py):

  * Exact modular matmul on the bf16 systolic array: operands < q < 2^31
    split into four 8-bit limb planes; the weight matrix is pre-scaled per
    data-limb (W_alpha = 2^{8 alpha} W mod q) and limb-split again, so every
    MXU dot accumulates integers <= K*255^2 < 2^24 — exact in f32.  Per-dot
    sums are cast to i32 (sum over alpha <= 2^26, exact) and recombined
    mod q with u32 Montgomery multiplies by 2^{8 beta}.
  * NO u64 arithmetic anywhere on the device: a single u64 Barrett pass over
    [9,64,128,128] costs ~5 ms on v5e (XLA emulates 64-bit in 32-bit pairs);
    the same work as u32 Montgomery (16-bit-limb products, the
    ntt_pallas.py recipe, but in plain XLA) is ~50x cheaper.
  * NO runtime permutation: for square splits (even log2 n, i.e. every
    production size) the bit-reversal factorizes as
    br_2h(r*m + c) = br_h(c)*m + br_h(r), so the br_h permutations fold into
    the PRECOMPUTED W columns/rows and the twiddle table, and the residual
    axis swap is the matmul's own [.., i, k] -> [.., k, i] transpose.  A
    [9,64,16384] bit-reversal gather costs ~7 ms; folded, it is free.

The psi-twist and inverse 1/n scale also fold into W/twiddles.  Outputs are
BIT-IDENTICAL to ops/ntt.py's canonical order out[p] = m(psi^{2 br(p)+1}),
so MXU, Pallas and XLA paths interoperate (keys transformed on one path
work against ciphertexts on another).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from . import ntt as ntt_mod
from .modops32 import mont_mul as _mont_mul_v, addmod as _addmod_v32

U32 = jnp.uint32


def _split_n(n: int):
    """n = m*m (square split; even log2 only — all production sizes)."""
    h = (n.bit_length() - 1) // 2
    m = 1 << h
    assert m * m == n, f"MXU path requires even log2(n), got n={n}"
    assert m <= 256, f"n={n} too large for f32-exact accumulation"
    return m


def mxu_supported(n: int) -> bool:
    h = (n.bit_length() - 1) // 2
    return n >= 256 and (1 << (2 * h)) == n and (1 << h) <= 256


# ---------------------------------------------------------------------------
# u32 Montgomery arithmetic in plain XLA (vectorized over the prime axis)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# host-side tables (numpy only — lru_cached, must not touch jnp)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _tables(qs: tuple, n: int):
    """Per-prime tables with the psi-twist, 1/n scale, br_h permutations and
    Montgomery lifts all folded in.  Layout (P = len(qs), m = sqrt(n)):

      W2f  [4a,P,m,4b*m] bf16   forward matmul #1 (contract i2)
      Tf   [P,m,m]       u32    forward twiddle, Montgomery domain
      W1f  [4a,P,m,4b*m] bf16   forward matmul #2 (contract i1)
      W1i / Ti / W2i            inverse counterparts
      consts [2,P]       u32    (q, -q^{-1} mod 2^32)
    """
    m = _split_n(n)
    h = m.bit_length() - 1
    br = np.array([ntt_mod._bit_reverse(i, h) for i in range(m)], np.int64)
    i_ = np.arange(m)
    consts = np.zeros((2, len(qs)), np.uint32)
    W2f, Tf, W1f, W1i, Ti, W2i = [], [], [], [], [], []
    for pi, q in enumerate(qs):
        consts[0, pi] = q
        consts[1, pi] = (-pow(q, -1, 1 << 32)) % (1 << 32)
        psi = ntt_mod.get_plan(q, n).root
        w = psi * psi % q
        ninv = pow(n, q - 2, q)
        psi_i = pow(psi, q - 2, q)
        w_i = pow(w, q - 2, q)
        wm, wm_i = pow(w, m, q), pow(w_i, m, q)
        # forward #1: W2[i2,k2] = psi^{m i2} w^{m i2 k2}, cols br-permuted
        W2f.append(np.array(
            [[pow(psi, int(m * a), q) * pow(wm, int(a * int(br[b])), q) % q
              for b in i_] for a in i_], np.uint64))
        # forward twiddle: Tf[i1,k2'] = psi^{i1} w^{i1 br(k2')}
        Tf.append(np.array(
            [[pow(psi, int(a), q) * pow(w, int(a * int(br[b])), q) % q
              for b in i_] for a in i_], np.uint64))
        # forward #2: W1[i1,k1] = w^{m i1 k1}, cols br-permuted
        W1f.append(np.array(
            [[pow(wm, int(a * int(br[b])), q) for b in i_] for a in i_],
            np.uint64))
        # inverse #1: W1i'[j,i1] = w^{-m br(j) i1}  (rows br-permuted)
        W1i.append(np.array(
            [[pow(wm_i, int(int(br[a]) * b), q) for b in i_] for a in i_],
            np.uint64))
        # inverse twiddle: Ti'[i1,k2'] = psi^{-i1} w^{-i1 br(k2')}
        Ti.append(np.array(
            [[pow(psi_i, int(a), q) * pow(w_i, int(a * int(br[b])), q) % q
              for b in i_] for a in i_], np.uint64))
        # inverse #2: W2i'[k2',i2] = psi^{-m i2} w^{-m br(k2') i2} / n
        W2i.append(np.array(
            [[pow(psi_i, int(m * b), q) * pow(wm_i, int(int(br[a]) * b), q)
              * ninv % q for b in i_] for a in i_], np.uint64))
    qv = np.array(qs, np.uint64).reshape(-1, 1, 1)
    limb = lambda Ws: _weight_limbs(np.stack(Ws), qv)  # noqa: E731
    mont = lambda Ts: ((np.stack(Ts) << 32) % qv).astype(np.uint32)  # noqa: E731
    return dict(W2f=limb(W2f), Tf=mont(Tf), W1f=limb(W1f),
                W1i=limb(W1i), Ti=mont(Ti), W2i=limb(W2i), consts=consts)


def _weight_limbs(W, qv):
    """[P,K,N] u64 -> bf16 limb planes [4(alpha), P, K, 4(beta)*N]."""
    import ml_dtypes
    planes = []
    w = W
    for a in range(4):
        if a:
            w = (w << 8) % qv
        planes.append(np.concatenate(
            [((w >> (8 * b)) & 0xFF).astype(ml_dtypes.bfloat16)
             for b in range(4)], axis=-1))
    return np.stack(planes)


@lru_cache(maxsize=None)
def _beta_consts(qs: tuple):
    """(2^{8 beta} << 32) mod q — Montgomery-domain combine weights [4,P]."""
    return np.array([[(1 << (8 * b + 32)) % q for q in qs]
                     for b in range(4)], np.uint32)


# ---------------------------------------------------------------------------
# device pipeline (u32 end-to-end)
# ---------------------------------------------------------------------------

def _mod_matmul(x, wl, qs, qv, nqv):
    """Exact (x @ W) mod q per prime, contraction over x's LAST axis.
    x: u32 [P,B,R,K]; wl: bf16 planes [4,P,K,4N].  -> u32 [P,B,R,N]."""
    acc = None
    for a in range(4):
        xa = ((x >> U32(8 * a)) & U32(0xFF)).astype(jnp.bfloat16)
        p = jnp.einsum('pbrk,pkm->pbrm', xa, jnp.asarray(wl[a]),
                       preferred_element_type=jnp.float32)
        p = p.astype(jnp.int32)
        acc = p if acc is None else acc + p          # <= 4*K*255^2 < 2^26
    P_, B_, R_, M_ = acc.shape
    s = acc.astype(U32).reshape(P_, B_, R_, 4, M_ // 4)
    bc = _beta_consts(qs)
    out = None
    for b in range(4):
        cb = jnp.asarray(bc[b]).reshape(-1, 1, 1, 1)
        t = _mont_mul_v(s[..., b, :], cb, qv, nqv)
        out = t if out is None else _addmod_v32(out, t, qv)
    return out


def _consts(qs, n):
    tb = _tables(qs, n)
    qv = jnp.asarray(tb['consts'][0]).reshape(-1, 1, 1, 1)
    nqv = jnp.asarray(tb['consts'][1]).reshape(-1, 1, 1, 1)
    return tb, qv, nqv


def ntt_multi_mxu(a, qs: tuple):
    """Forward negacyclic NTT [P, ..., n] -> same, canonical eval order
    (bit-identical to ntt.ntt_multi)."""
    P, n = a.shape[0], a.shape[-1]
    assert P == len(qs)
    m = _split_n(n)
    tb, qv, nqv = _consts(qs, n)
    batch = a.shape[1:-1]
    # coeff index i = i1 + m*i2 -> [i2,i1]; transpose to put the contraction
    # axis (i2) last
    x = a.reshape((P, -1, m, m)).astype(U32)
    x = jnp.swapaxes(x, -1, -2)                          # [P,B,i1,i2]
    y = _mod_matmul(x, tb['W2f'], qs, qv, nqv)           # [P,B,i1,k2']
    y = _mont_mul_v(y, jnp.asarray(tb['Tf'])[:, None], qv, nqv)
    y = jnp.swapaxes(y, -1, -2)                          # [P,B,k2',i1]
    z = _mod_matmul(y, tb['W1f'], qs, qv, nqv)           # [P,B,k2',k1']
    # canonical_mat[r,c] = Z_nat[br(c),br(r)] = z[r,c]  -> flatten directly
    out = z.reshape((P,) + batch + (n,))
    return out.astype(a.dtype)


def intt_multi_mxu(a, qs: tuple):
    """Inverse negacyclic NTT from canonical eval order (bit-identical to
    ntt.intt_multi)."""
    P, n = a.shape[0], a.shape[-1]
    assert P == len(qs)
    m = _split_n(n)
    tb, qv, nqv = _consts(qs, n)
    batch = a.shape[1:-1]
    x = a.reshape((P, -1, m, m)).astype(U32)             # canonical [r,j]
    v = _mod_matmul(x, tb['W1i'], qs, qv, nqv)           # [P,B,r,i1]
    u = jnp.swapaxes(v, -1, -2)                          # [P,B,i1,r=k2']
    u = _mont_mul_v(u, jnp.asarray(tb['Ti'])[:, None], qv, nqv)
    w = _mod_matmul(u, tb['W2i'], qs, qv, nqv)           # [P,B,i1,i2]
    w = jnp.swapaxes(w, -1, -2).reshape((P,) + batch + (n,))
    return w.astype(a.dtype)
