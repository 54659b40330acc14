"""RNS-BFV — the production / benchmark BFV variant.

The reference BFV (bfv/src/lib.rs) works over one small modulus with i128
schoolbook arithmetic and a p·q relinearization; it cannot reach production
ring sizes (its own tests stop at n=16, and q=2^16+1 runs out of noise budget
beyond n≈32).  This module is the TPU-native design the headline benchmark
needs: ciphertext modulus Q = prod(q_i) of ~30-bit NTT primes, all arithmetic
residue-wise (u64 exact), tensor scaling via HPS-style fast base extension
with floating-point sign correction (eprint 2018/117's technique), and
RNS-gadget relinearization (no p·q extension).

Residue layout: every polynomial is [L, ..., N] u64 with the LIMB axis
leading — the natural `ep` sharding axis (limbs are independent except at
base extension / decrypt, which reduce over limbs).

Divergences from the reference (documented, production-motivated):
  * scaling uses floor instead of round-half-away (≤1 ulp noise at Q≈2^240)
  * relinearization = RNS gadget (per-limb digits), not 2021/204's p·q lift
"""

from dataclasses import dataclass, field
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..arith.params import RingParam
from ..ops import modops, ntt
from ..ops.primes import ntt_primes
from ..utils import prng

ERR_SIGMA = 3.2
U64 = jnp.uint64


@dataclass(frozen=True)
class RnsParam:
    n: int            # ring degree
    t: int            # plaintext modulus
    L: int            # number of Q-basis primes
    M: int            # number of P-basis (extension) primes
    prime_bits: int = 30

    @property
    def qs(self):
        return ntt_primes(self.L, self.prime_bits, 1 << 16)

    @property
    def ps(self):
        return ntt_primes(self.M, self.prime_bits, 1 << 16, skip=self.L)


class _Basis:
    """Host-precomputed CRT data for one prime basis (plain numpy/int —
    lru_cached, so no jnp values here)."""

    def __init__(self, primes):
        self.primes = tuple(primes)
        self.prod = 1
        for p in self.primes:
            self.prod *= p
        self.hat = [self.prod // p for p in self.primes]           # Q̂_i
        self.hat_inv = [pow(h, -1, p) for h, p in zip(self.hat, self.primes)]
        self.inv_f = np.array([1.0 / p for p in self.primes])


@lru_cache(maxsize=None)
def _basis(primes: tuple) -> _Basis:
    return _Basis(primes)


@lru_cache(maxsize=None)
def _ext_table(src: tuple, dst: tuple):
    """[len(src), len(dst)] table of (S/ s_i) mod d_j, plus S mod d_j."""
    b = _basis(src)
    tab = np.array([[h % d for d in dst] for h in b.hat], np.uint64)
    smod = np.array([b.prod % d for d in dst], np.uint64)
    return tab, smod


def _to_residues(x, primes):
    """int64/uint64 [..., n] -> [L, ..., n] residues."""
    return jnp.stack([modops.coerce_i64(jnp.asarray(x, jnp.int64), p)
                      for p in primes], axis=0)


def fast_base_extend(x, src: tuple, dst: tuple, centered: bool = False):
    """HPS fast base conversion: x [Ls, ..., n] residues -> residues in dst.

    centered=False: value v interpreted in [0, S)   -> α = floor(Σ y_i/s_i)
    centered=True : value v interpreted in (−S/2, S/2) -> α = round(Σ y_i/s_i)
    (the tensor's negacyclic folds produce SIGNED values; the centered
    interpretation recovers them exactly — BEHZ's signed-representative
    handling, done with f64 correction à la HPS.  The ~2^-50-wide f64
    boundary can mis-round α by 1, shifting the value by ±S ≡ ±Q·(junk):
    harmless on tensor operands — Q-multiples become t-multiples after the
    t/Q scaling and vanish mod t at decryption.)"""
    b = _basis(src)
    tab, smod = _ext_table(src, dst)
    ys = [modops.mulmod(x[i], U64(b.hat_inv[i]), src[i])
          for i in range(len(src))]                                # y_i < s_i
    alpha_f = sum(y.astype(jnp.float64) * b.inv_f[i] for i, y in enumerate(ys))
    alpha = jnp.floor(alpha_f + (0.5 if centered else 0.0)).astype(jnp.uint64)
    outs = []
    for j, d in enumerate(dst):
        acc = jnp.zeros_like(x[0])
        for i in range(len(src)):
            acc = acc + modops.mulmod(ys[i] % U64(d), U64(int(tab[i, j])), d)
        acc = acc % U64(d)
        corr = modops.mulmod(alpha % U64(d), U64(int(smod[j])), d)
        outs.append(modops.submod(acc, corr, d))
    return jnp.stack(outs, axis=0)


class SecretKey(NamedTuple):
    s_evals: jax.Array   # [L+M, ..., N] NTT(s) per prime (Q then P basis)


class PublicKey(NamedTuple):
    b: jax.Array  # [L, ..., N]  (-a·s + e)
    a: jax.Array


class RLK(NamedTuple):
    """RNS-gadget relin key: row i encrypts s^2·(Q̂_i·Q̂_i^{-1} mod Q).
    Stored in the NTT domain: [L_rows, L_primes, ..., N]."""
    b: jax.Array
    a: jax.Array


class CT(NamedTuple):
    c0: jax.Array  # [L, ..., N]
    c1: jax.Array


def _ntt_all(x, primes):
    return jnp.stack([ntt.ntt(x[i], p) for i, p in enumerate(primes)], 0)


def _intt_all(x, primes):
    return jnp.stack([ntt.intt(x[i], p) for i, p in enumerate(primes)], 0)


# -- keys -------------------------------------------------------------------

def new_key(key, param: RnsParam, batch=()):
    qs, ps = param.qs, param.ps
    k_s, k_a, k_e = prng.split(key, 3)
    s = prng.binary(k_s, tuple(batch) + (param.n,)).astype(jnp.int64)
    s_res = _to_residues(s, qs + ps)
    s_evals = jnp.stack([ntt.ntt(s_res[i], p) for i, p in enumerate(qs + ps)], 0)
    a = jnp.stack([prng.uniform_mod(jax.random.fold_in(k_a, i),
                                    tuple(batch) + (param.n,), q)
                   for i, q in enumerate(qs)], 0)
    e = prng.gaussian_int(k_e, tuple(batch) + (param.n,), ERR_SIGMA)
    e_res = _to_residues(e, qs)
    b = jnp.stack([
        modops.submod(e_res[i],
                      ntt.intt(modops.mulmod(ntt.ntt(a[i], q), s_evals[i], q), q),
                      q)
        for i, q in enumerate(qs)], 0)
    return SecretKey(s_evals), PublicKey(b=b, a=a)


def rlk_key(key, param: RnsParam, sk: SecretKey, batch=()):
    """Row i: (-(a_i·s + e_i) + s^2·g_i, a_i) mod Q, g_i the RNS gadget."""
    qs = param.qs
    bq = _basis(qs)
    k_a, k_e = prng.split(key, 2)
    rows_b, rows_a = [], []
    for i in range(param.L):
        g_i = bq.hat[i] * bq.hat_inv[i]          # mod Q, big int
        a = jnp.stack([prng.uniform_mod(jax.random.fold_in(k_a, i * param.L + j),
                                        tuple(batch) + (param.n,), q)
                       for j, q in enumerate(qs)], 0)
        e = _to_residues(prng.gaussian_int(jax.random.fold_in(k_e, i),
                                           tuple(batch) + (param.n,), ERR_SIGMA), qs)
        b_i, a_i = [], []
        for j, q in enumerate(qs):
            ea = ntt.ntt(a[j], q)
            as_ = modops.mulmod(ea, sk.s_evals[j], q)
            s2 = modops.mulmod(sk.s_evals[j], sk.s_evals[j], q)
            s2g = modops.mulmod(s2, U64(g_i % q), q)
            e_ev = ntt.ntt(e[j], q)
            b_i.append(modops.submod(modops.addmod(s2g, e_ev, q), as_, q))
            a_i.append(ea)
        rows_b.append(jnp.stack(b_i, 0))
        rows_a.append(jnp.stack(a_i, 0))
    return RLK(b=jnp.stack(rows_b, 0), a=jnp.stack(rows_a, 0))


# -- encrypt / decrypt ------------------------------------------------------

def encrypt(key, param: RnsParam, pk: PublicKey, m, batch=()):
    """c = (Δ·m + pk.b·u + e0, pk.a·u + e1), Δ_i = (Q//t) mod q_i."""
    qs = param.qs
    bq = _basis(qs)
    delta = bq.prod // param.t
    k_u, k_e0, k_e1 = prng.split(key, 3)
    u = prng.ternary(k_u, tuple(batch) + (param.n,))
    u_res = _to_residues(u, qs)
    e0 = _to_residues(prng.gaussian_int(k_e0, tuple(batch) + (param.n,),
                                        ERR_SIGMA), qs)
    e1 = _to_residues(prng.gaussian_int(k_e1, tuple(batch) + (param.n,),
                                        ERR_SIGMA), qs)
    m = jnp.asarray(m, jnp.int64)
    c0, c1 = [], []
    for i, q in enumerate(qs):
        eu = ntt.ntt(u_res[i], q)
        dm = modops.mulmod(modops.coerce_i64(m, q), U64(delta % q), q)
        c0.append(modops.addmod(
            modops.addmod(ntt.intt(modops.mulmod(ntt.ntt(pk.b[i], q), eu, q), q),
                          e0[i], q), dm, q))
        c1.append(modops.addmod(
            ntt.intt(modops.mulmod(ntt.ntt(pk.a[i], q), eu, q), q), e1[i], q))
    return CT(jnp.stack(c0, 0), jnp.stack(c1, 0))


def decrypt(param: RnsParam, sk: SecretKey, c: CT):
    """m = round(t·x/Q) mod t via per-limb HPS accumulation (no big ints)."""
    qs = param.qs
    bq = _basis(qs)
    xs = []
    for i, q in enumerate(qs):
        cs = modops.addmod(
            c.c0[i],
            ntt.intt(modops.mulmod(ntt.ntt(c.c1[i], q), sk.s_evals[i], q), q), q)
        xs.append(modops.mulmod(cs, U64(bq.hat_inv[i]), q))      # y_i
    v = sum(x.astype(jnp.float64) * (param.t * bq.inv_f[i])
            for i, x in enumerate(xs))
    from ..utils.rounding import round_half_away
    return modops.coerce_i64(round_half_away(v), param.t)


# -- linear ops -------------------------------------------------------------

def add(param: RnsParam, x: CT, y: CT) -> CT:
    qs = param.qs
    c0 = jnp.stack([modops.addmod(x.c0[i], y.c0[i], q) for i, q in enumerate(qs)], 0)
    c1 = jnp.stack([modops.addmod(x.c1[i], y.c1[i], q) for i, q in enumerate(qs)], 0)
    return CT(c0, c1)


def add_pt(param: RnsParam, x: CT, m) -> CT:
    qs = param.qs
    delta = _basis(qs).prod // param.t
    m = jnp.asarray(m, jnp.int64)
    c0 = jnp.stack([
        modops.addmod(x.c0[i],
                      modops.mulmod(modops.coerce_i64(m, q), U64(delta % q), q), q)
        for i, q in enumerate(qs)], 0)
    return CT(c0, x.c1)


def mul_pt(param: RnsParam, x: CT, m) -> CT:
    """ciphertext × plaintext polynomial (unscaled constant)."""
    qs = param.qs
    m = jnp.asarray(m, jnp.int64)
    c0, c1 = [], []
    for i, q in enumerate(qs):
        em = ntt.ntt(modops.coerce_i64(m, q), q)
        c0.append(ntt.intt(modops.mulmod(ntt.ntt(x.c0[i], q), em, q), q))
        c1.append(ntt.intt(modops.mulmod(ntt.ntt(x.c1[i], q), em, q), q))
    return CT(jnp.stack(c0, 0), jnp.stack(c1, 0))


# -- multiplication ---------------------------------------------------------

def _tensor(param: RnsParam, x: CT, y: CT):
    """Degree-2 product over basis Q∪P, then floor(t·v/Q) mapped back to Q."""
    qs, ps = param.qs, param.ps
    both = qs + ps
    # capacity: |t·v| < t·n·Q^2 must fit in QP/2, and |r| < t·n·Q in P/2
    import math
    q_bits = sum(math.log2(q) for q in qs)
    p_bits = sum(math.log2(p) for p in ps)
    need_p = math.log2(param.t) + math.log2(param.n) + q_bits + 2
    assert p_bits > need_p and param.t <= (1 << 22), \
        f"P basis too small: {p_bits:.0f} bits, need > {need_p:.0f}"
    # 1. extend all four polys to the P basis
    parts = {}
    for name, poly in (("x0", x.c0), ("x1", x.c1), ("y0", y.c0), ("y1", y.c1)):
        ext = fast_base_extend(poly, qs, ps)
        parts[name] = jnp.concatenate([poly, ext], axis=0)    # [L+M, ..., n]
    # 2. per-prime NTT products
    d0, d1, d2 = [], [], []
    for i, p in enumerate(both):
        ex0 = ntt.ntt(parts["x0"][i], p)
        ex1 = ntt.ntt(parts["x1"][i], p)
        ey0 = ntt.ntt(parts["y0"][i], p)
        ey1 = ntt.ntt(parts["y1"][i], p)
        d0.append(ntt.intt(modops.mulmod(ex0, ey0, p), p))
        d1.append(ntt.intt(modops.addmod(modops.mulmod(ex0, ey1, p),
                                         modops.mulmod(ex1, ey0, p), p), p))
        d2.append(ntt.intt(modops.mulmod(ex1, ey1, p), p))
    out = []
    # 3. scale: r = floor(t·v/Q) computed in P, extended back to Q
    for d in (d0, d1, d2):
        d = jnp.stack(d, 0)
        w_q = jnp.stack([modops.mulmod(d[i], U64(param.t % q), q)
                         for i, q in enumerate(qs)], 0)
        w_p = jnp.stack([modops.mulmod(d[param.L + j], U64(param.t % p), p)
                         for j, p in enumerate(ps)], 0)
        # [w]_Q is the UNSIGNED remainder (w − [w]_Q = Q·floor(w/Q), exact
        # for signed w too), so its extension uses the [0,Q) interpretation;
        # r = floor(w/Q) is signed and small -> centered extension back to Q
        wq_in_p = fast_base_extend(w_q, qs, ps)
        Q = _basis(qs).prod
        r_p = jnp.stack([
            modops.mulmod(modops.submod(w_p[j], wq_in_p[j], p),
                          U64(pow(Q, -1, p)), p)
            for j, p in enumerate(ps)], 0)
        out.append(fast_base_extend(r_p, ps, qs, centered=True))
    return out


def relinearize(param: RnsParam, rlk: RLK, c0, c1, c2) -> CT:
    """RNS-gadget relin: digits are c2's own limb residues."""
    qs = param.qs
    r0, r1 = [], []
    for j, q in enumerate(qs):
        acc0 = jnp.zeros_like(c0[j])
        acc1 = jnp.zeros_like(c0[j])
        for i in range(param.L):
            d_i = c2[i] % U64(q)                 # digit i reduced mod q_j
            ed = ntt.ntt(d_i, q)
            acc0 = acc0 + modops.mulmod(ed, rlk.b[i, j], q)
            acc1 = acc1 + modops.mulmod(ed, rlk.a[i, j], q)
        r0.append(modops.addmod(c0[j], ntt.intt(acc0 % U64(q), q), q))
        r1.append(modops.addmod(c1[j], ntt.intt(acc1 % U64(q), q), q))
    return CT(jnp.stack(r0, 0), jnp.stack(r1, 0))


def mul(param: RnsParam, rlk: RLK, x: CT, y: CT) -> CT:
    c0, c1, c2 = _tensor(param, x, y)
    return relinearize(param, rlk, c0, c1, c2)


def mod_switch_drop(param: RnsParam, c: CT):
    """Drop the last Q prime: c' = (c - [c]_{q_last})·q_last^{-1} — the BFV
    modulus-switch noise-management step (returns ct under L-1 primes)."""
    qs = param.qs
    last = qs[-1]
    c0, c1 = [], []
    for i, q in enumerate(qs[:-1]):
        inv = U64(pow(last, -1, q))
        c0.append(modops.mulmod(
            modops.submod(c.c0[i], c.c0[-1] % U64(q), q), inv, q))
        c1.append(modops.mulmod(
            modops.submod(c.c1[i], c.c1[-1] % U64(q), q), inv, q))
    return CT(jnp.stack(c0, 0), jnp.stack(c1, 0))
