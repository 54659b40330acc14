"""Negacyclic NTT / INTT (Cooley-Tukey DIT forward, Gentleman-Sande inverse).

TPU-native re-design of the reference NTT (reference arith/src/ntt.rs):

  * the per-(q, n) root tables are computed host-side with Python big ints and
    cached (functional analog of the reference's OnceLock cache, ntt.rs:16-38);
    they are stored bit-reversed exactly as the reference does (ntt.rs:133-147)
    so that the butterfly schedule — and hence every intermediate value — is
    bit-exact with the reference.
  * the log2(n) butterfly stages are expressed as reshape + broadcast
    elementwise ops over the whole (batched) coefficient array: no scalar
    loops, no gathers; XLA maps each stage onto the VPU and fuses the chain.
  * arbitrary leading batch dimensions are supported; the transform applies to
    the last axis.

Requires q prime with q ≡ 1 (mod 2n).
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from . import modops

U64 = jnp.uint64


def _pow_mod(x: int, k: int, q: int) -> int:
    return pow(x, k, q)


def _primitive_root_of_unity(q: int, m: int) -> int:
    """Smallest-k primitive m-th root of unity by Pornin's method
    (reference ntt.rs:115-131): w = k^((q-1)/m); accept if w^(m/2) != 1."""
    assert (q - 1) % m == 0, f"q={q} is not NTT-friendly for m={m}"
    for k in range(1, q):
        w = _pow_mod(k, (q - 1) // m, q)
        if _pow_mod(w, m // 2, q) != 1:
            return w
    raise ValueError("no primitive root of unity")


def _bit_reverse(i: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


class NttPlan:
    """Precomputed tables for a negacyclic NTT over Z_q[X]/(X^n+1)."""

    def __init__(self, q: int, n: int):
        assert n & (n - 1) == 0, "n must be a power of two"
        self.q = q
        self.n = n
        self.log_n = n.bit_length() - 1
        w = _primitive_root_of_unity(q, 2 * n)  # 2n-th root -> negacyclic
        logn = self.log_n
        roots = [_pow_mod(w, _bit_reverse(i, logn), q) for i in range(n)]
        roots_inv = [pow(r, q - 2, q) for r in roots]
        self.root = w
        self.roots = jnp.asarray(np.array(roots, dtype=np.uint64))
        self.roots_inv = jnp.asarray(np.array(roots_inv, dtype=np.uint64))
        self.n_inv = pow(n, q - 2, q)


@lru_cache(maxsize=None)
def get_plan(q: int, n: int) -> NttPlan:
    return NttPlan(q, n)


def ntt(a, q: int):
    """Forward negacyclic NTT over the last axis. a: u64 [..., n] in [0, q)."""
    n = a.shape[-1]
    if n == 1:
        return a
    plan = get_plan(q, n)
    batch = a.shape[:-1]
    r = a
    t, m = n // 2, 1
    while m < n:
        # group layout (reference ntt.rs:48-65): m groups of 2t lanes
        r = r.reshape(batch + (m, 2, t))
        u = r[..., 0, :]
        s = plan.roots[m:2 * m]                      # [m]
        v = modops.mulmod(r[..., 1, :], s[:, None], q)
        r = jnp.stack([modops.addmod(u, v, q), modops.submod(u, v, q)], axis=-2)
        t //= 2
        m *= 2
    return r.reshape(batch + (n,))


def intt(a, q: int):
    """Inverse negacyclic NTT (GS) over the last axis, with final n^-1 scale."""
    n = a.shape[-1]
    if n == 1:
        return a
    plan = get_plan(q, n)
    batch = a.shape[:-1]
    r = a
    t, m = 1, n // 2
    while m > 0:
        r = r.reshape(batch + (m, 2, t))
        u = r[..., 0, :]
        v = r[..., 1, :]
        s = plan.roots_inv[m:2 * m]
        r = jnp.stack(
            [modops.addmod(u, v, q), modops.mulmod(modops.submod(u, v, q), s[:, None], q)],
            axis=-2)
        t *= 2
        m //= 2
    r = r.reshape(batch + (n,))
    return modops.mulmod(r, U64(plan.n_inv), q)


def negacyclic_mul(a, b, q: int):
    """Polynomial product in Z_q[X]/(X^n+1) via NTT∘pointwise∘INTT."""
    ea = ntt(a, q)
    eb = ntt(b, q)
    return intt(modops.mulmod(ea, eb, q), q)


# ---------------------------------------------------------------------------
# Exact integer negacyclic convolution via CRT over NTT-friendly primes.
# Used for: Z[X] products whose coefficients exceed the direct i64 range
# (BFV tensor at large N) and the fast mod-2^64 torus product.
# ---------------------------------------------------------------------------

# NTT-friendly primes p ≡ 1 (mod 2^27): support n up to 2^26.
CRT_PRIMES = (2013265921, 1811939329, 469762049)  # 15*2^27+1, 27*2^26+1, 7*2^26+1


def _conv_mod_p(a_mod, b_mod, p):
    return negacyclic_mul(a_mod, b_mod, p)


def negacyclic_conv_crt_u64(a, b, num_primes: int = 2):
    """Exact negacyclic convolution of nonneg u64 inputs, values assumed small
    enough that |result| < prod(primes)/2.  Returns u64 (exact value)."""
    p1, p2 = CRT_PRIMES[:2]
    assert num_primes == 2
    r1 = _conv_mod_p(a % U64(p1), b % U64(p1), p1)
    r2 = _conv_mod_p(a % U64(p2), b % U64(p2), p2)
    # Garner: v = r1 + p1 * ((r2 - r1) * p1^{-1} mod p2)
    p1_inv_p2 = pow(p1, -1, p2)
    d = modops.mulmod(modops.submod(r2, r1 % U64(p2), p2), U64(p1_inv_p2), p2)
    return r1 + U64(p1) * d


def polymul_i64_crt(a, b):
    """Exact negacyclic product of signed int64 coefficient arrays via 2-prime
    CRT; result must satisfy |c_k| < p1*p2/2 ≈ 2^60.7. Returns int64."""
    p1, p2 = CRT_PRIMES[:2]
    a1 = modops.coerce_i64(a, p1)
    b1 = modops.coerce_i64(b, p1)
    a2 = modops.coerce_i64(a, p2)
    b2 = modops.coerce_i64(b, p2)
    r1 = _conv_mod_p(a1, b1, p1)
    r2 = _conv_mod_p(a2, b2, p2)
    p1_inv_p2 = pow(p1, -1, p2)
    d = modops.mulmod(modops.submod(r2, r1 % U64(p2), p2), U64(p1_inv_p2), p2)
    v = (r1 + U64(p1) * d).astype(jnp.int64)  # in [0, p1*p2) — fits i64
    m = p1 * p2
    return jnp.where(v > m // 2, v - jnp.int64(m), v)  # centered lift
