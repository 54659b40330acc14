"""Deterministic samplers (threefry keys) for keys / masks / noise.

The reference samples through ``rand::thread_rng`` + f64 distributions and
rounds (reference arith/src/ring.rs:40, gfhe/src/glwe.rs:77-87).  Its tests are
statistical round trips, not fixed-stream, so this library uses proper integer
sampling with explicit jax PRNG keys and documents the distribution
divergences:

  * "binary" secret keys: the reference rounds U[0,2) to {0,1,2} with
    probabilities (.25,.5,.25); we sample true uniform bits {0,1}
    (required for a *correct* TFHE blind rotation).
  * ternary: the reference rounds U[-1,1) giving {-1,0,1} w.p. (.25,.5,.25);
    we reproduce that distribution exactly.
  * gaussian noise: Normal(0, sigma) rounded to the nearest integer;
    the reference's Rust `as u64` cast saturates negatives to 0 on the torus —
    we instead wrap mod 2^64 (symmetric noise; strictly more correct).
"""

import jax
import jax.numpy as jnp

from .rounding import round_half_away


def uniform_u64(key, shape):
    """Uniform over the full u64 range (torus uniform)."""
    hi = jax.random.randint(key, shape, 0, 1 << 32, dtype=jnp.uint32).astype(jnp.uint64)
    lo = jax.random.randint(jax.random.fold_in(key, 1), shape, 0, 1 << 32,
                            dtype=jnp.uint32).astype(jnp.uint64)
    return (hi << jnp.uint64(32)) | lo


def uniform_mod(key, shape, q: int):
    """Uniform over [0, q). Exact for q < 2^63 via rejection-free randint."""
    if q <= (1 << 31):
        return jax.random.randint(key, shape, 0, q, dtype=jnp.int64).astype(jnp.uint64)
    # randint supports arbitrary int64 bounds
    return jax.random.randint(key, shape, 0, q, dtype=jnp.int64).astype(jnp.uint64)


def uniform_mod_multi(key, shape, qs: tuple):
    """Uniform residues over a prime basis: [len(qs), *shape], exact
    per-modulus (randint takes broadcast vector bounds) — ONE sampler op
    where a per-prime loop would emit len(qs) (key-set builders at L~30
    limbs otherwise trace thousands of calls into one graph)."""
    q = jnp.asarray(qs, jnp.int64).reshape((len(qs),) + (1,) * len(shape))
    return jax.random.randint(key, (len(qs),) + tuple(shape), 0, q,
                              dtype=jnp.int64).astype(jnp.uint64)


def binary(key, shape):
    """Uniform bits in {0, 1} as u64."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.uint64)


def ternary(key, shape):
    """{-1,0,1} with probabilities (.25,.5,.25), as signed int64.

    Matches the reference's round(U[-1,1)) distribution
    (reference bfv/src/lib.rs:148, ckks/src/lib.rs:49).
    """
    u = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    return round_half_away(u).astype(jnp.int64)


def sparse_ternary(key, shape, h: int):
    """{-1,0,1} with EXACTLY h nonzeros (random signs) along the last
    axis, signed int64 — the sparse-secret distribution of the CKKS
    bootstrapping literature (Hamming weight h, typically 64): it bounds
    the ModRaise overflow count I by ~sqrt(h) instead of ~sqrt(n), which
    keeps the EvalMod range K (and its level cost) n-independent."""
    n = shape[-1]
    assert 0 < h <= n
    k_perm, k_sign = jax.random.split(key)
    lead = shape[:-1]
    nb = 1
    for d in lead:
        nb *= d
    perm = jax.vmap(lambda k: jax.random.permutation(k, n))(
        jax.random.split(k_perm, nb)).reshape(lead + (n,))
    signs = jax.random.rademacher(k_sign, shape, dtype=jnp.int64)
    return jnp.where(perm < h, signs, 0)


def gaussian_int(key, shape, sigma: float):
    """Normal(0, sigma) rounded to nearest int (signed int64)."""
    g = sigma * jax.random.normal(key, shape, dtype=jnp.float64)
    return round_half_away(g).astype(jnp.int64)


def gaussian_mod(key, shape, sigma: float, q: int):
    """Rounded gaussian reduced into [0, q)."""
    e = gaussian_int(key, shape, sigma)
    qq = jnp.int64(q)
    return jnp.mod(jnp.mod(e, qq) + qq, qq).astype(jnp.uint64)


def gaussian_torus(key, shape, sigma: float):
    """Rounded gaussian wrapped mod 2^64 (torus noise)."""
    return gaussian_int(key, shape, sigma).astype(jnp.uint64)


def split(key, n):
    return jax.random.split(key, n)
