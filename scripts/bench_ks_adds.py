"""Isolate the ks_fused adds-epilogue slowdown on the TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt_pallas as NP
from fhe_study_tpu.ops.primes import ntt_primes

n, B, L = 1 << 12, 16, 4
qs = ntt_primes(L, 30, 1 << 16)
rng = np.random.default_rng(0)
c = jnp.asarray(np.stack([rng.integers(0, q, (B, n)) for q in qs]), jnp.uint32)
kb = jnp.asarray(np.stack([np.stack([rng.integers(0, p, n) for p in qs])
                           for _ in range(L)]), jnp.uint32)
ka = kb
a0 = c
a1 = c

def timeit(f, iters=8):
    o = f(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

f0 = jax.jit(lambda x: NP.ks_fused_u32(x, kb, ka, qs, qs))
f1 = jax.jit(lambda x: NP.ks_fused_u32(x, kb, ka, qs, qs, adds=(a0, a1)))
print(f"no adds: {timeit(lambda: f0(c))*1e3:.2f} ms", flush=True)
print(f"with adds: {timeit(lambda: f1(c))*1e3:.2f} ms", flush=True)
