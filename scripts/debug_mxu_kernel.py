"""Debug the Pallas-MXU kernel: full fwd compile error + inverse timing vs bb."""
import os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt_mxu_pallas as MP
from fhe_study_tpu.ops.primes import ntt_primes

n, B, P = 1 << 14, 64, 9
qs = ntt_primes(P, 30, 1 << 16)
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    np.stack([rng.integers(0, q, (B, n)) for q in qs]), jnp.uint64),
    jax.devices()[0])
probe = jax.jit(lambda y: jnp.sum(y[:, 0, :256]))

def timeit(f, iters=6):
    y = f(x); float(probe(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    float(probe(y))
    return (time.perf_counter() - t0) / iters

null = timeit(jax.jit(lambda a: a + jnp.uint64(1)))
print(f"null {null*1e3:.3f} ms", flush=True)

# 1. forward: capture the full error
try:
    f = jax.jit(lambda a: MP.ntt_multi_mxu_pallas(a, qs, block_b=8))
    dt = timeit(f)
    print(f"fwd bb=8 {dt*1e3:.3f} ms (net {(dt-null)*1e3:.3f})", flush=True)
except Exception as e:
    msg = str(e)
    print("FWD FAIL:", msg[:3000], flush=True)

# 2. inverse at different block sizes
for bb in (4, 16):
    try:
        f = jax.jit(lambda a, bb=bb: MP.ntt_multi_mxu_pallas(
            a, qs, inverse=True, block_b=bb))
        dt = timeit(f)
        print(f"inv bb={bb:2d} {dt*1e3:.3f} ms (net {(dt-null)*1e3:.3f})", flush=True)
    except Exception as e:
        print(f"inv bb={bb} FAIL: {str(e)[:300]}", flush=True)
