"""NTT path comparison with FORCED materialization: chain y=f(y) then read a
scalar reduced from y back to host — the tunnel's block_until_ready does not
reliably block, a value readback must."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt as N, ntt_mxu, ntt_mxu_pallas, ntt_pallas
from fhe_study_tpu.ops.primes import ntt_primes

n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
B = int(os.environ.get("FHE_BENCH_B", 64))
P = int(os.environ.get("FHE_BENCH_P", 9))
qs = ntt_primes(P, 30, 1 << 16)
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    np.stack([rng.integers(0, q, (B, n)) for q in qs]), jnp.uint64),
    jax.devices()[0])
probe = jax.jit(lambda y: jnp.sum(y[:, 0, :256]))

def timeit(f, iters=10):
    y = f(x)
    float(probe(y))          # warm, forced
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    s = float(probe(y))      # forces the whole chain
    return (time.perf_counter() - t0) / iters

base_overhead = timeit(jax.jit(lambda a: a + jnp.uint64(1)))
print(f"{'null (a+1)':16s} {base_overhead*1e3:8.3f} ms", flush=True)
nbfly = P * B * (n // 2) * (n.bit_length() - 1)
for name, f in {
    "xla_butterfly": jax.jit(lambda a: N.ntt_multi(a, qs)),
    "pallas": jax.jit(lambda a: ntt_pallas.ntt_multi_u32(a, qs)),
    "mxu": jax.jit(lambda a: ntt_mxu.ntt_multi_mxu(a, qs)),
    "mxu_pallas": jax.jit(lambda a: ntt_mxu_pallas.ntt_multi_mxu_pallas(a, qs)),
    "mxu_pallas_inv": jax.jit(lambda a: ntt_mxu_pallas.ntt_multi_mxu_pallas(
        a, qs, inverse=True)),
}.items():
    try:
        dt = timeit(f)
        print(f"{name:16s} {dt*1e3:8.3f} ms  {nbfly/dt/1e9:7.1f} Gbfly/s",
              flush=True)
    except Exception as e:
        print(f"{name:16s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
