"""Focused TPU bench: Pallas-MXU NTT kernel vs butterfly Pallas kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt_mxu_pallas as MP, ntt_pallas as NP, ntt as N
from fhe_study_tpu.ops.primes import ntt_primes

n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
B = int(os.environ.get("FHE_BENCH_B", 64))
P = int(os.environ.get("FHE_BENCH_P", 9))
bb = int(os.environ.get("FHE_BB", 8))
qs = ntt_primes(P, 30, 1 << 16)
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    np.stack([rng.integers(0, q, (B, n)) for q in qs]), jnp.uint64),
    jax.devices()[0])
probe = jax.jit(lambda y: jnp.sum(y[:, 0, :256]))

def timeit(f, iters=10):
    y = f(x); float(probe(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    float(probe(y))
    return (time.perf_counter() - t0) / iters

null = timeit(jax.jit(lambda a: a + jnp.uint64(1)))
print(f"null: {null*1e3:.3f} ms", flush=True)
nb = P * B * (n // 2) * (n.bit_length() - 1)
for name, f in {
    "pallas_butterfly_fwd": jax.jit(lambda a: NP.ntt_multi_u32(a, qs)),
    "mxu_pallas_fwd": jax.jit(lambda a: MP.ntt_multi_mxu_pallas(a, qs, block_b=bb)),
    "mxu_pallas_inv": jax.jit(lambda a: MP.ntt_multi_mxu_pallas(a, qs, inverse=True, block_b=bb)),
}.items():
    try:
        dt = timeit(f) - null
        ok = (np.asarray(f(x)[:, :2]) == np.asarray(
            (N.intt_multi if "inv" in name else N.ntt_multi)(x[:, :2], qs))).all()
        print(f"{name:22s} {dt*1e3:8.3f} ms (net)  {nb/dt/1e9:6.1f} Gbfly/s  match={bool(ok)}", flush=True)
    except Exception as e:
        print(f"{name:22s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
