"""Compare NTT implementations on the attached device: XLA butterflies vs
Pallas fused kernel (the MXU four-step path was removed in r3 — BENCH.md).  [P, B, n] multi-prime shapes.

Usage: python scripts/bench_ntt_paths.py  [env: FHE_BENCH_N/B/P]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp
from fhe_study_tpu.ops import ntt as N
from fhe_study_tpu.ops import ntt_pallas
from fhe_study_tpu.ops.primes import ntt_primes


def timeit(f, x, iters=10):
    """Chain outputs into inputs: every iteration sees a DIFFERENT value, so
    no layer (XLA, axon relay) can serve a cached result."""
    y = f(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
    B = int(os.environ.get("FHE_BENCH_B", 64))
    P = int(os.environ.get("FHE_BENCH_P", 9))
    qs = ntt_primes(P, 30, 1 << 16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack([rng.integers(0, q, (B, n)) for q in qs]),
                    jnp.uint64)
    x = jax.device_put(x, jax.devices()[0])

    nbfly = P * B * (n // 2) * (n.bit_length() - 1)
    paths = {
        "xla_butterfly": jax.jit(lambda a: N.ntt_multi(a, qs)),
        "pallas": jax.jit(lambda a: ntt_pallas.ntt_multi_u32(a, qs)),
    }
    for name, f in paths.items():
        try:
            dt = timeit(f, x)  # forward chained into forward
            ok = (np.asarray(f(x)) == np.asarray(paths["xla_butterfly"](x))).all()
            gb = nbfly / dt / 1e9
            print(f"{name:16s} {dt*1e3:8.3f} ms  {gb:7.1f} Gbfly/s  "
                  f"match={'OK' if ok else 'FAIL'}", flush=True)
        except Exception as e:
            print(f"{name:16s} FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
