"""Stage-level timing of the RNS-BFV multiply on the attached device.

Usage: python scripts/profile_mul.py  [env: FHE_BENCH_N/L/M/B]
Times each pipeline stage jitted in isolation; guides kernel work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FHE_USE_PALLAS_NTT", "1")

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")

import jax.numpy as jnp
from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.ops.ntt import ntt_multi, intt_multi, mulmod_v, _qvec, barrett_muv
from fhe_study_tpu.utils import prng


def timeit(f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("FHE_BENCH_N", 1 << 13))
    L = int(os.environ.get("FHE_BENCH_L", 4))
    M = int(os.environ.get("FHE_BENCH_M", 5))
    B = int(os.environ.get("FHE_BENCH_B", 16))
    param = R.RnsParam(n=n, t=256, L=L, M=M)
    qs, ps = param.qs, param.ps
    both = qs + ps
    ks = prng.split(jax.random.PRNGKey(0), 6)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sk, pk = R.new_key(ks[0], param)
        rlk = R.rlk_key(ks[1], param, sk)
        m1 = prng.uniform_mod(ks[2], (B, n), param.t)
        c1 = R.encrypt(ks[4], param, pk, m1, batch=(B,))
    dev = jax.devices()[0]
    rlk, c1 = jax.tree.map(lambda x: jax.device_put(x, dev), (rlk, c1))

    x17 = jnp.concatenate([c1.c0, c1.c0, c1.c0[: M - L]], 0)[: L + M]

    stages = {
        "ntt_multi (L+M primes)": jax.jit(lambda x: ntt_multi(x, both)),
        "intt_multi": jax.jit(lambda x: intt_multi(x, both)),
        "base_extend Q->P": jax.jit(
            lambda x: R.fast_base_extend(x[:L], qs, ps)),
        "pointwise mulmod": jax.jit(lambda x: mulmod_v(
            x, x, _qvec(both, 3), barrett_muv(both, 3))),
        "relinearize": jax.jit(lambda c2: R.relinearize(
            param, rlk, c1.c0, c1.c1, c2)),
        "full mul": jax.jit(lambda: R.mul(param, rlk, c1, c1)),
    }
    for name, f in stages.items():
        try:
            if name in ("relinearize",):
                dt = timeit(f, c1.c0)
            elif name == "full mul":
                dt = timeit(f)
            else:
                dt = timeit(f, x17)
            print(f"{name:28s} {dt * 1e3:9.3f} ms")
        except Exception as e:
            print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
