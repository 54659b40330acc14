"""Chained, readback-forced stage timing of the RNS-BFV multiply."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("FHE_USE_PALLAS_NTT", "1")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.ops.ntt import ntt_multi, intt_multi
from fhe_study_tpu.ops import modops32
from fhe_study_tpu.utils import prng

n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
L = int(os.environ.get("FHE_BENCH_L", 4))
M = int(os.environ.get("FHE_BENCH_M", 5))
B = int(os.environ.get("FHE_BENCH_B", 64))
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
probe = jax.jit(lambda y: jnp.sum((y[0] if isinstance(y, (tuple, list)) else y).reshape(-1)[:64].astype(jnp.uint32)))

def timeit(f, x, iters=6):
    y = f(x); float(probe(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y if not isinstance(y, (tuple, list)) else y[0])
    float(probe(y))
    return (time.perf_counter() - t0) / iters

# NB every case below must be SHAPE- AND DTYPE-STABLE under chaining
# (f(f(x)) traces once): a mid-loop retrace costs a ~12 s remote compile
# inside the timing window and poisons the average.
x9 = jnp.concatenate([c1.c0, c1.c0, c1.c0[:1]], 0).astype(jnp.uint32)  # [9,B,n]
x94 = jnp.stack([x9, x9, x9, x9], 1)                                   # [9,4,B,n]
xL64 = c1.c0                                                           # [L,B,n] u64
null = timeit(jax.jit(lambda a: a + jnp.uint32(1)), x9)
print(f"null {null*1e3:.3f}", flush=True)


def _chain_ext(a):
    out = R.fast_base_extend(a[:L], qs, ps)            # [M,4,B,n]
    return jnp.concatenate([out[:L].astype(a.dtype), a[L:]], 0)


cases = {
  "fwd ntt [9,4,B,n]": (jax.jit(lambda a: ntt_multi(a, both)), x94),
  "inv ntt [9,4,B,n]": (jax.jit(lambda a: intt_multi(a, both)), x94),
  "base_extend 4->5 [L,4,B,n]": (jax.jit(_chain_ext), x94),
  "mul full": (jax.jit(
      lambda a: R.mul(param, rlk, R.CT(a, a), c1).c0), xL64),
  "relinearize": (jax.jit(
      lambda a: R.relinearize(param, rlk, a, a, a).c0), xL64),
}
for name, (f, x) in cases.items():
    try:
        dt = timeit(f, x) - null
        print(f"{name:28s} {dt*1e3:8.3f} ms (net)", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
