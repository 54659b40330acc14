"""Sweep batch-block sizes of the eval-resident mul kernels on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt_pallas as NP
from fhe_study_tpu.ops import ext_pallas as EP
from fhe_study_tpu.ops.primes import ntt_primes

n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
L, M, B = 4, 5, 64
ITERS = 6
qs = ntt_primes(L + M, 30, 1 << 16)[:L]
ps = ntt_primes(L + M, 30, 1 << 16)[L:L + M]
rng = np.random.default_rng(0)
cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
mk = lambda shape, pr: jax.device_put(jnp.asarray(np.stack(
    [rng.integers(0, q, shape).astype(np.uint32) for q in pr])), dev)
xq = [mk((B, n), qs) for _ in range(4)]
cQ = jax.device_put(jnp.asarray(np.stack(
    [rng.integers(0, q, (B, n)).astype(np.uint32) for q in qs])), dev)
adds = [mk((B, n), qs)[:, :, :] for _ in range(2)]
kb = mk((L, n), qs).transpose(1, 0, 2)   # [R=L, Lp=L, n]
ka = mk((L, n), qs).transpose(1, 0, 2)
x2 = mk((B, 2, n), qs)                   # [L,B,2,n] coeff for ext_ntt

probe = jax.jit(lambda y: jnp.sum((y[0] if isinstance(y, tuple) else y
                                   ).reshape(-1)[:64].astype(jnp.uint32)))


def timeit(f, *args):
    y = f(*args); float(probe(y))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(probe(y))
    return (time.perf_counter() - t0) / ITERS


print("== tensor_eval4_u32 (A/B)")
for bb in (2, 4, 8):
    try:
        f = jax.jit(lambda *a, _b=bb: NP.tensor_eval4_u32(
            *a, tuple(qs), scale=(256,) * L, bb_override=_b))
        print(f"  bb={bb}: {timeit(f, *xq)*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"  bb={bb}: FAIL {str(e)[:150]}", flush=True)

print("== ks_fused_eval_u32 (E)")
for bb in (2, 4, 8):
    try:
        f = jax.jit(lambda c, b_, a_, a0, a1, _b=bb: NP.ks_fused_eval_u32(
            c, b_, a_, tuple(qs), tuple(qs), (a0, a1), bb_override=_b))
        print(f"  bb={bb}: {timeit(f, cQ, kb, ka, *adds)*1e3:7.3f} ms",
              flush=True)
    except Exception as e:
        print(f"  bb={bb}: FAIL {str(e)[:150]}", flush=True)

print("== ext_ntt_u32 (F)")
for bb in (2, 4, 8, 16):
    try:
        f = jax.jit(lambda x, _b=bb: NP.ext_ntt_u32(
            x, tuple(qs), tuple(ps), bb_override=_b))
        print(f"  bb={bb}: {timeit(f, x2)*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"  bb={bb}: FAIL {str(e)[:150]}", flush=True)

print("== base_extend_fused (C/D), new LANE_TILE", EP.LANE_TILE)
w3 = mk((B, 3, n), qs)                   # [L,B,3,n]
wP = mk((B, 3, n), ps)
Q = 1
for q in qs:
    Q *= q
qinv = tuple(pow(Q, -1, p) for p in ps)
f = jax.jit(lambda x, w: EP.base_extend_fused(x, tuple(qs), tuple(ps),
                                              w=w, sub_mul=qinv))
print(f"  C (Q->P +sub): {timeit(f, w3, wP)*1e3:7.3f} ms", flush=True)
g = jax.jit(lambda x: EP.base_extend_fused(x, tuple(ps), tuple(qs),
                                           centered=True))
print(f"  D (P->Q cent): {timeit(g, wP)*1e3:7.3f} ms", flush=True)
