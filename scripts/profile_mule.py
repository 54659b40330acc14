"""Per-stage timing of the EVAL-RESIDENT RNS-BFV multiply (bfv_rns.mul_e).

Stages (see models/bfv_rns.py mul_e):
  A  tensor_eval4 over Q     (3 prods + 3L INTT, fused)
  B  tensor_eval4 over P     (3 prods + 3M INTT, fused)
  C  base_extend_fused Q->P  (w_q ext + (w_p - .)*Qinv epilogue)
  D  fast_base_extend P->Q   (centered, r_p -> out3)
  E  ks_fused_eval relin     (digits + (L^2+2L) fwd + contract + 2L INTT)
  F  ext_ntt Q->P re-entry   (ext prologue + 2M fwd, fused)
  G  mul_e full              (the real thing)
Prints ms per call at the bench shape and the A..F sum vs G.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.models import bfv_rns as R
from fhe_study_tpu.ops import ntt as ntt_mod
from fhe_study_tpu.ops import ext_pallas
from fhe_study_tpu.utils import prng

n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
L = int(os.environ.get("FHE_BENCH_L", 4))
M = int(os.environ.get("FHE_BENCH_M", 5))
B = int(os.environ.get("FHE_BENCH_B", 64))
ITERS = int(os.environ.get("FHE_BENCH_ITERS", 6))
param = R.RnsParam(n=n, t=256, L=L, M=M)
qs, ps = param.qs, param.ps
ks = prng.split(jax.random.PRNGKey(0), 6)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    sk, pk = R.new_key(ks[0], param)
    rlk = R.rlk_key(ks[1], param, sk)
    m1 = prng.uniform_mod(ks[2], (B, n), param.t)
    c1 = R.encrypt(ks[4], param, pk, m1, batch=(B,))
    c2 = R.encrypt(ks[5], param, pk, m1, batch=(B,))
dev = jax.devices()[0]
rlk, c1, c2 = jax.tree.map(lambda x: jax.device_put(x, dev), (rlk, c1, c2))
probe = jax.jit(lambda y: jnp.sum(
    (y[0] if isinstance(y, (tuple, list)) else y).reshape(-1)[:64]
    .astype(jnp.uint32)))


def timeit(f, x, iters=ITERS):
    y = f(x); float(probe(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y)
    float(probe(y))
    return (time.perf_counter() - t0) / iters


# carrier: u32 [L,4,B,n] eval-domain rows over Q (row i < q_i canonical);
# every stage maps carrier -> carrier so chains stay shape/dtype-stable
with jax.default_device(cpu):
    e1 = R.to_evals(param, c1)
    e2 = R.to_evals(param, c2)
e1, e2 = jax.tree.map(lambda x: jax.device_put(x, dev), (e1, e2))
x4 = jnp.stack([e1.e0q, e1.e1q, e2.e0q, e2.e1q], 1).astype(jnp.uint32)
xP = jnp.stack([e1.e0p, e1.e1p, e2.e0p, e2.e1p], 1).astype(jnp.uint32)
xP = jax.device_put(xP, dev)

null = timeit(jax.jit(lambda a: a + jnp.uint32(1)), x4)
print(f"null(x4 {x4.nbytes>>20} MB)        {null*1e3:8.3f} ms", flush=True)

Q = R._basis(qs).prod
qinv = tuple(pow(Q, -1, p) for p in ps)


def pad_to4(o, src_parts):
    # [K,B,3,n] -> carrier [L,4,B,n]
    o4 = jnp.concatenate([o[:L], o[:L, :, :1]], 2)
    return jnp.moveaxis(o4, 2, 1)


def secA(a):
    o = ntt_mod.tensor_eval4(a[:, 0], a[:, 1], a[:, 2], a[:, 3], qs,
                             scale=(param.t,) * L)          # [L,B,3,n]
    return pad_to4(o, a)


def secB(a):
    o = ntt_mod.tensor_eval4(xP[:, 0], xP[:, 1], xP[:, 2], xP[:, 3], ps,
                             scale=(param.t,) * M)          # [M,B,3,n]
    return pad_to4(o, a) + (a[:, :1, :1, :1] & jnp.uint32(1))


def secC(a):
    w_q = jnp.moveaxis(a[:, :3], 1, 2)                      # [L,B,3,n]
    w_p = jnp.moveaxis(jnp.concatenate(
        [xP[:, :3], xP[:1, :3]], 0)[:M, :3], 1, 2) % jnp.uint32(3)
    w_p = w_p + jnp.uint32(1)
    r_p = ext_pallas.base_extend_fused(w_q, qs, ps, w=w_p, sub_mul=qinv)
    return pad_to4(r_p, a)


def secD(a):
    r_p = jnp.concatenate([a[:, :3], a[:1, :3]], 0)[:M]
    r_p = jnp.moveaxis(r_p, 1, 2)                           # [M,B,3,n]
    out3 = R.fast_base_extend(r_p, ps, qs, centered=True)   # [L,B,3,n]
    return pad_to4(out3, a).astype(jnp.uint32)


def secE(a):
    e0, e1_, r0, r1 = ntt_mod.ks_fused_eval(
        a[:, 2], rlk.b, rlk.a, qs, qs, adds=(a[:, 0], a[:, 1]))
    return jnp.stack([e0, e1_, r0.astype(jnp.uint32),
                      r1.astype(jnp.uint32)], 1)


def secF(a):
    ep = ntt_mod.ext_ntt(jnp.stack([a[:, 0], a[:, 1]], axis=-2), qs, ps)
    return pad_to4(jnp.concatenate([ep, ep[..., :1, :]], -2), a)


def secG(a):
    o = R.mul_e(param, rlk, R.CTE(a[:, 0], a[:, 1], xP[:, 0], xP[:, 1]),
                R.CTE(a[:, 2], a[:, 3], xP[:, 2], xP[:, 3]))
    return jnp.stack([o.e0q, o.e1q, o.e0q, o.e1q], 1)


cases = [("A tensor_eval4 Q", secA), ("B tensor_eval4 P", secB),
         ("C ext wq->P +sub (fused)", secC), ("D ext rp->Q centered", secD),
         ("E relin ks_fused_eval", secE), ("F ext_ntt Q->P re-entry", secF),
         ("G mul_e full", secG)]
tot = 0.0
for name, f in cases:
    try:
        dt = timeit(jax.jit(f), x4) - null
        if not name.startswith("G"):
            tot += dt
        print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print(f"{'sum A..F':28s} {tot*1e3:8.3f} ms", flush=True)
print(f"per ct-mul at sum: {B / tot:.0f}/s" if tot else "", flush=True)
