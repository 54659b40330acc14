"""Per-stage timing of the CURRENT fused RNS-BFV multiply pipeline.

Times each stage of bfv_rns.mul as it actually runs (fused Pallas kernels),
chained + readback-forced, dtype/shape-stable.  Sections:
  A  tensor_mul4 over Q            (4 fwd NTT + 3 prod + 3 INTT, fused)
  B  tensor_mul4 over P (src=Q)    (ext prologue + 4 fwd + 3 prod + 3 INTT)
  C  base_extend_fused Q->P +sub   (w_q ext + (w_p - .)*Qinv epilogue)
  D  base_extend_fused P->Q cent.  (r_p -> out3)
  E  ks_fused relin core           (digits + L^2 fwd + contract + 2 INTT)
  F  u64 lift + final adds         (XLA epilogue of relinearize)
  G  mul full                      (the real thing)
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


# stand-in inputs, all u32 [L,4,B,n] (row i < q_i canonical)
x4 = jnp.stack([c1.c0, c1.c1, c2.c0, c2.c1], 1).astype(jnp.uint32)
xM3 = jnp.concatenate([c1.c0, c1.c0[:1]], 0)[:M, :, None, :].astype(jnp.uint32)
xM3 = jnp.broadcast_to(xM3 % jnp.asarray(
    np.array(ps, np.uint64)).astype(jnp.uint32).reshape(M, 1, 1, 1),
    (M, B, 3, n)) + jnp.uint32(0)          # [M,B,3,n] canonical mod p

null = timeit(jax.jit(lambda a: a + jnp.uint32(1)), x4)
print(f"null(x4 {x4.nbytes>>20} MB)        {null*1e3:8.3f} ms", flush=True)

Q = R._basis(qs).prod
qinv = tuple(pow(Q, -1, p) for p in ps)


def secA(a):
    o = ntt_mod.tensor_mul4(a[:, 0], a[:, 1], a[:, 2], a[:, 3], qs,
                            scale=(param.t,) * L)           # [L,B,3,n]
    o4 = jnp.concatenate([o, o[:, :, :1]], 2)
    return jnp.moveaxis(o4, 2, 1)


def secB(a):
    o = ntt_mod.tensor_mul4(a[:, 0], a[:, 1], a[:, 2], a[:, 3], ps,
                            scale=(param.t,) * M, src=qs)   # [M,B,3,n]
    o4 = jnp.concatenate([o[:L], o[:L, :, :1]], 2)
    return jnp.moveaxis(o4, 2, 1)


def secC(a):
    w_q = jnp.moveaxis(a[:, :3], 1, 2)                       # [L,B,3,n]
    w_p = xM3
    r_p = ext_pallas.base_extend_fused(w_q, qs, ps, w=w_p, sub_mul=qinv)
    o4 = jnp.concatenate([r_p[:L], r_p[:L, :, :1]], 2)
    return jnp.moveaxis(o4, 2, 1)


def secD(a):
    r_p = jnp.concatenate([a[:, :3], a[:1, :3]], 0)          # [M,4->3..]
    r_p = jnp.moveaxis(r_p[:, :3], 1, 2)                     # [M,B,3,n]
    out3 = R.fast_base_extend(r_p, ps, qs, centered=True)    # [L,B,3,n]
    o4 = jnp.concatenate([out3, out3[:, :, :1]], 2)
    return jnp.moveaxis(o4, 2, 1)


def secE(a):
    r0, r1 = ntt_mod.ks_fused_multi(a[:, 2], rlk.b, rlk.a, qs, qs)
    o4 = jnp.stack([r0, r1, r0, r1], 1)
    return o4


def secF(a):
    qv = ntt_mod._qvec(qs, 3)
    r0 = ntt_mod._addmod_v(a[:, 0].astype(jnp.uint64),
                           a[:, 1].astype(jnp.uint64), qv)
    r1 = ntt_mod._addmod_v(a[:, 2].astype(jnp.uint64),
                           a[:, 3].astype(jnp.uint64), qv)
    return jnp.stack([r0, r1, r0, r1], 1).astype(jnp.uint32)


def secG(a):
    o = R.mul(param, rlk, R.CT(a[:, 0], a[:, 1]), R.CT(a[:, 2], a[:, 3]))
    return jnp.stack([o.c0, o.c1, o.c0, o.c1], 1).astype(jnp.uint32)


cases = [("A tensor Q (fused)", secA), ("B tensor P+ext (fused)", secB),
         ("C ext wq->P +sub (fused)", secC), ("D ext rp->Q centered", secD),
         ("E relin ks_fused", secE), ("F u64 lift+adds", secF),
         ("G mul full", secG)]
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
