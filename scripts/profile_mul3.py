"""Fine-grained, chain-stable stage timing of the RNS-BFV multiply.

Every case is shape- AND dtype-stable under f(f(x)) so the chained timing
loop never retraces (a retrace = ~12 s remote compile inside the window).
Sections mirror bfv_rns._tensor/relinearize internals; glue (casts, stacks)
is timed where it lives so the per-stage sum can be compared to `mul full`.
"""
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
    c2 = R.encrypt(ks[5], param, pk, m1, batch=(B,))
dev = jax.devices()[0]
rlk, c1, c2 = jax.tree.map(lambda x: jax.device_put(x, dev), (rlk, c1, c2))
probe = jax.jit(lambda y: jnp.sum(
    (y[0] if isinstance(y, (tuple, list)) else y).reshape(-1)[:64]
    .astype(jnp.uint32)))


def timeit(f, x, iters=6):
    y = f(x); float(probe(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = f(y if not isinstance(y, (tuple, list)) else y[0])
    float(probe(y))
    return (time.perf_counter() - t0) / iters


x94 = jnp.stack([c1.c0, c1.c1, c2.c0, c2.c1], 1).astype(jnp.uint32)  # [L,4,B,n]
xL64 = c1.c0                                                          # [L,B,n]
null = timeit(jax.jit(lambda a: a + jnp.uint32(1)), x94)
print(f"null(x94) {null*1e3:.3f} ms", flush=True)

qv32, nqv32, r2v32 = (jnp.asarray(c) for c in modops32.consts(both, 3))


def _sec1_extend_ntt(a):
    """[L,4,B,n] u32 -> eval over Q∪P, cropped back to input shape."""
    ext4 = jnp.concatenate([a, R.fast_base_extend(a, qs, ps)], axis=0)
    e4 = ntt_multi(ext4, both)
    return e4[:L]


def _sec2_products(a):
    """pointwise tensor products from a stacked eval grid (incl. to_mont
    of the y half), cropped/padded back to [L,4,B,n]."""
    e9 = jnp.concatenate([a, a, a[:1]], 0)          # stand-in [9,4,B,n]
    ex0, ex1, ey0, ey1 = (e9[:, i] for i in range(4))
    ey0m = modops32.to_mont(ey0, qv32, nqv32, r2v32)
    ey1m = modops32.to_mont(ey1, qv32, nqv32, r2v32)
    prods = jnp.stack([
        modops32.mont_mul(ex0, ey0m, qv32, nqv32),
        modops32.addmod(modops32.mont_mul(ex0, ey1m, qv32, nqv32),
                        modops32.mont_mul(ex1, ey0m, qv32, nqv32), qv32),
        modops32.mont_mul(ex1, ey1m, qv32, nqv32)], axis=1)   # [9,3,B,n]
    return jnp.concatenate([prods[:L], prods[:L, :1]], 1)


def _sec3_intt(a):
    p9 = jnp.concatenate([a[:, :3], a[:, :3], a[:1, :3]], 0)  # [9,3,B,n]
    d = intt_multi(p9, both)
    return jnp.concatenate([d[:L], d[:L, :1]], 1)


Q = R._basis(qs).prod
mont = lambda v, q: (int(v % q) << 32) % q  # noqa: E731
tqm = jnp.asarray(np.array([mont(param.t, q) for q in qs], np.uint32))
tpm = jnp.asarray(np.array([mont(param.t, p) for p in ps], np.uint32))
qinvm = jnp.asarray(np.array([mont(pow(Q, -1, p), p) for p in ps], np.uint32))
qv32q, nq32q, _ = (jnp.asarray(c) for c in modops32.consts(qs, 3))
pv32, nq32p, _ = (jnp.asarray(c) for c in modops32.consts(ps, 3))


def _sec4_scale(a):
    """t/Q scaling incl. the two base extensions, from a [L,4,B,n] coeff
    stand-in (uses 3 of the 4 mid slots as d0,d1,d2)."""
    dq = a[:, :3]
    dp = jnp.concatenate([a[:, :3], a[:1, :3]], 0)[:M]
    w_q = modops32.mont_mul(dq, tqm.reshape(qv32q.shape)[:, None], qv32q[:, None], nq32q[:, None])
    w_p = modops32.mont_mul(dp, tpm.reshape(pv32.shape)[:, None], pv32[:, None], nq32p[:, None])
    wq_in_p = R.fast_base_extend(w_q, qs, ps)
    r_p = modops32.mont_mul(modops32.submod(w_p, wq_in_p, pv32[:, None]),
                            qinvm.reshape(pv32.shape)[:, None], pv32[:, None], nq32p[:, None])
    out3 = R.fast_base_extend(r_p, ps, qs, centered=True)
    return jnp.concatenate([out3, out3[:, :1]], 1).astype(a.dtype)


def _sec5_relin(a):
    out = R.relinearize(param, rlk, a[:, 0].astype(jnp.uint64),
                        a[:, 1].astype(jnp.uint64), a[:, 2].astype(jnp.uint64))
    o = jnp.stack([out.c0, out.c1], 1).astype(a.dtype)
    return jnp.concatenate([o, a[:, 2:]], 1)


cases = {
  "sec1 extend+fwd-ntt": (jax.jit(_sec1_extend_ntt), x94),
  "sec2 to_mont+products": (jax.jit(_sec2_products), x94),
  "sec3 intt": (jax.jit(_sec3_intt), x94),
  "sec4 t/Q scale+2ext": (jax.jit(_sec4_scale), x94),
  "sec5 relin(+casts)": (jax.jit(_sec5_relin), x94),
  "mul full": (jax.jit(
      lambda a: R.mul(param, rlk, R.CT(a, a ^ jnp.uint64(1)), c2).c0), xL64),
}
for name, (f, x) in cases.items():
    try:
        dt = timeit(f, x) - null
        print(f"{name:26s} {dt*1e3:8.3f} ms (net)", flush=True)
    except Exception as e:
        print(f"{name:26s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
