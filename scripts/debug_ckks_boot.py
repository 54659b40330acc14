"""Stage-time the CKKS bootstrap bench setup to find the 55-min sink."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp
from fhe_study_tpu.models.ckks import bootstrap as BB
from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng

n = int(os.environ.get("FHE_BENCH_N", 1 << 10))
L = int(os.environ.get("FHE_BENCH_L", 12))
B = int(os.environ.get("FHE_BENCH_B", 2))
delta0 = 2.0 ** 24
param = C.Param(n=n, L=L, delta=delta0)
ks = prng.split(jax.random.PRNGKey(0), 3)
cpu = jax.devices("cpu")[0]
T = time.perf_counter
with jax.default_device(cpu):
    t0 = T(); sk, pk = C.new_key(ks[0], param); print(f"keygen {T()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, (B, n // 2))
    t0 = T()
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z), jnp.zeros_like(z)),
                   batch=(B,))
    ct1, _ = P.level_drop(param, ct, 1)
    print(f"encrypt {T()-t0:.1f}s", flush=True)
    t0 = T(); keys = BB.BootstrapKeys(ks[2], param, sk); print(f"BootstrapKeys {T()-t0:.1f}s", flush=True)
    cell = {}
    def _shape_probe(c0, c1):
        out, po = BB.bootstrap(param, keys, BB.ckks_rns.CT(c0, c1), delta0=delta0)
        cell["pout"] = po
        return out.c0, out.c1
    t0 = T(); jax.eval_shape(_shape_probe, ct1.c0, ct1.c1); print(f"eval_shape {T()-t0:.1f}s", flush=True)
    pout = cell["pout"]
    t0 = T(); arrays, static = BB.freeze(keys); print(f"freeze {T()-t0:.1f}s", flush=True)
dev = jax.devices()[0]
t0 = T()
arrays, ct1 = jax.tree.map(lambda x: jax.device_put(x, dev), (arrays, ct1))
print(f"device_put {T()-t0:.1f}s", flush=True)

def _step(c0, c1, arr):
    fk = BB.FrozenKeys(arr, static)
    out, po = BB.bootstrap(param, fk, C.CT(c0, c1), delta0=delta0)
    nxt, _ = P.level_drop(po, out, 1)
    return out.c0, out.c1, nxt.c0, nxt.c1

step = jax.jit(_step)
t0 = T(); res = step(ct1.c0, ct1.c1, arrays); jax.block_until_ready(res)
print(f"compile+first {T()-t0:.1f}s", flush=True)
t0 = T()
cur = (ct1.c0, ct1.c1)
for _ in range(3):
    out_t = step(cur[0], cur[1], arrays)
    cur = (out_t[2], out_t[3])
jax.block_until_ready(out_t)
print(f"3 iters {T()-t0:.3f}s -> {3*B/(T()-t0):.2f} bootstraps/s", flush=True)
with jax.default_device(cpu):
    out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), res[:2])
    rr, _ = C.decode(pout, C.decrypt_to_coeffs(pout, sk, C.CT(*out_cpu)))
print("max err:", float(np.max(np.abs(np.asarray(rr) - z))), flush=True)
