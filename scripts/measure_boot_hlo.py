"""Measure the serialized-HLO size of each CKKS-bootstrap stage jit at the
bench config (remote-compile 413 diagnosis: the relay buffers the whole
compile request, so any single stage whose module proto is too large fails
with HTTP 413 — BENCH_r02.json).  Runs fully on CPU; only lowers, never
compiles the big graphs.

usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/measure_boot_hlo.py [n_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from fhe_study_tpu.models.ckks import bootstrap as BB  # noqa: E402
from fhe_study_tpu.models.ckks import ckks_rns as C  # noqa: E402
from fhe_study_tpu.models.ckks import poly as P  # noqa: E402
from fhe_study_tpu.utils import prng  # noqa: E402


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    n = 1 << nlog
    B = int(os.environ.get("FHE_BENCH_B", 1))
    delta0 = 2.0 ** 45
    delta_w = 2.0 ** 60
    deg, arcsin_terms, base = 30, 3, 2
    h = 64
    K, r = BB.suggest_K_r(n, h)
    L = 28 + 2 * r
    print(f"n={n} L={L} K={K} r={r} B={B}", flush=True)
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
    t0 = time.time()
    sk, pk = C.new_key(ks[0], param, h=h)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, (B, n // 2))
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z), jnp.zeros_like(z)),
                   batch=(B,))
    ct1, _ = P.level_drop(param, ct, base)
    arrays, static, pout = BB.precompute_keys(
        ks[2], param, sk, delta0, batch=(B,), K=K, r=r, deg=deg,
        delta_w=delta_w, arcsin_terms=arcsin_terms, base_limbs=base)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(arrays))
    print(f"keys built in {time.time()-t0:.0f}s, arrays={nbytes/2**30:.2f} GiB",
          flush=True)

    run = BB.make_staged(param, static, delta0, K=K, r=r, deg=deg,
                         delta_w=delta_w, arcsin_terms=arcsin_terms,
                         base_limbs=base)
    j1, j2, j3 = run.jits
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), arrays)
    c0s = jax.ShapeDtypeStruct(ct1.c0.shape, ct1.c0.dtype)

    def report(name, lowered):
        proto = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
        print(f"{name}: hlo_proto={len(proto)/2**20:.1f} MiB", flush=True)

    t0 = time.time()
    o1 = jax.eval_shape(j1, specs, c0s, c0s)       # populates cell["p1"]
    report("j1 (ModRaise+C2S)", j1.lower(specs, c0s, c0s))
    print(f"  lower {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    o2 = jax.eval_shape(j2, specs, o1[0], o1[1])   # populates cell["p2"]
    report("j2 (EvalMod)", j2.lower(specs, o1[0], o1[1]))
    print(f"  lower {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    report("j3 (S2C)", j3.lower(specs, o2[0], o2[1], o2[0], o2[1]))
    print(f"  lower {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
