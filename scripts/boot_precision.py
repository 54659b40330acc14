"""Measure end-to-end refreshed precision of the CKKS bootstrap.

Knobs: BOOT_N, BOOT_L, BOOT_DELTA0 (log2), BOOT_DEG, BOOT_R, BOOT_K,
BOOT_ARCSIN, BOOT_DROPS, BOOT_DW (log2 delta_w).  Prints refreshed bits
(-log2 of max slot error vs the original message) and the output scale.
"""
import os, sys, math, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng

base_limbs = int(os.environ.get("BOOT_BASE", 1))
h = os.environ.get("BOOT_H")
h = None if h is None else int(h)
n = int(os.environ.get("BOOT_N", 32))
L = int(os.environ.get("BOOT_L", 34))
delta0 = 2.0 ** float(os.environ.get("BOOT_DELTA0",
                                     24 if base_limbs == 1 else 45))
deg = int(os.environ.get("BOOT_DEG", 30))
from fhe_study_tpu.models.ckks import bootstrap as _B
K_auto, r_auto = _B.suggest_K_r(n, h)
r = int(os.environ.get("BOOT_R", r_auto))
K = int(os.environ.get("BOOT_K", K_auto))
print(f"K={K} r={r} h={h}", flush=True)
arcsin_terms = int(os.environ.get("BOOT_ARCSIN", 3))
drops = os.environ.get("BOOT_DROPS")
drops = None if drops is None else int(drops)
delta_w = 2.0 ** float(os.environ.get("BOOT_DW", 60))

param = C.Param(n=n, L=L, delta=delta0)
ks = prng.split(jax.random.PRNGKey(0), 3)
t0 = time.time()
sk, pk = C.new_key(ks[0], param, h=h)
rng = np.random.default_rng(1)
z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
ct = C.encrypt(ks[1], param, pk,
               C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
ct1, _ = P.level_drop(param, ct, base_limbs)
print(f"setup {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
arrays, static, pout = B.precompute_keys(
    ks[2], param, sk, delta0, K=K, r=r, deg=deg, delta_w=delta_w,
    arcsin_terms=arcsin_terms, s2c_drops=drops, base_limbs=base_limbs)
print(f"keys {time.time()-t0:.1f}s  (sk-free pytree: "
      f"{sum(x.nbytes for x in jax.tree.leaves(arrays))>>20} MB)", flush=True)

t0 = time.time()
run = B.make_staged(param, static, delta0, K=K, r=r, deg=deg,
                    delta_w=delta_w, arcsin_terms=arcsin_terms,
                    s2c_drops=drops, base_limbs=base_limbs)
out, pout2 = run(arrays, ct1.c0, ct1.c1)
jax.block_until_ready(out.c0)
print(f"bootstrap {time.time()-t0:.1f}s  pout: L={pout2.L} "
      f"delta=2^{math.log2(pout2.delta):.2f}", flush=True)
assert pout2.L == pout.L and pout2.delta == pout.delta

rr, ri = C.decode(pout2, C.decrypt_to_coeffs(pout2, sk, out, crt_limbs=3))
got = np.asarray(rr) + 1j * np.asarray(ri)
err = np.abs(got - z).max()
print(f"refreshed bits: {-math.log2(err):.1f}  (max err {err:.3e})",
      flush=True)
