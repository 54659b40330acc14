"""Ad-hoc: high-precision (double-prime) CKKS bootstrap end-to-end check.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/check_boot_hp.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_enable_x64", True)

from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng

n, L = 32, 34
delta0 = 2.0 ** 23
param = C.Param(n=n, L=L, delta=delta0)
ks = prng.split(jax.random.PRNGKey(0), 3)
sk, pk = C.new_key(ks[0], param)
rng = np.random.default_rng(1)
z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
ct = C.encrypt(ks[1], param, pk,
               C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
ct1, p1 = P.level_drop(param, ct, 1)
keys = B.BootstrapKeys(ks[2], param, sk)
t0 = time.time()
out, pout = B.bootstrap(param, keys, ct1, delta0=delta0,
                        deg=30, arcsin_terms=3, delta_w=2.0 ** 60)
print(f"bootstrap eager: {time.time()-t0:.1f}s  pout.L={pout.L} "
      f"delta={pout.delta:.6g}")
rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out))
got = np.asarray(rr) + 1j * np.asarray(ri)
err = np.max(np.abs(got - z))
print(f"max slot err = {err:.3e}  ({-np.log2(err):.1f} bits)")
