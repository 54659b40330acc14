"""Execute the bench CKKS-bootstrap config end-to-end on CPU and report the
refreshed precision — discriminates a TPU-kernel bug from a pipeline /
parameter problem at production ring size (the e2e tests only cover n=32).

usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python scripts/check_boot_cpu.py [n_log2] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fhe_study_tpu.models.ckks import bootstrap as BB  # noqa: E402
from fhe_study_tpu.models.ckks import ckks_rns as C  # noqa: E402
from fhe_study_tpu.models.ckks import poly as P  # noqa: E402
from fhe_study_tpu.utils import prng  # noqa: E402


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n = 1 << nlog
    delta0 = float(os.environ.get("BOOT_DELTA0", 2.0 ** 45))
    delta_w = 2.0 ** 60
    deg = int(os.environ.get("BOOT_DEG", 30))
    arcsin_terms = int(os.environ.get("BOOT_ARCSIN", 3))
    base, h = 2, 64
    K, r = BB.suggest_K_r(n, h)
    K = int(os.environ.get("BOOT_K", K))
    r = int(os.environ.get("BOOT_R", r))
    L = int(os.environ.get("BOOT_L", 28 + 2 * r))
    print(f"n={n} L={L} K={K} r={r} B={B}", flush=True)
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
    sk, pk = C.new_key(ks[0], param, h=h)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, (B, n // 2))
    ct = C.encrypt(ks[1], param, pk,
                   C.encode(param, jnp.asarray(z), jnp.zeros_like(z)),
                   batch=(B,))
    ct1, _ = P.level_drop(param, ct, base)
    t0 = time.time()
    arrays, static, pout = BB.precompute_keys(
        ks[2], param, sk, delta0, batch=(B,), K=K, r=r, deg=deg,
        delta_w=delta_w, arcsin_terms=arcsin_terms, base_limbs=base)
    print(f"keys in {time.time()-t0:.0f}s", flush=True)
    run = BB.make_staged(param, static, delta0, K=K, r=r, deg=deg,
                         delta_w=delta_w, arcsin_terms=arcsin_terms,
                         base_limbs=base)
    t0 = time.time()
    out, pout2 = run(arrays, ct1.c0, ct1.c1)
    jax.block_until_ready(out.c0)
    print(f"bootstrap in {time.time()-t0:.0f}s", flush=True)
    rr, _ = C.decode(pout2, C.decrypt_to_coeffs(pout2, sk, out, crt_limbs=3))
    err = np.abs(np.asarray(rr) - z).max()
    print(f"max err = {err:.3e}  ({-np.log2(err):.1f} refreshed bits; "
          f"bench gate = 2^-20)", flush=True)


if __name__ == "__main__":
    main()
