"""Per-STAGE precision probe of the CKKS bootstrap at the bench config:
decrypts after C2S (w accuracy) and after EvalMod (sin accuracy) against
exact ground truth derived from the secret key — localizes which stage
loses the refreshed bits at production ring size.

usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python scripts/check_boot_stages.py [n_log2]
"""

import math
import os
import sys

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
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    n = 1 << nlog
    B = 1
    delta0, delta_w = 2.0 ** 45, 2.0 ** 60
    deg = int(os.environ.get("BOOT_DEG", 30))
    arcsin_terms = int(os.environ.get("BOOT_ARCSIN", 3))
    base, h = 2, 64
    K, r = BB.suggest_K_r(n, h)
    K = int(os.environ.get("BOOT_K", K))
    r = int(os.environ.get("BOOT_R", r))
    L = int(os.environ.get("BOOT_L", 28 + 2 * r))
    print(f"n={n} L={L} K={K} r={r}", flush=True)
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
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
    run = BB.make_staged(param, static, delta0, K=K, r=r, deg=deg,
                         delta_w=delta_w, arcsin_terms=arcsin_terms,
                         base_limbs=base)
    j1, j2, j3 = run.jits

    # ground truth: raw raised phase t (exact to f64 ~2^10 abs at 2^63)
    qs = param.qs
    Q0 = qs[0] * qs[1]
    raised = BB.mod_raise2(param, ct1)
    p_unit = C.Param(n=n, L=L, delta=1.0)
    t_true = np.asarray(C.decrypt_to_coeffs(p_unit, sk, raised,
                                            crt_limbs=3))[0]
    vmax = (2 * math.pi * (K + 0.5) + math.pi / 2) / (1 << r)
    w_true = (2 * math.pi * t_true / Q0 - math.pi / 2) / ((1 << r) * vmax)
    print(f"|I| max = {np.max(np.abs(np.round(t_true / Q0))):.0f} (K={K})",
          flush=True)

    a0, a1, b0, b1 = j1(arrays, ct1.c0, ct1.c1)
    p1 = C.Param(n=n, L=L - 2, delta=delta_w)
    # half 1 slots hold w for coeffs [0, n/2), half 2 for [n/2, n)
    w1 = np.asarray(C.decode(p1, C.decrypt_to_coeffs(p1, sk, C.CT(a0, a1),
                                                     crt_limbs=3))[0])[0]
    w2 = np.asarray(C.decode(p1, C.decrypt_to_coeffs(p1, sk, C.CT(b0, b1),
                                                     crt_limbs=3))[0])[0]
    w_got = np.concatenate([w1, w2])
    e_c2s = np.abs(w_got - w_true).max()
    print(f"C2S:     max |w err| = {e_c2s:.3e} ({-np.log2(e_c2s):.1f} bits)",
          flush=True)

    s_true = np.sin(((1 << r) * vmax) * w_true + math.pi / 2)  # sin(2pi t/Q0)
    o1 = j2(arrays, a0, a1)
    o2 = j2(arrays, b0, b1)
    # EvalMod output scale: run's cell p2 — reconstruct by probing j3's pout
    # via one full run (cheap second pass reuses compiled stages)
    out, pout2 = run(arrays, ct1.c0, ct1.c1)
    p2 = C.Param(n=n, L=o1[0].shape[0], delta=run.p2_delta) \
        if hasattr(run, "p2_delta") else None
    # fall back: compare RELATIVE shape via the final output instead
    rr, _ = C.decode(pout2, C.decrypt_to_coeffs(pout2, sk, out, crt_limbs=3))
    e_final = np.abs(np.asarray(rr)[0] - z[0]).max()
    print(f"final:   max err = {e_final:.3e} ({-np.log2(e_final):.1f} bits)",
          flush=True)
    # EvalMod check using the p2 param captured by the run closure
    import fhe_study_tpu.models.ckks.bootstrap as _bb
    # (cell isn't exposed; decrypt EvalMod halves at the level the arrays say)
    Lm = int(o1[0].shape[0])
    # delta after EvalMod: the ladder keeps ~delta_w (poly bookkeeping);
    # measure empirically by matching medians
    pm = C.Param(n=n, L=Lm, delta=delta_w)
    m1 = np.asarray(C.decode(pm, C.decrypt_to_coeffs(pm, sk,
                                                     C.CT(*o1), crt_limbs=3))[0])[0]
    m2 = np.asarray(C.decode(pm, C.decrypt_to_coeffs(pm, sk,
                                                     C.CT(*o2), crt_limbs=3))[0])[0]
    m_got = np.concatenate([m1, m2])
    # scale-calibrate (delta after ladder may differ from delta_w by exact
    # bookkeeping): fit single factor
    denom = float(np.dot(m_got, m_got)) or 1.0
    c = float(np.dot(s_true, m_got) / denom)
    e_mod = np.abs(c * m_got - s_true).max()
    print(f"EvalMod: max |sin err| = {e_mod:.3e} ({-np.log2(e_mod):.1f} "
          f"bits; scale fit {c:.3e})", flush=True)


if __name__ == "__main__":
    main()
