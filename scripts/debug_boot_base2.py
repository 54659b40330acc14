"""Stage-by-stage debug of the double-base (base_limbs=2) bootstrap."""
import os, sys, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng

n, L = 32, 34
delta0 = 2.0 ** 45
K, r, deg = 7, 3, 30
delta_w = 2.0 ** 60
param = C.Param(n=n, L=L, delta=delta0)
ks = prng.split(jax.random.PRNGKey(0), 3)
sk, pk = C.new_key(ks[0], param)
rng = np.random.default_rng(1)
z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
ct = C.encrypt(ks[1], param, pk,
               C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
ct1, _ = P.level_drop(param, ct, 2)
keys = B.BootstrapKeys(ks[2], param, sk)

qs = param.qs
Q0 = qs[0] * qs[1]

# ground truth t: decrypt the RAISED ct exactly (phase over full basis)
raised = B.mod_raise2(param, ct1)
t_f = np.asarray(C.decrypt_to_coeffs(param, sk, raised, crt_limbs=3))
print(f"|t|max = 2^{math.log2(np.abs(t_f).max()):.1f}  (K*Q0 = 2^"
      f"{math.log2(K * Q0):.1f})", flush=True)
I_f = np.round((t_f - np.asarray(
    C.decrypt_to_coeffs(C.Param(n=n, L=2, delta=delta0), sk, ct1,
                        crt_limbs=2))) / Q0)
print("max |I| =", np.abs(I_f).max(), flush=True)

vmax = (2 * math.pi * (K + 0.5) + math.pi / 2) / (1 << r)
a = 2 * math.pi / (Q0 * (1 << r) * vmax)
b = (-math.pi / 2) / ((1 << r) * vmax)

outs = B._stage_raise_c2s(param, keys, ct1, K, r, delta_w, base_limbs=2)
(s1, p1), (s2, p2) = outs
print("post-C2S L:", p1.L, " delta: 2^%.1f" % math.log2(p1.delta), flush=True)
s1r, s1i = C.decode(p1, C.decrypt_to_coeffs(p1, sk, s1, crt_limbs=3))
s2r, s2i = C.decode(p2, C.decrypt_to_coeffs(p2, sk, s2, crt_limbs=3))
w1 = np.asarray(s1r) + 1j * np.asarray(s1i)
w2 = np.asarray(s2r) + 1j * np.asarray(s2i)
exp1 = a * t_f[: n // 2] + b
exp2 = a * t_f[n // 2:] + b
print(f"C2S half1 err: {np.abs(w1 - exp1).max():.3e}  (|w| up to "
      f"{np.abs(exp1).max():.3f})", flush=True)
print(f"C2S half2 err: {np.abs(w2 - exp2).max():.3e}", flush=True)

halves = [B._stage_evalmod(keys, c_, p_, K, r, deg, True, 3)
          for c_, p_ in outs]
(e1, q1_), (e2, q2_) = halves
v1r, v1i = C.decode(q1_, C.decrypt_to_coeffs(q1_, sk, e1, crt_limbs=3))
v1 = np.asarray(v1r) + 1j * np.asarray(v1i)
exp_sin1 = np.arcsin(np.sin(2 * np.pi * t_f[: n // 2] / Q0)) \
    if False else np.sin(2 * np.pi * t_f[: n // 2] / Q0)
# EvalMod target: arcsin(sin(2pi t/Q0)) ~ 2pi (t mod Q0)/Q0
exp_mod1 = 2 * np.pi * (t_f[: n // 2] - Q0 * np.round(t_f[: n // 2] / Q0)) / Q0
print(f"EvalMod half1 err vs 2pi m/Q0: {np.abs(v1 - exp_mod1).max():.3e} "
      f"(signal {np.abs(exp_mod1).max():.3e})", flush=True)

out, pout = B._stage_s2c(param, keys, halves, delta0, True, None,
                         base_limbs=2)
print("pout: L=%d delta=2^%.2f" % (pout.L, math.log2(pout.delta)), flush=True)
rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out, crt_limbs=3))
got = np.asarray(rr) + 1j * np.asarray(ri)
err = np.abs(got - z).max()
print(f"end-to-end: {-math.log2(err):.1f} bits (err {err:.3e})", flush=True)
