"""Stage-by-stage error decomposition of the double-prime bootstrap."""
import os, sys, math, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.utils import prng

n, L = 32, 34
delta0 = 2.0 ** 23
K, r, deg = 7, 3, 30
delta_w = 2.0 ** 60
param = C.Param(n=n, L=L, delta=delta0)
ks = prng.split(jax.random.PRNGKey(0), 3)
sk, pk = C.new_key(ks[0], param)
rng = np.random.default_rng(1)
z = rng.uniform(-1, 1, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
ct = C.encrypt(ks[1], param, pk,
               C.encode(param, jnp.asarray(z.real), jnp.asarray(z.imag)))
ct1, _ = P.level_drop(param, ct, 1)
keys = B.BootstrapKeys(ks[2], param, sk)

raised = B.mod_raise(param, ct1)
t = np.asarray(C.decrypt_to_coeffs(param, sk, raised, crt_limbs=2))
print("t range:", t.min(), t.max(), " I max:", np.abs(np.round(t/param.qs[0])).max())

outs = B._stage_raise_c2s(param, keys, ct1, K, r, delta_w)
q0 = param.qs[0]
vmax = (2*math.pi*(K+0.5) + math.pi/2) / (1 << r)
a = 2*math.pi/(q0*(1 << r)*vmax); b = (-math.pi/2)/((1 << r)*vmax)
w_exact = a*t + b
for h, (c_, p_) in enumerate(outs):
    wco = np.asarray(C.decrypt_to_coeffs(p_, sk, c_))
    wr, wi = C.decode(p_, jnp.asarray(wco))
    got = np.asarray(wr)
    exp = w_exact[h*(n//2):(h+1)*(n//2)]
    e = np.abs(got - exp).max()
    print(f"C2S half{h}: w err {e:.3e} ({-np.log2(e):.1f} bits), imag "
          f"{np.abs(np.asarray(wi)).max():.3e}")

halves = []
for h, (c_, p_) in enumerate(outs):
    t0 = time.time()
    s_, ps_ = B._stage_evalmod(keys, c_, p_, K, r, deg, True, 3)
    halves.append((s_, ps_))
    sr, si = C.decode(ps_, C.decrypt_to_coeffs(ps_, sk, s_))
    got = np.asarray(sr)
    w = w_exact[h*(n//2):(h+1)*(n//2)]
    # plaintext-exact same pipeline
    y = w*w
    cos = sum((-1.0)**j * vmax**(2*j)/math.factorial(2*j) * y**j
              for j in range(deg//2+1))
    for _ in range(r):
        cos = 2*cos*cos - 1.0
    exp = cos + cos**3/6 + 3*cos**5/40
    e = np.abs(got - exp).max()
    print(f"EvalMod half{h}: err {e:.3e} ({-np.log2(e):.1f} bits) "
          f"[{time.time()-t0:.0f}s]  vs exact sin: "
          f"{np.abs(got - np.sin(2*np.pi*t[h*(n//2):(h+1)*(n//2)]/q0)).max():.3e}")

out, pout = B._stage_s2c(param, keys, halves, delta0, True)
rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out))
got = np.asarray(rr) + 1j*np.asarray(ri)
e = np.abs(got - z).max()
print(f"final: err {e:.3e} ({-np.log2(e):.1f} bits)")
