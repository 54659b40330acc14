"""Isolate the S2C-stage noise of the double-prime bootstrap."""
import os, sys, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from fhe_study_tpu.models.ckks import ckks_rns as C
from fhe_study_tpu.models.ckks import bootstrap as B
from fhe_study_tpu.models.ckks import poly as P
from fhe_study_tpu.models.ckks import eval as ev
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
outs = B._stage_raise_c2s(param, keys, ct1, K, r, delta_w)
halves = [B._stage_evalmod(keys, c_, p_, K, r, deg, True, 3) for c_, p_ in outs]

(s1, p1), (s2, p2) = halves
print("p1.delta", p1.delta, "p2.delta", p2.delta, "L", p1.L, p2.L)
# decrypted half slots (ground truth for the S2C input)
s1r, s1i = C.decode(p1, C.decrypt_to_coeffs(p1, sk, s1))
s2r, s2i = C.decode(p2, C.decrypt_to_coeffs(p2, sk, s2))
s1v = np.asarray(s1r) + 1j*np.asarray(s1i)
s2v = np.asarray(s2r) + 1j*np.asarray(s2i)

q0 = param.qs[0]
D1, D2 = ev._s2c_matrices(n)
fold = q0 / (2*math.pi)
exp_slots = (D1*fold) @ s1v + (D2*fold) @ s2v   # value-domain expectation

Lm = min(p1.L, p2.L)
s1d, p1d = P.level_drop(p1, s1, Lm)
s2d, p2d = P.level_drop(p2, s2, Lm)
rk = keys.rotkeys()
for tag, D in (("s2cA", D1), ("s2cB", D2)):
    keys._plans[(tag, Lm)] = ev.build_rmap_plan(
        C.Param(n=n, L=Lm, delta=1.0, prime_bits=param.prime_bits),
        [(D*fold, None)])
(c1,), pf = ev.apply_rmap_plan(p1d, rk, s1d, keys._plans[("s2cA", Lm)])
(c2,), _ = ev.apply_rmap_plan(p2d, rk, s2d, keys._plans[("s2cB", Lm)])
outp = C.add(pf, c1, c2)
# decrypt pre-rescale: phase = pf.delta * exp_slots (coeff domain packing)
co = np.asarray(C.decrypt_to_coeffs(pf, sk, outp, crt_limbs=3))
# expected coefficients: slots exp_slots packed -> coeffs = decode at delta=1?
# S2C output poly p has slots(p) = exp_slots; compare slot-domain instead
pr, pi = C.decode(pf, jnp.asarray(co))
got = (np.asarray(pr) + 1j*np.asarray(pi))
err = np.abs(got - exp_slots).max() / delta0
print(f"S2C matvec err (pre-rescale, rel delta0): {err:.3e} "
      f"({-np.log2(err):.1f} bits)")
# per-half
for tag, cc, sv, D in (("A", c1, s1v, D1), ("B", c2, s2v, D2)):
    co = np.asarray(C.decrypt_to_coeffs(pf, sk, cc, crt_limbs=3))
    pr, pi = C.decode(pf, jnp.asarray(co))
    g = np.asarray(pr) + 1j*np.asarray(pi)
    e = np.abs(g - (D*fold) @ sv).max() / delta0
    print(f"  half {tag}: {e:.3e} ({-np.log2(e):.1f} bits)")
# now the final rescales
pout = C.Param(n=n, L=pf.L, delta=pf.delta*delta0, prime_bits=param.prime_bits)
out2 = outp
for _ in range(2):
    out2, _ = C.rescale(pout, out2)
    pout = C.Param(n=n, L=pout.L-1, delta=pout.delta/pout.qs[pout.L-1],
                   prime_bits=param.prime_bits)
rr, ri = C.decode(pout, C.decrypt_to_coeffs(pout, sk, out2))
got = np.asarray(rr) + 1j*np.asarray(ri)
print(f"after rescale2: err vs z {np.abs(got-z).max():.3e}, "
      f"err vs exp {np.abs(got - exp_slots/delta0).max():.3e}")
