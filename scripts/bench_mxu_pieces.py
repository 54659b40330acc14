"""Micro-bench the MXU NTT building blocks on the attached device."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from fhe_study_tpu.ops import ntt_mxu as M
from fhe_study_tpu.ops.ntt import _qvec, barrett_muv, mulmod_v, barrett_red
from fhe_study_tpu.ops.primes import ntt_primes

P, B, n = 9, 64, 1 << 14
n1 = n2 = 128
qs = ntt_primes(P, 30, 1 << 16)
rng = np.random.default_rng(0)
x64 = jax.device_put(jnp.asarray(
    np.stack([rng.integers(0, q, (B, n2, n1)) for q in qs]), jnp.uint64))
xb = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (P, B * n1, n2)), jnp.bfloat16))
wb = jax.device_put(jnp.asarray(rng.integers(0, 256, (P, n2, 4 * n2)),
                                jnp.bfloat16))
tb = M._device_tables(qs, n)
wl = jax.device_put(jnp.asarray(tb['W2f']))
br = jnp.asarray(tb['br'])
Tf = jnp.asarray(tb['Tf'])

def timeit(f, *a, iters=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

cases = {
  "einsum bf16 [9,8192,128]x[9,128,512]": (jax.jit(lambda a, w: jnp.einsum(
      'pmk,pkn->pmn', a, w, preferred_element_type=jnp.float32)), (xb, wb)),
  "limb extract (4x u64 shift/mask->bf16)": (jax.jit(lambda v: [
      ((v >> jnp.uint64(8*i)) & jnp.uint64(255)).astype(jnp.bfloat16)
      for i in range(4)]), (x64,)),
  "combine (4x f32->i32,u64 shifts,barrett)": (jax.jit(lambda v: barrett_red(
      sum((v + jnp.uint64(i)) << jnp.uint64(8*i) for i in range(4)),
      _qvec(qs, 4), barrett_muv(qs, 4))), (x64,)),
  "twiddle mulmod [9,64,128,128]": (jax.jit(lambda v: mulmod_v(
      v, Tf[:, None], _qvec(qs, 4), barrett_muv(qs, 4))), (x64,)),
  "bitrev gather [9,64,16384]": (jax.jit(lambda v: jnp.take(
      v.reshape(P, B, n), br, axis=-1)), (x64,)),
  "full mod_matmul": (jax.jit(lambda v: M._mod_matmul(
      v, wl, qs, contract_last=False)), (x64,)),
  "full fwd mxu": (jax.jit(lambda v: M.ntt_multi_mxu(
      v.reshape(P, B, n), qs)), (x64,)),
}
for name, (f, a) in cases.items():
    try:
        print(f"{name:42s} {timeit(f, *a)*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:42s} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
