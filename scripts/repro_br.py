import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from fhe_study_tpu.ops import blind_rotate_pallas as brp

n, B, C, l, w = 1024, 8, 2, 3, 8
kn = n
rng = np.random.default_rng(0)
shifts = jnp.asarray(rng.integers(0, 2 * n, (kn, B)), jnp.int32)
acc0 = jnp.asarray(rng.integers(0, 1 << 63, (B, C, n)).astype(np.uint64))
from fhe_study_tpu.ops import ntt as ntt_mod
p1, p2 = ntt_mod.CRT_PRIMES_TFHE
ev1 = rng.integers(0, p1, (kn, C, l, C, 2, n)).astype(np.uint64)
ev2 = rng.integers(0, p2, (kn, C, l, C, 2, n)).astype(np.uint64)
ev1s = ((ev1 << 32) // p1).astype(np.uint32)
ev2s = ((ev2 << 32) // p2).astype(np.uint32)
out = brp.blind_rotate_fused(shifts, acc0,
                             jnp.asarray(ev1.astype(np.uint32)),
                             jnp.asarray(ev1s),
                             jnp.asarray(ev2.astype(np.uint32)),
                             jnp.asarray(ev2s), n, w, interpret=False)
print(np.asarray(out).sum())
