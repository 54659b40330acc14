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
p1, p2 = 2013265921, 1811939329
ev1 = jnp.asarray(rng.integers(0, p1, (kn, C, l, C, 2, n)), jnp.uint32)
ev2 = jnp.asarray(rng.integers(0, p2, (kn, C, l, C, 2, n)), jnp.uint32)
out = brp.blind_rotate_fused(shifts, acc0, ev1, ev2, n, w, interpret=False)
print(np.asarray(out).sum())
