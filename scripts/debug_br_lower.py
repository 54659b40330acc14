"""Bisect which part of the blind-rotation kernel breaks Mosaic lowering.
Lowers (client-side, no execution) pieces of the kernel on the axon target."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from fhe_study_tpu.ops import blind_rotate_pallas as brp
from fhe_study_tpu.ops.ntt_pallas import U32, LANES

I32 = jnp.int32
n, B, C, l, w = 1024, 8, 2, 3, 8
rows = n // LANES

PIECE = sys.argv[1] if len(sys.argv) > 1 else "rot"


def kern(sh_ref, x_ref, o_ref):
    j = pl.program_id(0)
    x = x_ref[...].reshape(C * 2, rows, LANES)
    if PIECE == "rot":
        h2 = sh_ref[j % 8, 0]
        negall = h2 >= I32(n)
        h = jnp.where(negall, h2 - I32(n), h2)
        r, f = brp._rotate_neg(x, h, negall, n, rows)
        o_ref[...] = jnp.where(f, U32(0) - r, r).reshape(1, C * 2, n)
    elif PIECE == "read":
        h2 = sh_ref[j % 8, 0]
        o_ref[...] = (x + h2.astype(U32)).reshape(1, C * 2, n)
    elif PIECE == "roll":
        h2 = sh_ref[j % 8, 0]
        sh = jnp.where(h2 == 0, I32(0), I32(LANES) - h2)
        o_ref[...] = pltpu.roll(x, sh, 2).reshape(1, C * 2, n)
    elif PIECE == "when":
        @pl.when(j == 0)
        def _():
            o_ref[...] = x.reshape(1, C * 2, n)
        @pl.when(j == 1)
        def _():
            o_ref[...] = (x + U32(1)).reshape(1, C * 2, n)


f = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(16,),
        in_specs=[
            pl.BlockSpec((8, B), lambda j: (j // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C * 2, n), lambda j: (0 * j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C * 2, n), lambda j: (0 * j, 0, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct((1, C * 2, n), U32),
)

sh = jnp.zeros((16, B), I32)
x = jnp.zeros((1, C * 2, n), U32)
lowered = jax.jit(f).lower(sh, x)
print(PIECE, "LOWERED OK")
