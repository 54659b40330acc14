"""Pallas kernel: the four-step MXU NTT with VMEM-resident intermediates.

ops/ntt_mxu.py proved the matmul formulation bit-exact, but at the XLA level
its f32 limb intermediates ([P,B,m,16*m] per matmul — 16x the logical data)
round-trip through HBM, costing more than the MXU saves.  This kernel runs
the whole pipeline per (prime, batch-block) tile inside VMEM:

    u32 tile -> transpose -> 4x [bb*m, m]@[m, 4m] bf16 MXU dots -> i32
    -> Montgomery beta-combine -> twiddle -> transpose -> 4x MXU dots
    -> combine -> u32 tile

HBM traffic: one u32 read + one u32 write + the weight tables.  Tables and
schedule come from ops/ntt_mxu.py (bit-reversal folded into the weights, so
outputs remain bit-identical to ops/ntt.py's canonical order).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt_mxu
from .ntt_pallas import _mul32_wide, _on_tpu

U32 = jnp.uint32
BF16 = jnp.bfloat16
F32 = jnp.float32
I32 = jnp.int32


def _mont_mul_dyn(a, b_mont, q, nq):
    hi, lo = _mul32_wide(a, b_mont)
    mm = lo * nq
    mh, _ = _mul32_wide(mm, q)
    t = hi + mh + (lo != U32(0)).astype(U32)
    return jnp.where(t >= q, t - q, t)


def _addmod_dyn(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _mxu_step(x, w_ref, q, nq, cb, m, bb):
    """x: [bb, R, K] u32 (contraction over LAST axis K=m) -> [bb, R, m] u32.
    w_ref: [1, 4, m, 4m] bf16 limb planes.  cb: [4] u32 combine consts."""
    x2 = x.reshape(bb * m, m)
    acc = None
    for a in range(4):
        # Mosaic has no u32->f32 cast; hop through i32 (values <= 255)
        xa = ((x2 >> U32(8 * a)) & U32(0xFF)).astype(I32).astype(F32).astype(BF16)
        p = jax.lax.dot_general(xa, w_ref[0, a],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=F32)
        p = p.astype(I32)
        acc = p if acc is None else acc + p       # [bb*m, 4m] <= 2^26
    s = acc.astype(U32).reshape(bb, m, 4, m)
    out = None
    for b in range(4):
        t = _mont_mul_dyn(s[:, :, b, :], cb[b], q, nq)
        out = t if out is None else _addmod_dyn(out, t, q)
    return out                                    # [bb, m, m]


def _fwd_kernel(consts_ref, x_ref, w2_ref, tf_ref, w1_ref, o_ref, *, m, bb):
    pid = pl.program_id(0)
    q = consts_ref[0, pid]
    nq = consts_ref[1, pid]
    cb = [consts_ref[2 + b, pid] for b in range(4)]
    n = m * m
    x = x_ref[0].reshape(bb, m, m)                # [bb, i2, i1]
    x = jnp.swapaxes(x, -1, -2)                   # [bb, i1, i2]
    y = _mxu_step(x, w2_ref, q, nq, cb, m, bb)    # [bb, i1, k2']
    y = _mont_mul_dyn(y, tf_ref[0], q, nq)        # twiddle (Montgomery)
    y = jnp.swapaxes(y, -1, -2)                   # [bb, k2', i1]
    z = _mxu_step(y, w1_ref, q, nq, cb, m, bb)    # [bb, k2'=r, k1'=c]
    o_ref[0] = z.reshape(bb, n)


def _inv_kernel(consts_ref, x_ref, w1i_ref, ti_ref, w2i_ref, o_ref, *, m, bb):
    pid = pl.program_id(0)
    q = consts_ref[0, pid]
    nq = consts_ref[1, pid]
    cb = [consts_ref[2 + b, pid] for b in range(4)]
    n = m * m
    x = x_ref[0].reshape(bb, m, m)                # canonical [r, j]
    v = _mxu_step(x, w1i_ref, q, nq, cb, m, bb)   # [bb, r, i1]
    u = jnp.swapaxes(v, -1, -2)                   # [bb, i1, r=k2']
    u = _mont_mul_dyn(u, ti_ref[0], q, nq)
    w = _mxu_step(u, w2i_ref, q, nq, cb, m, bb)   # [bb, i1, i2]
    w = jnp.swapaxes(w, -1, -2)                   # [bb, i2, i1]
    o_ref[0] = w.reshape(bb, n)


@lru_cache(maxsize=None)
def _consts_np(qs: tuple, n: int):
    """[6, P] u32: q, -q^-1 mod 2^32, (2^{8b} << 32) mod q for b=0..3."""
    tb = ntt_mxu._tables(qs, n)
    bc = ntt_mxu._beta_consts(qs)                 # [4, P]
    return np.concatenate([tb['consts'], bc], axis=0), tb


def ntt_multi_mxu_pallas(x, qs: tuple, inverse: bool = False,
                         interpret: bool | None = None, block_b: int = 8):
    """[P, ..., n] multi-prime negacyclic transform; bit-identical to
    ops/ntt.py.  n must have even log2 (square four-step split)."""
    P, n = x.shape[0], x.shape[-1]
    assert P == len(qs) and ntt_mxu.mxu_supported(n)
    m = ntt_mxu._split_n(n)
    if interpret is None:
        interpret = not _on_tpu()
    consts, tb = _consts_np(qs, n)
    orig_dtype = x.dtype
    batch = x.shape[1:-1]
    xb = x.reshape((P, -1, n)).astype(U32)
    B = xb.shape[1]
    bb = max(1, min(block_b, B))
    while B % bb:
        bb -= 1
    if inverse:
        names, kern = ('W1i', 'Ti', 'W2i'), _inv_kernel
    else:
        names, kern = ('W2f', 'Tf', 'W1f'), _fwd_kernel
    wA = jnp.asarray(tb[names[0]]).swapaxes(0, 1)  # [P, 4, m, 4m] bf16
    tw = jnp.asarray(tb[names[1]])                 # [P, m, m] u32
    wB = jnp.asarray(tb[names[2]]).swapaxes(0, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, B // bb),
        in_specs=[
            pl.BlockSpec((1, bb, n), lambda p, i, *_: (p, i, 0 * p)),
            pl.BlockSpec((1, 4, m, 4 * m), lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p)),
            pl.BlockSpec((1, m, m), lambda p, i, *_: (p, 0 * p, 0 * p)),
            pl.BlockSpec((1, 4, m, 4 * m), lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, n), lambda p, i, *_: (p, i, 0 * p)),
    )
    out = pl.pallas_call(
        partial(kern, m=m, bb=bb),
        out_shape=jax.ShapeDtypeStruct((P, B, n), U32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(consts), xb, wA, tw, wB)
    return out.reshape((P,) + batch + (n,)).astype(orig_dtype)
