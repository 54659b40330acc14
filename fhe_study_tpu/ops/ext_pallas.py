"""Fused Pallas kernels for the RNS fast base extension (HPS conversion).

After the NTTs, base extension is the RNS stack's hottest op: for every
coefficient, out_j = Σ_i y_i·tab[i,j] − α·(S mod d_j)  (mod d_j) over all
(src × dst) prime pairs.  The XLA path streams several [Ls or Ld, B, n]
tensors through HBM per step; these kernels read the residue block ONCE and
run the whole (Ls × Ld) contraction in VMEM with u32 Shoup arithmetic
(every multiplier is a compile-time constant, so each product is one
wide-high mul + two low muls — no 64-bit emulation).

Two entry points:
  * base_extend_fused — the WHOLE conversion in one kernel: the Shoup
    products y_i = [x_i·Q̂_i^{-1}]_{s_i}, the α = floor/round(Σ y_i/s_i)
    in 2^59 fixed point on u32 limb pairs (models/bfv_rns.py documents the
    exactness margins), and the contraction.  x in, out out — nothing else
    touches HBM (the XLA path round-trips ys and runs the α sum on
    EMULATED u64 lanes).
  * base_extend_sum — contraction only, for callers that already hold
    (ys, α) (hybrid_ks reuses ys across hoisted rotations).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt_pallas import (_addmod, _submod, _mul32_wide, _shoup_mul,
                         _on_tpu)

U32 = jnp.uint32
# coefficients per block (the op is fully per-coefficient).  Large tiles
# matter: at the BFV bench shape the conversion covers ~3M coefficients, and
# 2K-lane tiles turn that into 1500+ sequential grid steps of ~30 KB DMAs —
# pure latency.  32K lanes keeps the in+w+out stack ~2 MB for Ls+Ld <= 10
# (128K measured OOM against Mosaic's live wide-mul temporaries) while
# cutting the grid to ~100 steps.
LANE_TILE = 32 * 1024
# The coefficient axis is folded to (rows, 128) INSIDE each limb so every
# vector op runs on full (8, 128) VPU tiles: a flat [Ls, 32768] block makes
# each per-limb slice a 1-sublane (1, 32768) vector — Mosaic pads it to
# (8, 128) tiles at 1/8 utilization, measured ~3x slower end-to-end.
LANES = 128
ROW_TILE = LANE_TILE // LANES


@lru_cache(maxsize=None)
def _ext_consts(src: tuple, dst: tuple):
    """Shoup pairs (w, floor(w·2^32/d)): every multiplier in the extension
    is a compile-time constant, so Harvey/Shoup (one wide-high mul + two
    low muls) beats Montgomery (two wide muls) — measured ~25% off the
    whole conversion.  tab[i][j] <- (S/s_i) mod d_j, smod[j] <- S mod d_j."""
    S = 1
    for s in src:
        S *= s
    tab = np.zeros((len(src), len(dst), 2), np.uint32)
    smod = np.zeros((len(dst), 2), np.uint32)
    for j, d in enumerate(dst):
        sm = S % d
        smod[j] = (sm, (sm << 32) // d)
        for i, s in enumerate(src):
            w = (S // s) % d
            tab[i, j] = (w, (w << 32) // d)
    return tab, smod


def _ext_kernel(ys_ref, alpha_ref, out_ref, *, src, dst, tab, smod):
    al = alpha_ref[...]
    for j, d in enumerate(dst):
        acc = _shoup_mul(ys_ref[0], U32(int(tab[0, j, 0])),
                         U32(int(tab[0, j, 1])), U32(d))
        for i in range(1, len(src)):
            term = _shoup_mul(ys_ref[i], U32(int(tab[i, j, 0])),
                              U32(int(tab[i, j, 1])), U32(d))
            acc = _addmod(acc, term, d)
        corr = _shoup_mul(al, U32(int(smod[j, 0])), U32(int(smod[j, 1])),
                          U32(d))
        out_ref[j] = _submod(acc, corr, d)


def _ext_fused_kernel(x_ref, *refs, src, dst, tab, smod,
                      him, cfix, centered, sub_mul):
    """Whole conversion: y_i = shoup(x_i, Q̂_i^{-1}); α = Σ y_i·⌊2^59/s_i⌋
    (u32 limb pairs, < Ls·2^59 < 2^64; truncation ≤ Ls·2^-28 — see
    models/bfv_rns.fast_base_extend for the exactness margins), rounded when
    centered; then the (Ls × Ld) Shoup contraction (all multipliers are
    compile-time constants — see _ext_consts).

    sub_mul epilogue (the BFV t/Q scaling step, bfv_rns._tensor):
    out_j = (w_j − ext_j) · c_j  with w an extra [Ld, tile] input and c_j a
    per-dst Shoup constant pair."""
    if sub_mul is None:
        (out_ref,) = refs
    else:
        w_ref, out_ref = refs
    ys = []
    tlo = None
    thi = None
    for i, s in enumerate(src):
        y = _shoup_mul(x_ref[i], U32(int(him[i][0])), U32(int(him[i][1])),
                       U32(s))
        ys.append(y)
        hi, lo = _mul32_wide(y, U32(int(cfix[i])))   # y·⌊2^59/s⌋ < 2^62
        if tlo is None:
            tlo, thi = lo, hi
        else:
            nlo = tlo + lo
            thi = thi + hi + (nlo < lo).astype(U32)
            tlo = nlo
    if centered:                                     # + 2^58 (hi limb 2^26)
        thi = thi + U32(1 << 26)                     # no lo carry: add to hi
    al = thi >> U32(27)                              # floor(tsum / 2^59)
    for j, d in enumerate(dst):
        acc = _shoup_mul(ys[0], U32(int(tab[0, j, 0])),
                         U32(int(tab[0, j, 1])), U32(d))
        for i in range(1, len(src)):
            term = _shoup_mul(ys[i], U32(int(tab[i, j, 0])),
                              U32(int(tab[i, j, 1])), U32(d))
            acc = _addmod(acc, term, d)
        corr = _shoup_mul(al, U32(int(smod[j, 0])), U32(int(smod[j, 1])),
                          U32(d))
        ext = _submod(acc, corr, d)
        if sub_mul is None:
            out_ref[j] = ext
        else:
            out_ref[j] = _shoup_mul(_submod(w_ref[j], ext, d),
                                    U32(int(sub_mul[j][0])),
                                    U32(int(sub_mul[j][1])), U32(d))


def base_extend_fused(x, src: tuple, dst: tuple, centered: bool = False,
                      w=None, sub_mul: tuple | None = None,
                      interpret: bool | None = None):
    """x: [Ls, ..., n] residues (< s_i < 2^31, u32/u64) -> [Ld, ..., n] u32:
    the complete HPS conversion in one kernel pass.

    With (w, sub_mul): returns (w_j − ext_j(x)) · sub_mul[j] mod d_j instead
    (sub_mul plain-domain per-dst constants, lifted here) — the fused t/Q
    scaling step of the BFV tensor."""
    if interpret is None:
        interpret = not _on_tpu()
    tab, smod = _ext_consts(src, dst)
    him = []
    for i, s in enumerate(src):
        hw = pow(_hat(src, i), -1, s)
        him.append((hw, (hw << 32) // s))
    cfix = [(1 << 59) // s for s in src]
    Ls, Ld = len(src), len(dst)
    batch = x.shape[1:]
    total = int(np.prod(batch))
    tile = LANE_TILE
    while tile > 1024 and tile >= 2 * total:   # don't pad tiny inputs 64x
        tile //= 2
    rows_t = tile // LANES
    pad = (-total) % tile
    x32 = x.reshape(Ls, total).astype(U32)
    if pad:
        x32 = jnp.pad(x32, ((0, 0), (0, pad)))
    m = x32.shape[1]
    # fold coeffs to (rows, 128) so per-limb slices are full (8,128) tiles
    x32 = x32.reshape(Ls, m // LANES, LANES)
    args = [x32]
    in_specs = [pl.BlockSpec((Ls, rows_t, LANES),
                             lambda i: (i * 0, i, i * 0),
                             memory_space=pltpu.VMEM)]
    sm = None
    if sub_mul is not None:
        assert w is not None and w.shape == (Ld,) + batch
        sm = [(int(c) % d, ((int(c) % d) << 32) // d)
              for c, d in zip(sub_mul, dst)]
        w32 = w.reshape(Ld, total).astype(U32)
        if pad:
            w32 = jnp.pad(w32, ((0, 0), (0, pad)))
        w32 = w32.reshape(Ld, m // LANES, LANES)
        args.append(w32)
        in_specs.append(pl.BlockSpec((Ld, rows_t, LANES),
                                     lambda i: (i * 0, i, i * 0),
                                     memory_space=pltpu.VMEM))
    kern = partial(_ext_fused_kernel, src=src, dst=dst, tab=tab, smod=smod,
                   him=him, cfix=cfix, centered=centered, sub_mul=sm)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ld, m // LANES, LANES), jnp.uint32),
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Ld, rows_t, LANES),
                               lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    out = out.reshape(Ld, m)
    if pad:
        out = out[:, :total]
    return out.reshape((Ld,) + batch)     # u32; caller casts as needed


@lru_cache(maxsize=None)
def _hat(src: tuple, i: int) -> int:
    S = 1
    for s in src:
        S *= s
    return (S // src[i]) % src[i]


def base_extend_sum(ys, alpha, src: tuple, dst: tuple,
                    interpret: bool | None = None):
    """ys: [Ls, ..., n] u64 (values < s_i < 2^31), alpha: [..., n] u64
    (< Ls) -> [Ld, ..., n] u64 residues of Σ y_i·Q̂_i − α·S per dst prime."""
    if interpret is None:
        interpret = not _on_tpu()
    tab, smod = _ext_consts(src, dst)
    Ls, Ld = len(src), len(dst)
    batch = ys.shape[1:]
    total = int(np.prod(batch))
    ys32 = ys.reshape(Ls, total).astype(U32)
    al32 = alpha.reshape(total).astype(U32)
    tile = LANE_TILE
    while tile > 1024 and tile >= 2 * total:
        tile //= 2
    rows_t = tile // LANES
    pad = (-total) % tile
    if pad:
        ys32 = jnp.pad(ys32, ((0, 0), (0, pad)))
        al32 = jnp.pad(al32, ((0, pad),))
    m = ys32.shape[1]
    ys32 = ys32.reshape(Ls, m // LANES, LANES)
    al32 = al32.reshape(m // LANES, LANES)
    kern = partial(_ext_kernel, src=src, dst=dst, tab=tab, smod=smod)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ld, m // LANES, LANES), jnp.uint32),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((Ls, rows_t, LANES), lambda i: (i * 0, i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_t, LANES), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Ld, rows_t, LANES),
                               lambda i: (i * 0, i, i * 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ys32, al32)
    out = out.reshape(Ld, m)
    if pad:
        out = out[:, :total]
    return out.reshape((Ld,) + batch)     # u32; caller casts as needed
