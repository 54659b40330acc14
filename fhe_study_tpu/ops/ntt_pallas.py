"""Fused Pallas TPU kernel for the negacyclic NTT/INTT (q < 2^31).

Why a kernel: the XLA path materializes each butterfly stage through HBM
(log2(n) round trips).  This kernel keeps a batch tile resident in VMEM and
runs ALL stages back-to-back on the VPU — the NTT becomes compute-bound
instead of HBM-bound.

TPU-native choices:
  * uint32 lanes (no 64-bit ints in Mosaic).  Modular multiply is Montgomery
    with 16-bit-limb 32x32→64 products; twiddles are pre-multiplied by
    2^32 mod q, so data stays in the NORMAL domain end-to-end.
  * butterfly partner j^t is realized as two `pltpu.roll`s + a select —
    every stage is uniform elementwise work over a [rows, 128] tile, whether
    the distance crosses sublanes (t ≥ 128) or lanes (t < 128).
  * per-stage twiddles are one [log2(n), n] u32 table streamed into VMEM,
    laid out so stage s is a plain row read (no gathers in the kernel).

The butterfly schedule matches ops/ntt.py exactly (CT forward / GS inverse
with bit-reversed tables, reference arith/src/ntt.rs:44-110), so outputs are
bit-identical to the XLA path and to the Rust reference.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt as ntt_mod

LANES = 128
U32 = jnp.uint32

# Harvey lazy butterflies (see _fwd_stage_lazy): ON by default for q < 2^30;
# FHE_LAZY_NTT=0 restores the strict per-op reductions (A/B lever)
import os as _os
_LAZY = _os.environ.get("FHE_LAZY_NTT", "1") != "0"


def _lazy_ok(qs) -> bool:
    return _LAZY and all(p < (1 << 30) for p in qs)


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

# id-keyed interning of CACHED numpy tables as device constants: every
# kernel call site used to do its own jnp.asarray(table), and each conversion
# becomes a SEPARATE constant in the lowered module — at production shapes
# the multi-prime twiddle table is ~6 MB and a staged bootstrap graph holds
# dozens of call sites, blowing the remote-compile request body past the
# relay's limit (HTTP 413, BENCH_r02).  Closing over the SAME jax.Array
# object dedupes them to one constant per table.  Only ever fed lru-cached
# numpy arrays (stable ids); the value is created uncommitted (plain
# asarray), so it follows the computation to any device.
_dev = ntt_mod._dev


@lru_cache(maxsize=None)
def _tw_prime(q: int, n: int, planes: str):
    """Per-prime twiddle block (numpy, stable id — see _dev):
    "fwd"/"inv" -> [1, 2(w/shoup), logn, n];
    "both" -> [1, 2(fwd/inv), 2, logn, n];
    "fwdp"/"invp" -> [1, 1, 2, logn, n] (one plane, axis kept)."""
    fwd, inv, _ = _stage_tables(q, n)
    if planes == "fwd":
        return fwd[None]
    if planes == "inv":
        return inv[None]
    if planes == "fwdp":
        return np.ascontiguousarray(fwd[None, None])
    if planes == "invp":
        return np.ascontiguousarray(inv[None, None])
    return np.ascontiguousarray(np.stack([fwd, inv])[None])


def _tw_dev(qs: tuple, n: int, planes: str):
    """Stacked multi-prime twiddles as an in-graph concat of per-PRIME
    interned constants.  A fused module holds one kernel call per prime-set
    variant (every rescale level is a different tuple), and stacking
    host-side made each variant its own multi-MB HLO constant — the main
    remote-compile 413 driver.  Per-prime interning dedupes across ALL
    variants (40 unique blocks serve every level); the concat itself is
    compile-time foldable."""
    parts = [_dev(_tw_prime(q, n, planes)) for q in qs]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)


@lru_cache(maxsize=None)
def _mont32_consts(q: int):
    assert q % 2 == 1 and q < (1 << 31)
    nqinv = (-pow(q, -1, 1 << 32)) % (1 << 32)   # -q^{-1} mod 2^32
    r = (1 << 32) % q
    return nqinv, r


@lru_cache(maxsize=None)
def _stage_tables(q: int, n: int):
    """[2, logn, n] u32 twiddle-per-element tables for the forward (CT,
    t: n/2 -> 1) and inverse (GS, t: 1 -> n/2) schedules: plane 0 = the
    twiddle w (normal domain), plane 1 = its Shoup companion
    floor(w*2^32/q) — one high-mul + one low-mul per modular multiply.
    Lane/sublane masks are implicit (recomputed in-kernel from iota)."""
    plan = ntt_mod.get_plan(q, n)
    logn = n.bit_length() - 1
    fwd = np.zeros((2, logn, n), np.uint32)
    inv = np.zeros((2, logn, n), np.uint32)
    shoup = lambda x: (int(x) << 32) // q  # noqa: E731
    # forward: stage s has m = 2^s groups, t = n >> (s+1); element j belongs
    # to group g = j >> (log2(2t)); twiddle S = roots[m + g] for BOTH halves
    for s in range(logn):
        m = 1 << s
        t = n >> (s + 1)
        g = np.arange(n) >> ((2 * t).bit_length() - 1)
        S = plan.roots[m + g]
        fwd[0, s] = S.astype(np.uint32)
        fwd[1, s] = np.array([shoup(x) for x in S], np.uint32)
    # inverse: stage s has t = 2^s, m = n >> (s+1)
    for s in range(logn):
        t = 1 << s
        m = n >> (s + 1)
        g = np.arange(n) >> (s + 1)
        S = plan.roots_inv[m + g]
        inv[0, s] = S.astype(np.uint32)
        inv[1, s] = np.array([shoup(x) for x in S], np.uint32)
    n_inv = pow(n, q - 2, q)
    return fwd, inv, (np.uint32(n_inv), np.uint32((n_inv << 32) // q))


# ---------------------------------------------------------------------------
# in-kernel arithmetic (uint32)
# ---------------------------------------------------------------------------

def _mul32_wide(a, b):
    """32x32 -> (hi, lo) via 16-bit limbs, all in u32."""
    mask = U32(0xFFFF)
    a0 = a & mask
    a1 = a >> U32(16)
    b0 = b & mask
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> U32(16)) + (p01 & mask) + (p10 & mask)
    lo = (mid << U32(16)) | (p00 & mask)
    hi = p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (mid >> U32(16))
    return hi, lo


def _mont_mul(a, b_mont, q: int, nqinv: int):
    """a (normal) * b_mont (Montgomery) mod q -> normal domain."""
    hi, lo = _mul32_wide(a, b_mont)
    m = lo * U32(nqinv)
    mh, _ = _mul32_wide(m, U32(q))
    carry = (lo != U32(0)).astype(U32)
    t = hi + mh + carry
    return jnp.where(t >= U32(q), t - U32(q), t)


def _mul32_hi(a, b):
    """high 32 bits of a*b (16-bit limbs)."""
    mask = U32(0xFFFF)
    a0 = a & mask
    a1 = a >> U32(16)
    b0 = b & mask
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> U32(16)) + (p01 & mask) + (p10 & mask)
    return p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (mid >> U32(16))


def _shoup_mul(a, w, wp, q):
    """a*w mod q via Harvey/Shoup: wp = floor(w*2^32/q) precomputed.
    Valid for any a < 2^32, w < q < 2^31; one wide-high mul + two low muls
    (vs two wide muls for Montgomery).  q may be a traced scalar."""
    hi = _mul32_hi(a, wp)
    t = a * w - hi * q            # wrapping low-32; lands in [0, 2q)
    return jnp.where(t >= q, t - q, t)


def _addmod(a, b, q: int):
    s = a + b
    return jnp.where(s >= U32(q), s - U32(q), s)


def _submod(a, b, q: int):
    return jnp.where(a >= b, a - b, (U32(q) - b) + a)


def _roll(x, shift: int, axis: int):
    """Static circular shift via slice+concat (robust in Mosaic & interpret).
    shift=-r: element j takes x[j+r]."""
    r = (-shift) % x.shape[axis]
    if r == 0:
        return x
    lo = jax.lax.slice_in_dim(x, r, x.shape[axis], axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, r, axis=axis)
    return jax.lax.concatenate([lo, hi], dimension=axis)


def _bit_set_mask(shape, dim: int, dist: int):
    """True where bit log2(dist) of the index along `dim` is CLEAR (i.e. the
    element is in the first half of its butterfly pair).  Pure shift/and —
    integer division recurses in the Mosaic tracer."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    shift = dist.bit_length() - 1
    bit = jax.lax.shift_right_logical(idx, jnp.int32(shift)) & jnp.int32(1)
    return bit == jnp.int32(0)


def _swap_xor_t(x, t: int, rows: int):
    """x: [B, rows, 128]; return x[..., j ^ t] for element index j.
    (Wrap-around elements land only on masked-out positions.)"""
    if t >= LANES:
        r = t // LANES
        down = _roll(x, -r, 1)          # x[row + r]
        up = _roll(x, r, 1)             # x[row - r]
        return jnp.where(_bit_set_mask(x.shape, 1, r), down, up)
    down = _roll(x, -t, 2)
    up = _roll(x, t, 2)
    return jnp.where(_bit_set_mask(x.shape, 2, t), down, up)


def _first_half_mask(shape, t: int):
    if t >= LANES:
        return _bit_set_mask(shape, 1, t // LANES)
    return _bit_set_mask(shape, 2, t)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ntt_kernel(x_ref, tw_ref, o_ref, *, q, n, inverse, n_inv_pair):
    rows = n // LANES
    x = x_ref[...].reshape(x_ref.shape[0], rows, LANES)
    logn = n.bit_length() - 1
    qq = U32(q)
    for s in range(logn):
        t = (n >> (s + 1)) if not inverse else (1 << s)
        tw = tw_ref[0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[1, s, :].reshape(1, rows, LANES)
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        if not inverse:
            # CT: out = first ? x + S*y : y - S*x.  The multiplicand is y in
            # the first half and x (self) in the second — ONE mul on the
            # merged operand instead of two.
            p = _shoup_mul(jnp.where(first, y, x), tw, twp, qq)
            x = jnp.where(first, _addmod(x, p, q), _submod(y, p, q))
        else:
            # GS: out = first ? x + y : S*(y - x)
            diff = _submod(y, x, q)
            x = jnp.where(first, _addmod(x, y, q),
                          _shoup_mul(diff, tw, twp, qq))
    if inverse:
        x = _shoup_mul(x, jnp.full_like(x, n_inv_pair[0]),
                       jnp.full_like(x, n_inv_pair[1]), qq)
    o_ref[...] = x.reshape(x_ref.shape[0], n)


def _build_call(q: int, n: int, inverse: bool, block_b: int, interpret: bool):
    fwd, inv, n_inv_pair = _stage_tables(q, n)
    tw = inv if inverse else fwd
    logn = n.bit_length() - 1
    kern = partial(_ntt_kernel, q=q, n=n, inverse=inverse,
                   n_inv_pair=(int(n_inv_pair[0]), int(n_inv_pair[1])))

    def call(x):
        B = x.shape[0]
        grid = (B // block_b,)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
            grid=grid,
            in_specs=[
                # NB: zeros via i*0 keep the index-map dtype uniform (a bare
                # Python 0 lowers as i64 under x64 and breaks Mosaic)
                pl.BlockSpec((block_b, n), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, logn, n), lambda i: (i * 0, i * 0, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_b, n), lambda i: (i, i * 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, _dev(tw))

    return call


# ---------------------------------------------------------------------------
# Multi-prime kernel: the RNS stack transforms [L, B, n] in ONE pallas_call —
# grid (prime, batch-block), per-prime (q, nqinv, n_inv) via scalar prefetch.
# ---------------------------------------------------------------------------

def _shoup_mul_lazy(a, w, wp, q):
    """a*w mod q WITHOUT the final correction: result in [0, 2q) (Harvey).
    Valid for any a < 2^32, w < q < 2^31."""
    hi = _mul32_hi(a, wp)
    return a * w - hi * q


def _norm2q(x, q2):
    return jnp.where(x >= q2, x - q2, x)


def _fwd_stage_lazy(x, y, first, tw, twp, q, q2):
    """One lazy CT butterfly stage: inputs normalized to [0, 2q) by the
    caller; outputs in [0, 4q).  Saves the per-op conditional corrections
    of addmod/submod/shoup (one _norm2q at stage entry instead of three
    compare-selects) — measured ~15% off the whole chain at q < 2^30."""
    p = _shoup_mul_lazy(jnp.where(first, y, x), tw, twp, q)
    return jnp.where(first, x + p, (y + q2) - p)


def _inv_stage_lazy(x, y, first, tw, twp, q, q2):
    """One lazy GS stage: x, y in [0, 2q); add branch in [0, 4q), shoup
    branch already in [0, 2q)."""
    return jnp.where(first, x + y,
                     _shoup_mul_lazy((y + q2) - x, tw, twp, q))


def _ntt_kernel_multi(consts_ref, x_ref, tw_ref, o_ref, *, n, inverse,
                      final, lazy):
    q = consts_ref[0, pl.program_id(0)]
    fin = consts_ref[1, pl.program_id(0)]     # final multiplier (n_inv for a
    fin_sh = consts_ref[2, pl.program_id(0)]  # plain INTT; may fold t, R,
    rows = n // LANES                         # R^-1 — see ntt_multi_u32)
    x = x_ref[...].reshape(x_ref.shape[1], rows, LANES)
    logn = n.bit_length() - 1
    q2 = q + q
    for s in range(logn):
        t = (n >> (s + 1)) if not inverse else (1 << s)
        tw = tw_ref[0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            first = _first_half_mask(x.shape, t)
            stage = _inv_stage_lazy if inverse else _fwd_stage_lazy
            x = stage(x, y, first, tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        if not inverse:
            p = _shoup_mul(jnp.where(first, y, x), tw, twp, q)
            x = jnp.where(first, _addmod_dyn(x, p, q), _submod_dyn(y, p, q))
        else:
            diff = _submod_dyn(y, x, q)
            x = jnp.where(first, _addmod_dyn(x, y, q),
                          _shoup_mul(diff, tw, twp, q))
    if final:
        # _shoup_mul accepts any u32 input and fully reduces: the lazy
        # [0, 4q) residue collapses here for free
        x = _shoup_mul(x, jnp.full_like(x, 1) * fin,
                       jnp.full_like(x, 1) * fin_sh, q)
    elif lazy:
        x = _norm2q(_norm2q(x, q2), q)        # [0, 4q) -> exact [0, q)
    o_ref[...] = x.reshape(x_ref.shape)


def _mont_mul_dyn(a, b_mont, q, nqinv):
    hi, lo = _mul32_wide(a, b_mont)
    m = lo * nqinv
    mh, _ = _mul32_wide(m, q)
    carry = (lo != U32(0)).astype(U32)
    t = hi + mh + carry
    return jnp.where(t >= q, t - q, t)


def _addmod_dyn(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _submod_dyn(a, b, q):
    return jnp.where(a >= b, a - b, (q - b) + a)


@lru_cache(maxsize=None)
def _multi_consts(qs: tuple, n: int, fin: tuple | None = None):
    """fin: per-prime FINAL multiplier overriding the default (n_inv for
    the inverse, nothing for the forward) — lets callers fold a Montgomery
    lift (R), a de-lift (R^-1), or a plaintext scale (t) into the kernel's
    last in-VMEM multiply instead of paying a full HBM pass."""
    cons = np.zeros((3, len(qs)), np.uint32)
    for i, q in enumerate(qs):
        ninv_pair = _stage_tables(q, n)[2]
        f = int(ninv_pair[0]) if fin is None else int(fin[i]) % q
        cons[0, i] = q
        cons[1, i] = f
        cons[2, i] = (f << 32) // q
    return (cons,)   # twiddles come from _tw_dev (per-prime interned)


def ntt_multi_u32(x, qs: tuple, inverse: bool = False,
                  interpret: bool | None = None, fin: tuple | None = None):
    """[L, ..., n] per-prime transform in a single kernel launch.

    fin: optional per-prime final multiplier applied in-VMEM after the
    butterfly stages.  Forward default: none.  Inverse default: n^-1 —
    an explicit fin REPLACES it (callers fold n^-1 * extra in themselves)."""
    L = x.shape[0]
    n = x.shape[-1]
    assert L == len(qs) and n >= LANES and n % LANES == 0
    orig_dtype = x.dtype
    batch = x.shape[1:-1]
    xb = x.reshape((L, -1, n)).astype(jnp.uint32)
    B0 = xb.shape[1]
    # Mosaic: the SECOND-MINOR block dim must be 8-divisible or the full
    # axis — pad the flattened batch to a multiple of 8 (zero rows
    # transform to zero; sliced off below) so a valid block always exists
    pad = (-B0) % 8 if B0 > 1 else 0
    if pad:
        xb = jnp.pad(xb, ((0, 0), (0, pad), (0, 0)))
    B = B0 + pad
    block_b = max(1, min(B, (1 << 20) // (n * 4)))
    while B % block_b or (block_b % 8 and block_b != B):
        block_b -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _multi_consts(qs, n, fin)[0]
    tw = _tw_dev(qs, n, "inv" if inverse else "fwd")
    logn = n.bit_length() - 1
    kern = partial(_ntt_kernel_multi, n=n, inverse=inverse,
                   final=inverse or fin is not None,
                   lazy=_lazy_ok(qs))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B // block_b),
        in_specs=[
            pl.BlockSpec((1, block_b, n), lambda p, i, *_: (p, i, 0 * p)),
            pl.BlockSpec((1, 2, logn, n),
                         lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, block_b, n), lambda p, i, *_: (p, i, 0 * p)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, B, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), xb, tw)
    if pad:
        out = out[:, :B0]
    return out.reshape((L,) + batch + (n,)).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Fused degree-2 tensor kernel: forward NTT of all four operand polynomials,
# the three pointwise convolution products, and the inverse NTT of the
# products — one VMEM round trip.  This is THE ct-mul hot path: unfused it
# costs 4 fwd + 3 inv kernel launches plus an XLA pointwise stage, i.e.
# 4r+4w (fwd) + 7r+3w (prod) + 3r+3w (inv) = 24 HBM array passes; fused it
# is 4r+3w.  (Reference negacyclic mul: arith/src/ring_nq.rs:563-607 via
# arith/src/ntt.rs:44-110; the degree-2 tensor: bfv/src/lib.rs:59-85.)
# ---------------------------------------------------------------------------

def _tensor_tail(x, q, fin, fin_sh, nqinv, tw_ref, *, n, bb, lazy=False):
    """Shared degree-2 tensor body: 4 CT forwards (stacked), the 3 pointwise
    products, 3 GS inverses, and the fin (= n^-1·R·scale) epilogue.
    x: [4*bb, rows, LANES] (bb-major), coefficient domain, canonical mod q
    (q/fin/fin_sh/nqinv traced scalars).  Returns [3*bb, rows, LANES].

    lazy (q < 2^30 only): Harvey lazy butterflies — values ride in [0, 4q)
    with one _norm2q per stage instead of three compare-selects; the mont
    products take [0, 2q) operands exactly (4q^2 < q*2^32), and the fin
    Shoup epilogue fully reduces."""
    rows = n // LANES
    logn = n.bit_length() - 1
    q2 = q + q
    for s in range(logn):                      # CT forward, all 4 at once
        t = n >> (s + 1)
        tw = tw_ref[0, 0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _fwd_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        p = _shoup_mul(jnp.where(first, y, x), tw, twp, q)
        x = jnp.where(first, _addmod_dyn(x, p, q), _submod_dyn(y, p, q))
    if lazy:
        x = _norm2q(x, q2)                     # [0, 2q) into the products
    xr = x.reshape(bb, 4, rows, LANES)
    x0, x1, y0, y1 = xr[:, 0], xr[:, 1], xr[:, 2], xr[:, 3]
    p1 = _addmod_dyn(_mont_mul_dyn(x0, y1, q, nqinv),
                     _mont_mul_dyn(x1, y0, q, nqinv), q)
    x = jnp.stack([_mont_mul_dyn(x0, y0, q, nqinv), p1,
                   _mont_mul_dyn(x1, y1, q, nqinv)],
                  axis=1).reshape(3 * bb, rows, LANES)
    for s in range(logn):                      # GS inverse, all 3 products
        t = 1 << s
        tw = tw_ref[0, 1, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 1, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _inv_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        diff = _submod_dyn(y, x, q)
        x = jnp.where(first, _addmod_dyn(x, y, q),
                      _shoup_mul(diff, tw, twp, q))
    return _shoup_mul(x, jnp.full_like(x, 1) * fin,
                      jnp.full_like(x, 1) * fin_sh, q)


def _tensor_kernel_multi(consts_ref, x_ref, tw_ref, o_ref, *, n, bb,
                         lazy=False):
    # layouts put the operand axis SECOND-MINOR ([.., bb, 4, n]): Mosaic
    # requires tiled (last-two) block dims divisible by (8, 128) or full —
    # a full-size operand axis there leaves the batch block size bb free
    q = consts_ref[0, pl.program_id(0)]
    fin = consts_ref[1, pl.program_id(0)]      # n^-1 * R * scale (R cancels
    fin_sh = consts_ref[2, pl.program_id(0)]   # the mont product's R^-1)
    nqinv = consts_ref[3, pl.program_id(0)]
    rows = n // LANES
    x = x_ref[...].reshape(4 * bb, rows, LANES)
    x = _tensor_tail(x, q, fin, fin_sh, nqinv, tw_ref, n=n, bb=bb, lazy=lazy)
    o_ref[...] = x.reshape(1, bb, 3, n)


def _tensor4_kernel(consts_ref, x0_ref, x1_ref, y0_ref, y1_ref, tw_ref,
                    o_ref, *, n, bb, src, him, snq, cfix, lazy=False):
    """Tensor product from FOUR separate operand arrays (no host-side stack
    copy).  src=None: operands are this prime's own residue rows.
    src=(...): operand blocks carry ALL Ls source-basis rows and the kernel
    runs the HPS extension to this dst prime in its prologue (tab/smod ride
    the scalar-prefetch consts; ys/alpha math identical to
    ext_pallas._ext_fused_kernel, unsigned interpretation)."""
    j = pl.program_id(0)
    q = consts_ref[0, j]
    fin = consts_ref[1, j]
    fin_sh = consts_ref[2, j]
    nqinv = consts_ref[3, j]
    rows = n // LANES
    refs = (x0_ref, x1_ref, y0_ref, y1_ref)
    # input blocks carry a dummy second-minor axis: Mosaic constrains the
    # LAST TWO block dims to (8k, 128k) or full-size — (1, n) is full-size,
    # leaving bb free on an unconstrained axis
    if src is None:
        x = jnp.concatenate(
            [r[...].reshape(bb, 1, rows, LANES) for r in refs],
            axis=1).reshape(4 * bb, rows, LANES)
    else:
        Ls = len(src)
        xin = jnp.concatenate(
            [r[...].reshape(Ls, bb, 1, rows, LANES) for r in refs],
            axis=2)                            # [Ls, bb, 4, rows, LANES]
        ys = []
        tlo = None
        thi = None
        for i, s_p in enumerate(src):
            y = _mont_mul(xin[i], U32(int(him[i])), s_p, int(snq[i]))
            ys.append(y)
            hi, lo = _mul32_wide(y, U32(int(cfix[i])))
            if tlo is None:
                tlo, thi = lo, hi
            else:
                nlo = tlo + lo
                thi = thi + hi + (nlo < lo).astype(U32)
                tlo = nlo
        al = thi >> U32(27)                    # floor α, unsigned contract
        acc = None
        for i in range(Ls):
            term = _mont_mul_dyn(ys[i], consts_ref[4 + i, j], q, nqinv)
            acc = term if acc is None else _addmod_dyn(acc, term, q)
        corr = _mont_mul_dyn(al, consts_ref[4 + Ls, j], q, nqinv)
        x = _submod_dyn(acc, corr, q).reshape(4 * bb, rows, LANES)
    x = _tensor_tail(x, q, fin, fin_sh, nqinv, tw_ref, n=n, bb=bb, lazy=lazy)
    o_ref[...] = x.reshape(1, bb, 3, n)


@lru_cache(maxsize=None)
def _tensor_consts(qs: tuple, n: int, scale: tuple | None):
    cons = np.zeros((4, len(qs)), np.uint32)
    for i, q in enumerate(qs):
        ninv = int(_stage_tables(q, n)[2][0])
        s = 1 if scale is None else int(scale[i]) % q
        # fin = n^-1 * 2^32 * scale: the in-kernel products are plain-domain
        # Montgomery muls (x*y*R^-1), so R re-enters through the epilogue
        f = (ninv * ((1 << 32) % q) % q) * s % q
        cons[0, i] = q
        cons[1, i] = f
        cons[2, i] = (f << 32) // q
        cons[3, i] = _mont32_consts(q)[0]
    return cons                                # tw comes from _tw_dev


def tensor_mul_u32(x4, qs: tuple, scale: tuple | None = None,
                   interpret: bool | None = None):
    """x4: [L, ..., 4, n] coefficient-domain (x0, x1, y0, y1) residues mod
    qs[i].  Returns [L, ..., 3, n] = scale * (x0*y0, x0*y1 + x1*y0, x1*y1)
    negacyclic products, coefficient domain."""
    L = x4.shape[0]
    n = x4.shape[-1]
    assert L == len(qs) and x4.shape[-2] == 4
    assert n >= LANES and n % LANES == 0
    batch = x4.shape[1:-2]
    xb = x4.reshape((L, -1, 4, n)).astype(jnp.uint32)
    B = xb.shape[1]
    # VMEM stack budget: the twiddle block alone is 2*2*logn*n*4 bytes
    # (~7.3 MB at n=2^14) and Mosaic keeps ~2.4 MB of live temporaries per
    # batch row through the butterfly loops — bb=4 at n=2^14 overflows the
    # 16 MB scoped-vmem limit (measured 16.95 MB).  512 KB of input rows
    # per block keeps the whole stack ≲ 12 MB at every n.
    bb = max(1, min(B, (1 << 19) // (4 * n * 4)))
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _tensor_consts(qs, n, scale)
    tw = _tw_dev(qs, n, "both")
    logn = n.bit_length() - 1
    kern = partial(_tensor_kernel_multi, n=n, bb=bb,
                   lazy=_lazy_ok(qs))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B // bb),
        in_specs=[
            pl.BlockSpec((1, bb, 4, n), lambda p, i, *_: (p, i, 0 * p, 0 * p)),
            pl.BlockSpec((1, 2, 2, logn, n),
                         lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, 3, n),
                               lambda p, i, *_: (p, i, 0 * p, 0 * p)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((L, B, 3, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), xb, tw)
    return out.reshape((L,) + batch + (3, n))


@lru_cache(maxsize=None)
def _tensor4_consts(dst: tuple, n: int, scale: tuple | None,
                    src: tuple | None):
    """[4 (+Ls+1 when extending), Ld] scalar-prefetch table: q, fin, fin_sh,
    nqinv per dst prime, plus Montgomery-lifted extension tab rows and
    S mod d (matching ext_pallas._ext_consts)."""
    Ls = 0 if src is None else len(src)
    cons = np.zeros((4 + (Ls + 1 if src else 0), len(dst)), np.uint32)
    S = 1
    for s in (src or ()):
        S *= s
    for j, q in enumerate(dst):
        ninv = int(_stage_tables(q, n)[2][0])
        s = 1 if scale is None else int(scale[j]) % q
        f = (ninv * ((1 << 32) % q) % q) * s % q
        cons[0, j] = q
        cons[1, j] = f
        cons[2, j] = (f << 32) // q
        cons[3, j] = _mont32_consts(q)[0]
        if src:
            for i, sp in enumerate(src):
                cons[4 + i, j] = ((S // sp) % q << 32) % q
            cons[4 + Ls, j] = (S % q << 32) % q
    return cons


def tensor_mul4_u32(x0, x1, y0, y1, dst: tuple, scale: tuple | None = None,
                    src: tuple | None = None,
                    interpret: bool | None = None):
    """Degree-2 tensor product from four SEPARATE operand arrays.

    src=None: operands are [Ld, ..., n] residues mod dst[j] (row j feeds
    prime j).  src=(...): operands are [Ls, ..., n] residues over the
    source basis and each dst-prime step extends them in-kernel (the
    unsigned HPS conversion — bfv_rns.fast_base_extend semantics) before
    transforming: the extended operands never exist in HBM.
    Returns [Ld, ..., 3, n] = scale * (x0·y0, x0·y1 + x1·y0, x1·y1)."""
    n = x0.shape[-1]
    Ld = len(dst)
    rows_in = x0.shape[0]
    assert rows_in == (Ld if src is None else len(src))
    assert n >= LANES and n % LANES == 0
    batch = x0.shape[1:-1]
    ins = [a.reshape((rows_in, -1, 1, n)).astype(jnp.uint32)
           for a in (x0, x1, y0, y1)]
    B = ins[0].shape[1]
    # extension variant holds all Ls rows of all 4 operands resident
    budget = (1 << 19) if src is None else (1 << 18)
    bb = max(1, min(B, budget // (4 * n * 4)))
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _tensor4_consts(dst, n, scale, src)
    tw = _tw_dev(dst, n, "both")
    logn = n.bit_length() - 1
    if src is None:
        him = snq = cfix = None
        x_spec = pl.BlockSpec((1, bb, 1, n),
                              lambda p, i, *_: (p, i, 0 * p, 0 * p))
    else:
        him = tuple((pow((int(np.prod(np.array(src, object))) // s) % s,
                         -1, s) << 32) % s for s in src)
        snq = tuple(_mont32_consts(s)[0] for s in src)
        cfix = tuple((1 << 59) // s for s in src)
        x_spec = pl.BlockSpec((rows_in, bb, 1, n),
                              lambda p, i, *_: (0 * p, i, 0 * p, 0 * p))
    kern = partial(_tensor4_kernel, n=n, bb=bb, src=src, him=him, snq=snq,
                   lazy=_lazy_ok(dst + (src or ())),
                   cfix=cfix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ld, B // bb),
        in_specs=[x_spec] * 4 + [
            pl.BlockSpec((1, 2, 2, logn, n),
                         lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, 3, n),
                               lambda p, i, *_: (p, i, 0 * p, 0 * p)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ld, B, 3, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), *ins, tw)
    return out.reshape((Ld,) + batch + (3, n))


# ---------------------------------------------------------------------------
# Eval-resident variants: ciphertexts that live in the NTT domain over BOTH
# RNS bases (models/bfv_rns.py CTE) skip the 4 forward transforms + operand
# extensions of every multiply (the production analog of the reference's
# lazy evals cache, arith/src/ring_nq.rs:19-27).  Three kernels:
#   * tensor_eval4_u32 — pointwise degree-2 products of eval-domain operands
#     + the 3 inverse chains + scale epilogue (tensor_mul4 minus forwards).
#   * ext_ntt_u32     — HPS base extension prologue + forward chains: coeff
#     residues over src become eval residues over dst in one pass.
#   * ks_fused_eval_u32 — the relinearization key switch emitting BOTH the
#     eval-domain result (contraction + NTT(adds), no inverse) and the
#     coeff-domain result (2 inverse chains), so the caller re-enters the
#     eval-resident representation for free.
# ---------------------------------------------------------------------------

def _tensor_eval_kernel(consts_ref, x0_ref, x1_ref, y0_ref, y1_ref, tw_ref,
                        o_ref, *, n, bb, lazy=False):
    j = pl.program_id(0)
    q = consts_ref[0, j]
    fin = consts_ref[1, j]
    fin_sh = consts_ref[2, j]
    nqinv = consts_ref[3, j]
    rows = n // LANES
    logn = n.bit_length() - 1
    x0 = x0_ref[...].reshape(bb, rows, LANES)
    x1 = x1_ref[...].reshape(bb, rows, LANES)
    y0 = y0_ref[...].reshape(bb, rows, LANES)
    y1 = y1_ref[...].reshape(bb, rows, LANES)
    p1 = _addmod_dyn(_mont_mul_dyn(x0, y1, q, nqinv),
                     _mont_mul_dyn(x1, y0, q, nqinv), q)
    x = jnp.stack([_mont_mul_dyn(x0, y0, q, nqinv), p1,
                   _mont_mul_dyn(x1, y1, q, nqinv)],
                  axis=1).reshape(3 * bb, rows, LANES)
    q2 = q + q
    for s in range(logn):                      # GS inverse, all 3 products
        t = 1 << s
        tw = tw_ref[0, 0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _inv_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        diff = _submod_dyn(y, x, q)
        x = jnp.where(first, _addmod_dyn(x, y, q),
                      _shoup_mul(diff, tw, twp, q))
    x = _shoup_mul(x, jnp.full_like(x, 1) * fin,
                   jnp.full_like(x, 1) * fin_sh, q)
    o_ref[...] = x.reshape(1, bb, 3, n)


def tensor_eval4_u32(x0, x1, y0, y1, dst: tuple, scale: tuple | None = None,
                     interpret: bool | None = None,
                     bb_override: int | None = None):
    """Degree-2 tensor product of EVAL-domain operands: x*, y* are
    [Ld, ..., n] canonical NTT-domain residues mod dst[j].  Returns
    [Ld, ..., 3, n] coefficient-domain scale*(x0y0, x0y1+x1y0, x1y1)."""
    n = x0.shape[-1]
    Ld = len(dst)
    assert x0.shape[0] == Ld and n >= LANES and n % LANES == 0
    batch = x0.shape[1:-1]
    ins = [a.reshape((Ld, -1, 1, n)).astype(jnp.uint32)
           for a in (x0, x1, y0, y1)]
    B = ins[0].shape[1]
    # 1 MB of operand rows per block (bb=4 at n=2^14) measured 23% faster
    # than 512 KB (bb=2) — only the inverse twiddle plane rides along, so
    # the VMEM stack has headroom the dual-plane kernels don't
    bb = bb_override or max(1, min(B, (1 << 20) // (4 * n * 4)))
    bb = min(bb, B)
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _tensor4_consts(dst, n, scale, None)
    tw = _tw_dev(dst, n, "invp")               # inverse plane only
    logn = n.bit_length() - 1
    kern = partial(_tensor_eval_kernel, n=n, bb=bb,
                   lazy=_lazy_ok(dst))
    x_spec = pl.BlockSpec((1, bb, 1, n), lambda p, i, *_: (p, i, 0 * p, 0 * p))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ld, B // bb),
        in_specs=[x_spec] * 4 + [
            pl.BlockSpec((1, 1, 2, logn, n),
                         lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, 3, n),
                               lambda p, i, *_: (p, i, 0 * p, 0 * p)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ld, B, 3, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), *ins, tw)
    return out.reshape((Ld,) + batch + (3, n))


def _ext_ntt_kernel(consts_ref, x_ref, tw_ref, o_ref, ys_ref, al_ref, *, n,
                    bb, P, src, lazy, him, snq, cfix):
    """Extend P coeff-domain polys (all Ls src rows resident) to dst prime j
    (unsigned HPS) and forward-transform them — one pass.

    Grid is (batch block MAJOR, dst prime MINOR): the dst-INDEPENDENT half
    of the extension (the y_i = x_i·[Qhat_i^-1] lifts and the α overflow
    estimate — ~40% of the kernel's non-NTT ALU work) is computed once per
    batch block at j == 0 and served from VMEM scratch for the remaining
    dst primes; the input block's index ignores j, so Pallas also skips its
    re-fetch on those steps (r4: this kernel measured 53% of the VPU op
    ceiling with the work recomputed per prime — the redundancy was the
    gap)."""
    j = pl.program_id(1)
    q = consts_ref[0, j]
    nqinv = consts_ref[3, j]
    rows = n // LANES
    logn = n.bit_length() - 1
    Ls = len(src)

    @pl.when(j == 0)
    def _prologue():
        xin = x_ref[...].reshape(Ls, bb * P, rows, LANES)
        tlo = None
        thi = None
        for i, s_p in enumerate(src):
            y = _mont_mul(xin[i], U32(int(him[i])), s_p, int(snq[i]))
            ys_ref[i] = y
            hi, lo = _mul32_wide(y, U32(int(cfix[i])))
            if tlo is None:
                tlo, thi = lo, hi
            else:
                nlo = tlo + lo
                thi = thi + hi + (nlo < lo).astype(U32)
                tlo = nlo
        al_ref[...] = thi >> U32(27)           # floor α, unsigned contract

    al = al_ref[...]
    acc = None
    for i in range(Ls):
        term = _mont_mul_dyn(ys_ref[i], consts_ref[4 + i, j], q, nqinv)
        acc = term if acc is None else _addmod_dyn(acc, term, q)
    corr = _mont_mul_dyn(al, consts_ref[4 + Ls, j], q, nqinv)
    x = _submod_dyn(acc, corr, q)              # [bb*P, rows, LANES]
    q2 = q + q
    for s in range(logn):                      # CT forward
        t = n >> (s + 1)
        tw = tw_ref[0, 0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _fwd_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        p = _shoup_mul(jnp.where(first, y, x), tw, twp, q)
        x = jnp.where(first, _addmod_dyn(x, p, q), _submod_dyn(y, p, q))
    if lazy:
        x = _norm2q(_norm2q(x, q2), q)         # canonical eval residues out
    o_ref[...] = x.reshape(1, bb, P, n)


def ext_ntt_u32(x, src: tuple, dst: tuple, interpret: bool | None = None,
                bb_override: int | None = None):
    """x: [Ls, ..., P, n] coeff-domain residues over src -> [Ld, ..., P, n]
    canonical EVAL-domain residues over dst (extension + forward NTT,
    one fused pass; the extended coefficients never exist in HBM)."""
    n = x.shape[-1]
    P = x.shape[-2]
    Ls, Ld = len(src), len(dst)
    assert x.shape[0] == Ls and n >= LANES and n % LANES == 0
    batch = x.shape[1:-2]
    xb = x.reshape((Ls, -1, P, n)).astype(jnp.uint32)
    B = xb.shape[1]
    bb = bb_override or max(1, min(B, (1 << 18) // (P * n * 4)))
    bb = min(bb, B)
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _tensor4_consts(dst, n, None, src)
    him = tuple((pow((int(np.prod(np.array(src, object))) // s) % s,
                     -1, s) << 32) % s for s in src)
    snq = tuple(_mont32_consts(s)[0] for s in src)
    cfix = tuple((1 << 59) // s for s in src)
    tw = _tw_dev(dst, n, "fwdp")               # forward plane only
    logn = n.bit_length() - 1
    kern = partial(_ext_ntt_kernel, n=n, bb=bb, P=P, src=src, him=him,
                   snq=snq, cfix=cfix,
                   lazy=_lazy_ok(dst))
    rows = n // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # batch MAJOR, dst prime MINOR: the x block ignores the prime index,
        # so its DMA is skipped for Ld-1 of every Ld steps, and the scratch-
        # cached extension prologue (see _ext_ntt_kernel) stays valid
        grid=(B // bb, Ld),
        in_specs=[
            pl.BlockSpec((Ls, bb, P, n),
                         lambda i, p, *_: (0 * p, i, 0 * p, 0 * p)),
            pl.BlockSpec((1, 1, 2, logn, n),
                         lambda i, p, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, P, n),
                               lambda i, p, *_: (p, i, 0 * p, 0 * p)),
        scratch_shapes=[
            pltpu.VMEM((Ls, bb * P, rows, LANES), jnp.uint32),
            pltpu.VMEM((bb * P, rows, LANES), jnp.uint32),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Ld, B, P, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), xb, tw)
    return out.reshape((Ld,) + batch + (P, n))


# ---------------------------------------------------------------------------
# Fused gadget key-switch contraction: the hot path of relinearization,
# hybrid key switching, and every Galois rotation (reference key_switch:
# gfhe/src/glwe.rs:126-137; relin: bfv/src/lib.rs:251-271).
#   fwd variant:   per-prime digit reduction (conditional subtracts) + R
#                  forward NTT chains + 2R key products + tree-sum + 2
#                  inverse chains, one VMEM pass — reads the R ciphertext
#                  limbs once, writes 2 outputs per prime.  (Unfused this is
#                  an XLA digit pass, an R*Lp-array NTT round trip, an XLA
#                  contraction, and an INTT round trip.)
#   hoisted variant: same minus digit/forward (input = Montgomery
#                  eval-domain digits shared across rotations, 2018/244 §5).
# ---------------------------------------------------------------------------

def _ks_kernel_multi(consts_ref, x_ref, tw_ref, kb_ref, ka_ref, o_ref,
                     *, n, R, bb, fwd, reps, lazy=False):
    q = consts_ref[0, pl.program_id(0)]
    fin = consts_ref[1, pl.program_id(0)]
    fin_sh = consts_ref[2, pl.program_id(0)]
    nqinv = consts_ref[3, pl.program_id(0)]
    rows = n // LANES
    logn = n.bit_length() - 1
    x = x_ref[...].reshape(bb * R, rows, LANES)
    q2 = q + q
    if fwd:
        for _ in range(reps):                  # limb residue -> mod q_j
            x = jnp.where(x >= q, x - q, x)
        for s in range(logn):                  # CT forward, all R rows
            t = n >> (s + 1)
            tw = tw_ref[0, 0, 0, s, :].reshape(1, rows, LANES)
            twp = tw_ref[0, 0, 1, s, :].reshape(1, rows, LANES)
            if lazy:
                x = _norm2q(x, q2)
                y = _swap_xor_t(x, t, rows)
                x = _fwd_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                    tw, twp, q, q2)
                continue
            y = _swap_xor_t(x, t, rows)
            first = _first_half_mask(x.shape, t)
            p = _shoup_mul(jnp.where(first, y, x), tw, twp, q)
            x = jnp.where(first, _addmod_dyn(x, p, q), _submod_dyn(y, p, q))
        if lazy:
            x = _norm2q(x, q2)     # [0, 2q): mont products stay 1-correction
    inv_pl = 1 if fwd else 0                   # hoisted passes inv table only
    xr = x.reshape(bb, R, rows, LANES)
    kb = jnp.broadcast_to(kb_ref[...].reshape(1, R, rows, LANES), xr.shape)
    ka = jnp.broadcast_to(ka_ref[...].reshape(1, R, rows, LANES), xr.shape)
    pb = _mont_mul_dyn(xr, kb, q, nqinv)
    pa = _mont_mul_dyn(xr, ka, q, nqinv)
    acc0, acc1 = pb[:, 0], pa[:, 0]
    for i in range(1, R):
        acc0 = _addmod_dyn(acc0, pb[:, i], q)
        acc1 = _addmod_dyn(acc1, pa[:, i], q)
    x = jnp.stack([acc0, acc1], axis=1).reshape(bb * 2, rows, LANES)
    for s in range(logn):                      # GS inverse on both outputs
        t = 1 << s
        tw = tw_ref[0, inv_pl, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, inv_pl, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _inv_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        diff = _submod_dyn(y, x, q)
        x = jnp.where(first, _addmod_dyn(x, y, q),
                      _shoup_mul(diff, tw, twp, q))
    x = _shoup_mul(x, jnp.full_like(x, 1) * fin,
                   jnp.full_like(x, 1) * fin_sh, q)
    o_ref[...] = x.reshape(1, bb, 2, n)


@lru_cache(maxsize=None)
def _ks_consts(qs: tuple, n: int, fwd: bool):
    cons = np.zeros((4, len(qs)), np.uint32)
    for i, q in enumerate(qs):
        ninv = int(_stage_tables(q, n)[2][0])
        # fwd: in-kernel products are x*k*R^-1 -> fold R back in.
        # hoisted: digits arrive Montgomery-lifted -> products are plain x*k.
        f = ninv * ((1 << 32) % q) % q if fwd else ninv
        cons[0, i] = q
        cons[1, i] = f
        cons[2, i] = (f << 32) // q
        cons[3, i] = _mont32_consts(q)[0]
    return cons


def _ks_call(xb, kbT, kaT, primes, fwd, reps, interpret):
    """Shared pallas_call plumbing.  xb: [B, R, n] (fwd) or [Lp, B, R, n]
    (hoisted); kbT/kaT: [Lp, R, n].  Returns [Lp, B, 2, n] u32.
    (The in-kernel add-epilogue variant measured ~100x slower end-to-end
    on v5e and was deleted — BENCH.md post-mortem.)"""
    R = xb.shape[-2]
    n = xb.shape[-1]
    Lp = len(primes)
    B = xb.shape[-3]
    # same scoped-vmem model as tensor_mul_u32: 512 KB of input rows per
    # block (the kernel holds ~3 live copies of the bb*R row set around the
    # contraction, next to the twiddle block)
    bb = max(1, min(B, (1 << 19) // (R * n * 4)))
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _ks_consts(primes, n, fwd)
    tw = _tw_dev(primes, n, "both" if fwd else "invp")
    ntw = 2 if fwd else 1
    logn = n.bit_length() - 1
    kern = partial(_ks_kernel_multi, n=n, R=R, bb=bb, fwd=fwd, reps=reps,
                   lazy=_lazy_ok(primes))
    if fwd:
        x_spec = pl.BlockSpec((bb, R, n), lambda p, i, *_: (i, 0 * p, 0 * p))
    else:
        x_spec = pl.BlockSpec((1, bb, R, n),
                              lambda p, i, *_: (p, i, 0 * p, 0 * p))
    in_specs = [
        x_spec,
        pl.BlockSpec((1, ntw, 2, logn, n),
                     lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
        pl.BlockSpec((1, R, n), lambda p, i, *_: (p, 0 * p, 0 * p)),
        pl.BlockSpec((1, R, n), lambda p, i, *_: (p, 0 * p, 0 * p)),
    ]
    args = [_dev(cons), xb, tw,
            kbT.astype(jnp.uint32), kaT.astype(jnp.uint32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Lp, B // bb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bb, 2, n),
                               lambda p, i, *_: (p, i, 0 * p, 0 * p)),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Lp, B, 2, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*args)


def ks_fused_u32(c_limbs, kb, ka, primes: tuple, src_primes: tuple,
                 interpret: bool | None = None):
    """c_limbs: [R, ..., n] limb residues (row i < src_primes[i]); kb/ka:
    [R, Lp, n] eval-domain gadget keys mod primes[j].  Returns
    (r0, r1), each [Lp, ..., n] coeff-domain: r = sum_i [c_i]_{p_j} * k_ij.

    """
    R = c_limbs.shape[0]
    n = c_limbs.shape[-1]
    Lp = len(primes)
    assert kb.shape == ka.shape == (R, Lp, n)
    batch = c_limbs.shape[1:-1]
    xb = jnp.moveaxis(c_limbs.reshape((R, -1, n)), 0, 1).astype(jnp.uint32)
    reps = (max(src_primes) - 1) // min(primes) + 1
    out = _ks_call(xb, jnp.moveaxis(kb, 0, 1), jnp.moveaxis(ka, 0, 1),
                   primes, True, reps, interpret)
    r = out.reshape((Lp,) + batch + (2, n))
    return r[..., 0, :], r[..., 1, :]


def _ks_eval_kernel(consts_ref, x_ref, tw_ref, kb_ref, ka_ref, a_ref, o_ref,
                    *, n, R, bb, reps, lazy=False):
    """Relinearization step for EVAL-RESIDENT ciphertexts: digit reduction,
    forward NTT of the R digit rows AND the two add operands (c0, c1), key
    contraction, eval-domain adds, and the 2 inverse chains — emits the
    result in BOTH domains: rows (e0, e1, c0', c1')."""
    q = consts_ref[0, pl.program_id(0)]
    fin = consts_ref[1, pl.program_id(0)]      # plain n^-1 (R folded below)
    fin_sh = consts_ref[2, pl.program_id(0)]
    nqinv = consts_ref[3, pl.program_id(0)]
    rl = consts_ref[4, pl.program_id(0)]       # 2^32 mod q: re-lifts the
    rl_sh = consts_ref[5, pl.program_id(0)]    # x*k*R^-1 contraction
    rows = n // LANES
    logn = n.bit_length() - 1
    x = x_ref[...].reshape(bb * R, rows, LANES)
    for _ in range(reps):                      # limb residue -> mod q_j
        x = jnp.where(x >= q, x - q, x)
    a = a_ref[...].reshape(bb * 2, rows, LANES)
    x = jnp.concatenate([x, a], 0)             # digits + adds, one fwd pass
    q2 = q + q
    for s in range(logn):
        t = n >> (s + 1)
        tw = tw_ref[0, 0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _fwd_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        p = _shoup_mul(jnp.where(first, y, x), tw, twp, q)
        x = jnp.where(first, _addmod_dyn(x, p, q), _submod_dyn(y, p, q))
    if lazy:
        x = _norm2q(x, q2)         # [0, 2q): mont operands one-correction
    xr = x[: bb * R].reshape(bb, R, rows, LANES)
    ea = x[bb * R:].reshape(bb, 2, rows, LANES)
    if lazy:                       # eval-domain adds must be canonical
        ea = jnp.where(ea >= q, ea - q, ea)
    kb = jnp.broadcast_to(kb_ref[...].reshape(1, R, rows, LANES), xr.shape)
    ka = jnp.broadcast_to(ka_ref[...].reshape(1, R, rows, LANES), xr.shape)
    pb = _mont_mul_dyn(xr, kb, q, nqinv)
    pa = _mont_mul_dyn(xr, ka, q, nqinv)
    acc0, acc1 = pb[:, 0], pa[:, 0]
    for i in range(1, R):
        acc0 = _addmod_dyn(acc0, pb[:, i], q)
        acc1 = _addmod_dyn(acc1, pa[:, i], q)
    # eval-domain result: re-lift the Montgomery contraction and add NTT(c)
    e0 = _addmod_dyn(_shoup_mul(acc0, jnp.full_like(acc0, 1) * rl,
                                jnp.full_like(acc0, 1) * rl_sh, q),
                     ea[:, 0], q)
    e1 = _addmod_dyn(_shoup_mul(acc1, jnp.full_like(acc1, 1) * rl,
                                jnp.full_like(acc1, 1) * rl_sh, q),
                     ea[:, 1], q)
    x = jnp.stack([e0, e1], axis=1).reshape(bb * 2, rows, LANES)
    for s in range(logn):                      # GS inverse -> coeff result
        t = 1 << s
        tw = tw_ref[0, 1, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[0, 1, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            x = _inv_stage_lazy(x, y, _first_half_mask(x.shape, t),
                                tw, twp, q, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        diff = _submod_dyn(y, x, q)
        x = jnp.where(first, _addmod_dyn(x, y, q),
                      _shoup_mul(diff, tw, twp, q))
    x = _shoup_mul(x, jnp.full_like(x, 1) * fin,
                   jnp.full_like(x, 1) * fin_sh, q)
    out = jnp.concatenate([jnp.stack([e0, e1], 1), x.reshape(bb, 2, rows, LANES)],
                          1)
    o_ref[...] = out.reshape(1, bb, 4, n)


@lru_cache(maxsize=None)
def _ks_eval_consts(qs: tuple, n: int):
    cons = np.zeros((6, len(qs)), np.uint32)
    for i, q in enumerate(qs):
        ninv = int(_stage_tables(q, n)[2][0])
        r = (1 << 32) % q
        cons[0, i] = q
        cons[1, i] = ninv                      # plain: R folded via rows 4/5
        cons[2, i] = (ninv << 32) // q
        cons[3, i] = _mont32_consts(q)[0]
        cons[4, i] = r
        cons[5, i] = (r << 32) // q
    return cons


def ks_fused_eval_u32(c_limbs, kb, ka, primes: tuple, src_primes: tuple,
                      adds, interpret: bool | None = None,
                      bb_override: int | None = None):
    """Eval-resident relinearization: c_limbs [R, ..., n] digit residues,
    kb/ka [R, Lp, n] eval-domain keys, adds=(c0, c1) coeff-domain
    [Lp, ..., n].  Returns (e0, e1, r0, r1), each [Lp, ..., n]:
    e = NTT(c) + sum_i NTT(d_i)*k_i (eval domain), r = INTT(e) (coeff)."""
    R = c_limbs.shape[0]
    n = c_limbs.shape[-1]
    Lp = len(primes)
    assert kb.shape == ka.shape == (R, Lp, n)
    batch = c_limbs.shape[1:-1]
    xb = jnp.moveaxis(c_limbs.reshape((R, -1, n)), 0, 1).astype(jnp.uint32)
    B = xb.shape[0]
    av = jnp.stack([a.reshape((Lp, -1, n)) for a in adds], 2
                   ).astype(jnp.uint32)        # [Lp, B, 2, n]
    reps = (max(src_primes) - 1) // min(primes) + 1
    # NB: bb=8 measured ~10% faster on contiguous operands but CRASHES the
    # Mosaic compiler when the digit operand is a strided slice (the mul_e
    # call site passes out3[..., 2, :]); stay at 512 KB until root-caused
    bb = bb_override or max(1, min(B, (1 << 19) // (R * n * 4)))
    bb = min(bb, B)
    while B % bb:
        bb -= 1
    if interpret is None:
        interpret = not _on_tpu()
    cons = _ks_eval_consts(primes, n)
    tw = _tw_dev(primes, n, "both")
    logn = n.bit_length() - 1
    kern = partial(_ks_eval_kernel, n=n, R=R, bb=bb, reps=reps,
                   lazy=_lazy_ok(primes))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Lp, B // bb),
        in_specs=[
            pl.BlockSpec((bb, R, n), lambda p, i, *_: (i, 0 * p, 0 * p)),
            pl.BlockSpec((1, 2, 2, logn, n),
                         lambda p, i, *_: (p, 0 * p, 0 * p, 0 * p, 0 * p)),
            pl.BlockSpec((1, R, n), lambda p, i, *_: (p, 0 * p, 0 * p)),
            pl.BlockSpec((1, R, n), lambda p, i, *_: (p, 0 * p, 0 * p)),
            pl.BlockSpec((1, bb, 2, n), lambda p, i, *_: (p, i, 0 * p, 0 * p)),
        ],
        out_specs=pl.BlockSpec((1, bb, 4, n),
                               lambda p, i, *_: (p, i, 0 * p, 0 * p)),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Lp, B, 4, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(_dev(cons), xb, tw,
      jnp.moveaxis(kb, 0, 1).astype(jnp.uint32),
      jnp.moveaxis(ka, 0, 1).astype(jnp.uint32), av)
    r = out.reshape((Lp,) + batch + (4, n))
    return (r[..., 0, :], r[..., 1, :], r[..., 2, :], r[..., 3, :])


def ks_contract_u32(edm, kb, ka, primes: tuple,
                    interpret: bool | None = None):
    """Hoisted variant: edm [R, Lp, ..., n] MONTGOMERY eval-domain digits
    (hoist_digits output).  Same return contract as ks_fused_u32."""
    R, Lp = edm.shape[0], edm.shape[1]
    n = edm.shape[-1]
    assert Lp == len(primes) and kb.shape == ka.shape == (R, Lp, n)
    batch = edm.shape[2:-1]
    xb = jnp.transpose(edm.reshape((R, Lp, -1, n)),
                       (1, 2, 0, 3)).astype(jnp.uint32)   # [Lp, B, R, n]
    out = _ks_call(xb, jnp.moveaxis(kb, 0, 1), jnp.moveaxis(ka, 0, 1),
                   primes, False, 0, interpret)
    r = out.reshape((Lp,) + batch + (2, n))
    return r[..., 0, :], r[..., 1, :]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def ntt_u32(x, q: int, inverse: bool = False, block_b: int | None = None,
            interpret: bool | None = None):
    """Negacyclic NTT/INTT of u64-or-u32 [..., n] (values < q < 2^31) through
    the fused Pallas kernel.  Returns the same dtype as the input."""
    assert q < (1 << 31)
    n = x.shape[-1]
    assert n >= LANES and n % LANES == 0
    orig_dtype = x.dtype
    batch = x.shape[:-1]
    xb = x.reshape((-1, n)).astype(jnp.uint32)
    B0 = xb.shape[0]
    pad = (-B0) % 8 if B0 > 1 else 0   # see ntt_multi_u32: 8-divisible blocks
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    B = B0 + pad
    if block_b is None:
        # ~1MB data tile: the fused stage chain holds several temporaries per
        # stage in scoped VMEM; bigger tiles OOM Mosaic's vmem stack
        block_b = max(1, min(B, (1 << 20) // (n * 4)))
    while B % block_b or (block_b % 8 and block_b != B):
        block_b -= 1
    if interpret is None:
        interpret = not _on_tpu()
    out = _build_call(q, n, inverse, block_b, interpret)(xb)
    if pad:
        out = out[:B0]
    return out.reshape(batch + (n,)).astype(orig_dtype)
