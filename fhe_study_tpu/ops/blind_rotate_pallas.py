"""The whole TFHE blind rotation as ONE Pallas TPU kernel.

The reference's blind rotation (tfhe/src/tlwe.rs:121-148, with the corrected
full CMux chain — see SURVEY §2.5) is a strictly sequential loop over the
k·N LWE key bits: acc <- CMux(BSK_j, acc, acc·X^{-(2N - a'_j)}).  Run as a
`lax.scan` of XLA ops (models/tfhe/bootstrap.py), every step pays kernel
dispatch + HBM round trips for arrays that are only a few hundred KB — the
measured step cost is ~300 µs against ~9 µs of butterfly math.

This kernel runs the ENTIRE chain in one launch:
  * grid = (k·N,) sequential steps; the accumulator (u64 torus as two u32
    limb planes) lives in VMEM scratch across all steps,
  * the per-step TGGSW slice of the Fourier-domain bootstrapping key
    (Montgomery-lifted CRT-NTT residues, models/tfhe/tggsw.py
    precompute_evals) streams HBM -> VMEM through the normal Pallas
    pipeline (double-buffered),
  * per step, fully in VMEM: dynamic negacyclic rotation (lane-axis
    `pltpu.roll` + an 8-way static sublane-roll select), wrapping u64
    subtract, base-2^w gadget decomposition (arith/tn.py
    decompose_base_pow2 semantics), forward NTT of the (K+1)·l digit polys
    under BOTH CRT primes, the Montgomery key contraction, two inverse
    NTTs, exact CRT recombination mod 2^64 (bit-identical to
    tggsw.external_product_evals), and the wrapping accumulator add.

Bit-exactness: every sub-step reproduces the arithmetic of the XLA path
(models/tfhe/{bootstrap,tggsw}.py, arith/tn.py), so the fused chain is
bit-identical to `blind_rotation(..., fast=True)` — asserted by
tests/test_bootstrap.py against the scan path.
"""

import os as _os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt as ntt_mod
from .ntt_pallas import (LANES, U32, _mont32_consts, _stage_tables,
                         _mont_mul, _shoup_mul, _shoup_mul_lazy, _addmod,
                         _submod, _roll, _swap_xor_t, _first_half_mask,
                         _on_tpu, _norm2q, _fwd_stage_lazy, _inv_stage_lazy,
                         _lazy_ok)

I32 = jnp.int32


# ---------------------------------------------------------------------------
# in-kernel u64 arithmetic on (lo, hi) u32 limb pairs (wrapping, as the
# torus q = 2^64 demands — reference arith/src/torus.rs:80-153)
# ---------------------------------------------------------------------------

def _add64(al, ah, bl, bh):
    lo = al + bl
    carry = (lo < bl).astype(U32)
    return lo, ah + bh + carry


def _sub64(al, ah, bl, bh):
    lo = al - bl
    borrow = (al < bl).astype(U32)
    return lo, ah - bh - borrow


def _neg64(lo, hi):
    return U32(0) - lo, (U32(0) - hi) - (lo != U32(0)).astype(U32)


def _mul32_wide_pair(a, b):
    """32x32 -> (lo, hi) u32 pair (duplicates ntt_pallas._mul32_wide but
    returns (lo, hi) order)."""
    mask = U32(0xFFFF)
    a0, a1 = a & mask, a >> U32(16)
    b0, b1 = b & mask, b >> U32(16)
    p00, p01, p10, p11 = a0 * b0, a0 * b1, a1 * b0, a1 * b1
    mid = (p00 >> U32(16)) + (p01 & mask) + (p10 & mask)
    lo = (mid << U32(16)) | (p00 & mask)
    hi = p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (mid >> U32(16))
    return lo, hi


# ---------------------------------------------------------------------------
# in-kernel pieces
# ---------------------------------------------------------------------------

def _rotate_neg_batch(z1, h, negall, n, rows):
    """Negacyclic X^{-h} rotation, batched sublane phase.

    z1: [B, P, rows, LANES] u32 planes ALREADY lane-rolled by each batch
    element's own hc (the lane roll needs a scalar shift, so the caller
    does it per-b with `pltpu.roll`; it is native and cheap).  h/negall:
    [B, 1, 1, 1] traced vectors.  The sublane phase — the expensive part —
    runs ONCE over the whole stacked tile: a rows-way select over static
    rolls builds r1 = z1[(r + hr) % rows], and r2 (the hr+1 companion for
    lanes that wrapped) is just r1 rolled one more row — one extra static
    roll instead of a second rows-way select.

    Returns (rotated, flip_mask): out[j] = x[(j + h) mod n], flip where
    (j + h) >= n, XOR negall (arith/tn.py left_rotate semantics,
    ring_torus.rs:118-132)."""
    hr = jax.lax.div(h, I32(LANES))
    hc = jax.lax.rem(h, I32(LANES))
    r1 = jnp.zeros_like(z1)
    for k in range(rows):
        r1 = jnp.where(hr == k, _roll(z1, -k, 2), r1)
    r2 = _roll(r1, -1, 2)                   # z1[(r + hr + 1) % rows]
    lane = jax.lax.broadcasted_iota(I32, z1.shape, 3)
    rot = jnp.where(lane + hc < I32(LANES), r1, r2)
    rowi = jax.lax.broadcasted_iota(I32, z1.shape, 2)
    flat = rowi * I32(LANES) + lane
    flip = (flat >= I32(n) - h) != negall
    return rot, flip


def _fwd_ntt(x, q, tw_ref, pidx, logn, rows, lazy):
    """CT forward stages, static modulus q (plain/Shoup domain).

    lazy (q < 2^30, ntt_pallas._lazy_ok): Harvey lazy butterflies — one
    [0,4q)→[0,2q) norm per stage instead of three per-op compare-selects;
    the output rides in [0, 4q) and the downstream contraction's
    `_shoup_mul` (any-u32-input, fully reducing) collapses it for free."""
    qq, q2 = U32(q), U32(2 * q)
    for s in range(logn):
        t = (1 << logn) >> (s + 1)
        tw = tw_ref[pidx, 0, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[pidx, 0, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            first = _first_half_mask(x.shape, t)
            x = _fwd_stage_lazy(x, y, first, tw, twp, qq, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        p = _shoup_mul(jnp.where(first, y, x), tw, twp, qq)
        x = jnp.where(first, _addmod(x, p, q), _submod(y, p, q))
    return x


def _inv_ntt(x, q, tw_ref, pidx, logn, rows, ninv_pair, lazy):
    """GS inverse stages + n^{-1} epilogue, static modulus q.  The lazy
    [0, 4q) residue is fully reduced by the epilogue's `_shoup_mul`."""
    qq, q2 = U32(q), U32(2 * q)
    for s in range(logn):
        t = 1 << s
        tw = tw_ref[pidx, 1, 0, s, :].reshape(1, rows, LANES)
        twp = tw_ref[pidx, 1, 1, s, :].reshape(1, rows, LANES)
        if lazy:
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            first = _first_half_mask(x.shape, t)
            x = _inv_stage_lazy(x, y, first, tw, twp, qq, q2)
            continue
        y = _swap_xor_t(x, t, rows)
        first = _first_half_mask(x.shape, t)
        diff = _submod(y, x, q)
        x = jnp.where(first, _addmod(x, y, q),
                      _shoup_mul(diff, tw, twp, qq))
    return _shoup_mul(x, jnp.full_like(x, ninv_pair[0]),
                      jnp.full_like(x, ninv_pair[1]), qq)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _br_kernel(shift_ref, acc0_ref, tw_ref, ev1_ref, ev1s_ref, ev2_ref,
               ev2s_ref, o_ref, acc_ref, *, n, B, C, w, l, kn, pq, crt,
               lazy, U=1, roll_mode="perb"):
    """One grid step = U consecutive CMux links of the blind-rotation chain.
    Grid is (batch blocks, kn // U): j (minor) walks the chain, ib picks the
    batch tile whose accumulator currently lives in scratch.  B = the tile
    size.  U > 1 (FHE_BR_UNROLL) carries the accumulator in REGISTERS across
    the unrolled links (skipping U-1 scratch round trips per grid step) and
    amortizes the per-step grid/DMA fixed cost."""
    ib = pl.program_id(0)
    j = pl.program_id(1)
    rows = n // LANES
    logn = n.bit_length() - 1
    p1, p2 = pq
    nq1 = _mont32_consts(p1)[0]
    nq2 = _mont32_consts(p2)[0]

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = acc0_ref[...].reshape(B, C, 2, rows, LANES)

    acc = acc_ref[...]                       # [B, C, 2, rows, LANES]
    ev1u = ev1_ref[...].reshape(U, C, l, C, 2, rows * LANES)
    ev1su = ev1s_ref[...].reshape(U, C, l, C, 2, rows * LANES)
    ev2u = ev2_ref[...].reshape(U, C, l, C, 2, rows * LANES)
    ev2su = ev2s_ref[...].reshape(U, C, l, C, 2, rows * LANES)
    for u in range(U):
        acc = _br_one_step(
            shift_ref, tw_ref, acc, j * U + u, ib,
            ev1u[u], ev1su[u], ev2u[u], ev2su[u],
            n=n, B=B, C=C, w=w, l=l, pq=pq, crt=crt, lazy=lazy,
            nq1=nq1, nq2=nq2, roll_mode=roll_mode)
    acc_ref[...] = acc

    @pl.when(j == (kn // U) - 1)
    def _out():
        o_ref[...] = acc.reshape(B, C, 2, n)


def _br_one_step(shift_ref, tw_ref, acc, jj, ib, ev1b, ev1sb, ev2b, ev2sb,
                 *, n, B, C, w, l, pq, crt, lazy, nq1, nq2, roll_mode="perb"):
    """One CMux link on a register-resident accumulator.  jj: traced chain
    index (SMEM shift lookup); ev*b: this link's BSK slice
    [C, l, C, 2, rows*LANES]."""
    rows = n // LANES
    logn = n.bit_length() - 1
    p1, p2 = pq

    # ---- rot = acc * X^{-(2n - a'_j)} (per-batch dynamic amounts) --------
    hs, negs = [], []
    for b in range(B):
        h2 = shift_ref[jj, ib * B + b]       # whole [kn, Btot] table in SMEM
        negall = h2 >= I32(n)
        h = jnp.where(negall, h2 - I32(n), h2)
        hs.append(h)
        negs.append(negall)
    # NB: broadcast_to + concat, NOT stack(scalars).reshape — a 1-D -> 4-D
    # shape cast of an SMEM-scalar vector fails Mosaic layout inference
    # ("infer-vector-layout: unsupported shape cast").  Lane-wide (LANES)
    # from the start: a later [B,1,1,1] -> [B,P,rows,LANES] broadcast is
    # "Broadcast in both sublanes and lanes", which Mosaic rejects —
    # pre-filling the lane axis leaves only the supported sublane side.
    hv = jnp.concatenate(
        [jnp.broadcast_to(h, (1, 1, 1, LANES)) for h in hs], 0)
    negv = jnp.concatenate(
        [jnp.broadcast_to(g, (1, 1, 1, LANES)) for g in negs], 0)
    if roll_mode == "barrel":
        # BATCHED lane phase (r5, VERDICT r4 #2): one log2(LANES)-stage
        # barrel shifter over the whole [B, C*2, rows, LANES] tile replaces
        # the B sequential scalar `pltpu.roll` calls — each stage is a
        # static roll + a per-batch-row select, so the rotation work is
        # 7 full-tile ops instead of B serialized small ones.
        # z1[lane] = acc[(lane + hc) % LANES], identical to the perb path.
        hcv = jax.lax.rem(hv, I32(LANES))    # [B, 1, 1, LANES]
        z1 = acc.reshape(B, C * 2, rows, LANES)
        for k in range(LANES.bit_length() - 1):
            rolled = _roll(z1, -(1 << k), 3)
            z1 = jnp.where(((hcv >> I32(k)) & I32(1)) == I32(1), rolled, z1)
    else:
        z1s = []
        for b, h in enumerate(hs):
            hc = jax.lax.rem(h, I32(LANES))
            sh = jnp.where(hc == 0, I32(0), I32(LANES) - hc)
            # lane roll per b (scalar shift required); sublane phase batched
            z1s.append(pltpu.roll(acc[b].reshape(C * 2, rows, LANES), sh, 2))
        z1 = jnp.stack(z1s)                  # [B, C*2, rows, LANES]
    rot, flipf = _rotate_neg_batch(z1, hv, negv, n, rows)
    rot = rot.reshape(B, C, 2, rows, LANES)
    flip = flipf[:, :1]                      # [B, 1, rows, LANES] all planes
    rl, rh = rot[:, :, 0], rot[:, :, 1]
    nl, nh = _neg64(rl, rh)
    rl = jnp.where(flip, nl, rl)
    rh = jnp.where(flip, nh, rh)

    # ---- diff = rot - acc (wrapping u64) ---------------------------------
    dl, dh = _sub64(rl, rh, acc[:, :, 0], acc[:, :, 1])

    # ---- gadget digits, base 2^w MSB-first (arith/tn.py) -----------------
    mask = U32((1 << w) - 1)
    digs = []
    for i in range(l):
        s = 64 - w * (i + 1)
        if s >= 32:
            d = (dh >> U32(s - 32)) & mask
        elif s == 0:
            d = dl & mask
        else:
            d = ((dh << U32(32 - s)) | (dl >> U32(s))) & mask
        digs.append(d)                       # [B, C, rows, LANES]
    xd = jnp.stack(digs, 2)                  # [B, C, l, rows, LANES]
    xf = xd.reshape(B * C * l, rows, LANES)  # digits < 2^w <= min(pq)

    # ---- per prime: forward NTT + Shoup key contraction -------------------
    # (keys are PLAIN eval-domain values with precomputed Shoup companions:
    # one wide-high + two low muls per product vs Montgomery's two wide
    # muls — the contraction is the dominant non-butterfly VPU work)
    ev = (ev1b, ev2b)
    evsh = (ev1sb, ev2sb)
    qs = (p1, p2)
    nqs = (nq1, nq2)
    outs = []                                # per prime: [B, C, 2, rows, LANES]
    for pidx in range(2):
        q, nq = qs[pidx], nqs[pidx]
        e = _fwd_ntt(xf, q, tw_ref, pidx, logn, rows, lazy)
        e = e.reshape(B, C, l, rows, LANES)
        evp = ev[pidx].reshape(C, l, C, 2, rows, LANES)
        evps = evsh[pidx].reshape(C, l, C, 2, rows, LANES)
        # lazy contraction: products stay in [0, 2q) (no per-product
        # correction); running sum re-normalized [0,4q)->[0,2q) after each
        # add EXCEPT the last — the inverse NTT's lazy stage-entry norm (or
        # its fully-reducing epilogue) absorbs the final [0, 4q) residue.
        q2 = U32(2 * q)
        cols = []
        for c in range(C):
            for limb in range(2):
                s = None
                for r in range(C):
                    for i in range(l):
                        if lazy:
                            p = _shoup_mul_lazy(e[:, r, i],
                                                evp[r, i, c, limb][None],
                                                evps[r, i, c, limb][None],
                                                U32(q))
                            if s is None:
                                s = p
                            else:
                                last = (r == C - 1) and (i == l - 1)
                                s = s + p if last else _norm2q(s + p, q2)
                        else:
                            p = _shoup_mul(e[:, r, i],
                                           evp[r, i, c, limb][None],
                                           evps[r, i, c, limb][None], U32(q))
                            s = p if s is None else _addmod(s, p, q)
                cols.append(s)               # [B, rows, LANES]
        st = jnp.stack(cols, 1)              # [B, C*2, rows, LANES]
        ninv = _stage_tables(q, n)[2]
        iv = _inv_ntt(st.reshape(B * C * 2, rows, LANES), q, tw_ref, pidx,
                      logn, rows, (int(ninv[0]), int(ninv[1])), lazy)
        outs.append(iv.reshape(B, C, 2, rows, LANES))

    # ---- exact CRT recombination mod 2^64 (tggsw.py:206-216) -------------
    r1, r2 = outs
    p1u = U32(p1)
    p2u = U32(p2)
    r1p2 = jnp.where(r1 >= p2u, r1 - p2u, r1)          # p1 < 2*p2
    d12 = _submod(r2, r1p2, p2)
    dm = _mont_mul(d12, jnp.full_like(d12, crt["inv_lift"]), p2, nq2)
    glo, ghi = _mul32_wide_pair(dm, p1u)               # p1 * dm
    glo2 = glo + r1
    ghi2 = ghi + (glo2 < r1).astype(U32)               # gk = r1 + p1*dm
    gt = (ghi2 > U32(crt["half_hi"])) | (
        (ghi2 == U32(crt["half_hi"])) & (glo2 > U32(crt["half_lo"])))
    sl, sh = _sub64(glo2, ghi2, jnp.full_like(glo2, crt["m_lo"]),
                    jnp.full_like(ghi2, crt["m_hi"]))
    glo2 = jnp.where(gt, sl, glo2)
    ghi2 = jnp.where(gt, sh, ghi2)
    # value = gk[limb0] + (gk[limb1] << 32) mod 2^64
    f_lo = glo2[:, :, 0]
    f_hi = ghi2[:, :, 0] + glo2[:, :, 1]

    # ---- acc <- acc + external_product (the CMux add) --------------------
    al, ah = _add64(acc[:, :, 0], acc[:, :, 1], f_lo, f_hi)
    return jnp.stack([al, ah], 2)            # [B, C, 2, rows, LANES]


@lru_cache(maxsize=None)
def _crt_consts():
    p1, p2 = ntt_mod.CRT_PRIMES_TFHE
    m12 = p1 * p2
    inv = pow(p1, -1, p2)
    return {
        "inv_lift": int((inv << 32) % p2),   # Montgomery-lifted p1^{-1} mod p2
        "m_lo": int(m12 & 0xFFFFFFFF),
        "m_hi": int(m12 >> 32),
        "half_lo": int((m12 // 2) & 0xFFFFFFFF),
        "half_hi": int((m12 // 2) >> 32),
    }


@lru_cache(maxsize=None)
def _br_tw(n: int):
    """[2 primes, 2 fwd/inv, 2 w/shoup, logn, n] twiddle stack."""
    p1, p2 = ntt_mod.CRT_PRIMES_TFHE
    return np.stack([np.stack(_stage_tables(q, n)[:2]) for q in (p1, p2)])


def supported(param, beta: int, l: int) -> bool:
    """Static conditions under which the fused chain applies."""
    n = param.ring.n
    p1, p2 = ntt_mod.CRT_PRIMES_TFHE
    w = beta.bit_length() - 1
    return (n >= LANES and n % LANES == 0 and (n & (n - 1)) == 0
            and beta == (1 << w) and w * l <= 64 and beta <= min(p1, p2)
            and (param.k + 1) * l * n * beta < (1 << 26)
            # negacyclic NTT needs a primitive 2n-th root: 2n | p-1 for both
            # primes (998244353 admits n <= 2^22, 754974721 n <= 2^23) —
            # without this a large-n config passes the capacity gate only to
            # trip get_plan's "not NTT-friendly" assert instead of falling
            # back to the scan path
            and all((p - 1) % (2 * n) == 0 for p in (p1, p2))
            and (n // LANES) >= 1)


def blind_rotate_fused(shifts, acc0, ev1, ev1s, ev2, ev2s, n: int, w: int,
                       interpret=None, bb_override: int | None = None):
    """Run the full CMux chain in one kernel launch.

    shifts: [kn, B] int32, step-j rotation amounts (2N - a'_j) mod 2N.
    acc0:   [B, C, N] uint64 initial accumulator (table pre-rotated by b').
    ev1/ev2: [kn, C, l, C, 2, N] uint32 PLAIN eval-domain BSK with
    ev1s/ev2s their Shoup companion planes (tggsw.precompute_evals).
    w = log2(beta) digit width.  Returns [B, C, N] uint64."""
    kn, B = shifts.shape
    C = acc0.shape[1]
    l = ev1.shape[2]
    assert acc0.shape == (B, C, n), (acc0.shape, (B, C, n))
    assert ev1.shape == (kn, C, l, C, 2, n), ev1.shape
    if interpret is None:
        interpret = not _on_tpu()
    pq = ntt_mod.CRT_PRIMES_TFHE
    logn = n.bit_length() - 1
    a0 = jnp.stack([(acc0 & jnp.uint64(0xFFFFFFFF)).astype(U32),
                    (acc0 >> jnp.uint64(32)).astype(U32)], 2)  # [B, C, 2, n]
    tw = jnp.asarray(_br_tw(n))
    # batch tile: the per-step working set (digit planes + ~3 live stage
    # temporaries per prime) scales with bb*C*l*n — 768 KB of digit rows
    # measured safe next to the 655 KB twiddle + 786 KB BSK blocks
    try:
        bb_env = int(_os.environ.get("FHE_BR_BB", "0"))
    except ValueError:
        bb_env = 0                       # malformed override: fall back
    bb = (bb_override or bb_env
          or max(1, min(B, (768 * 1024) // (C * l * n * 4))))
    bb = max(1, min(B, bb))              # clamp overrides into [1, B]
    while B % bb:
        bb -= 1
    try:
        U = int(_os.environ.get("FHE_BR_UNROLL", "1"))
    except ValueError:
        U = 1
    U = max(1, min(kn, U))
    while kn % U:
        U -= 1                           # U must divide the chain length
    # FHE_BR_ROLL=barrel: batched barrel-shifter lane rotation (A/B vs the
    # per-batch-element pltpu.roll default; bit-exact either way)
    roll_mode = _os.environ.get("FHE_BR_ROLL", "perb")
    kern = partial(_br_kernel, n=n, B=bb, C=C, w=w, l=l, kn=kn, pq=pq,
                   crt=_crt_consts(), lazy=_lazy_ok(pq), U=U,
                   roll_mode=roll_mode)
    # NB index maps: every constant is written 0*j — bare Python 0 traces as
    # i64 under x64 and Mosaic cannot legalize i64 transform returns.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B // bb, kn // U),
        in_specs=[
            # the whole [kn, B] shift table lives in SMEM (kn*B*4 bytes);
            # explicit index map — the auto-generated one returns bare-0
            # (i64 under x64) constants Mosaic can't legalize
            pl.BlockSpec((kn, B), lambda i, j: (0 * j, 0 * j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, C, 2, n),
                         lambda i, j: (i, 0 * j, 0 * j, 0 * j)),
            pl.BlockSpec((2, 2, 2, logn, n),
                         lambda i, j: (0 * j, 0 * j, 0 * j, 0 * j, 0 * j)),
            pl.BlockSpec((U, C, l, C, 2, n),
                         lambda i, j: (j, 0 * j, 0 * j, 0 * j, 0 * j, 0 * j)),
            pl.BlockSpec((U, C, l, C, 2, n),
                         lambda i, j: (j, 0 * j, 0 * j, 0 * j, 0 * j, 0 * j)),
            pl.BlockSpec((U, C, l, C, 2, n),
                         lambda i, j: (j, 0 * j, 0 * j, 0 * j, 0 * j, 0 * j)),
            pl.BlockSpec((U, C, l, C, 2, n),
                         lambda i, j: (j, 0 * j, 0 * j, 0 * j, 0 * j, 0 * j)),
        ],
        out_specs=pl.BlockSpec((bb, C, 2, n),
                               lambda i, j: (i, 0 * j, 0 * j, 0 * j)),
        scratch_shapes=[pltpu.VMEM((bb, C, 2, n // LANES, LANES), U32)],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, C, 2, n), U32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(shifts.astype(I32), a0, tw, ev1, ev1s, ev2, ev2s)
    return (out[:, :, 0].astype(jnp.uint64)
            | (out[:, :, 1].astype(jnp.uint64) << jnp.uint64(32)))
