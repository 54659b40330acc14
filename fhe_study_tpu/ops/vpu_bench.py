"""VPU issue-rate microbenchmarks and the first-principles NTT kernel ceiling.

Round 3 left a credibility hole: the historical "73 G butterflies/s kernel
ceiling" does not reproduce (35 G/s on a clean checkout) and the scorecard's
roofline_frac used a *measured chained benchmark* as its denominator — which
the fused production kernels exceed (frac > 1).  This module replaces both
with defensible numbers:

1. `alu_rate(op)` — pure register/VMEM-resident u32 op-issue kernels (no NTT,
   no HBM in the loop): measures the v5e VPU's sustained element throughput
   for `add`, `mul` (low 32), `addmod` (add+cmp+sub+select), and
   `shoup_lazy` (the production modmul: 6 muls + ~16 shift/mask/adds).
   These settle what the VPU actually issues per cycle for our op mix.

2. `ntt_vmem_ceiling(q, n)` — the EXACT production lazy butterfly chain
   (same `_fwd_stage_lazy`/`_swap_xor_t` code the fused kernels run) looped
   `reps` times entirely in VMEM: one input fetch, one store, `reps` full
   transforms in between.  This is the speed-of-light for the butterfly
   op sequence on this chip — what the production kernel would sustain if
   HBM, DMA, and grid overhead were free.  `bench.py` quotes roofline_frac
   against THIS number (<= 1.0 by construction: production kernels do
   strictly more work per butterfly).

First-principles bracket (public v5e numbers, for the BENCH.md memo):
the VPU is an (8, 128) vector unit with 4 independent ALUs per lane slot;
at the ~1.5 GHz clock implied by 197 bf16 TFLOP/s over 4 128x128 MXUs the
all-ALU u32 ceiling is 8*128*4*1.5e9 ~= 6.1e12 ops/s, and 1/4 of that
(~1.5e12) if only one ALU issues per cycle for a given op class.  The
`alu_rate` measurements place the real machine inside this bracket per op.
"""

from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ntt as ntt_mod
from .ntt_pallas import (LANES, U32, _dev, _fwd_stage_lazy, _first_half_mask,
                         _mul32_hi, _norm2q, _on_tpu, _shoup_mul_lazy,
                         _swap_xor_t, _tw_dev)

# visible u32 ops per element per round for each op kernel (the hand count
# used to convert element-rate to ops-rate; `mul` counts 1 visible op even
# though the hardware may decompose it — that is exactly what the
# add-vs-mul rate ratio measures)
OP_COUNTS = {
    "add": 1,
    "mul": 1,
    "addmod": 4,        # add, cmp, sub, select
    "shoup_lazy": 22,   # _mul32_hi (4 split, 4 mul, 11 shift/mask/add) + 2 mul + 1 sub
}


def _op_body(op: str):
    if op == "add":
        return lambda x, y, yp, q: x + y
    if op == "mul":
        return lambda x, y, yp, q: x * y
    if op == "addmod":
        return lambda x, y, yp, q: jnp.where(x + y >= q, x + y - q, x + y)
    if op == "shoup_lazy":
        return lambda x, y, yp, q: _shoup_mul_lazy(x, y, yp, q)
    raise ValueError(op)


def _alu_kernel(x_ref, y_ref, yp_ref, o_ref, *, rounds, op, q):
    x = x_ref[...]
    y = y_ref[...]
    yp = yp_ref[...]
    body = _op_body(op)
    qq = U32(q)

    def step(i, x):
        # x feeds the next round: every round is live (no dead-code
        # elimination) and serial per element; ILP comes from the many
        # independent vregs in the block
        return body(x, y, yp, qq)

    x = jax.lax.fori_loop(0, rounds, step, x)
    o_ref[...] = x


def alu_rate(op: str, *, rounds: int = 200_000, shape=(256, 1024),
             iters: int = 3, interpret: bool | None = None,
             device=None) -> dict:
    """Measure the sustained element rate of one u32 op sequence.

    Returns {"elems_per_s", "ops_per_s", "dt", "rounds"}.  The block
    (default 256x1024 u32 = 1 MB = 256 vregs) stays register/VMEM resident
    for all `rounds`; HBM is touched once at entry/exit."""
    import time

    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        rounds = min(rounds, 50)     # CPU interpreter: smoke only
    q = 998244353
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, shape).astype(np.uint32))
    y = jnp.asarray(rng.integers(1, q, shape).astype(np.uint32))
    yp = ((y.astype(jnp.uint64) << jnp.uint64(32)) //
          jnp.uint64(q)).astype(jnp.uint32)
    if device is not None:
        x, y, yp = (jax.device_put(a, device) for a in (x, y, yp))

    kern = partial(_alu_kernel, rounds=rounds, op=op, q=q)
    spec = pl.BlockSpec(shape, lambda i: (0 * i, 0 * i),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        grid=(1,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )
    f = jax.jit(lambda a: call(a, y, yp))
    probe = jax.jit(lambda a: jnp.sum(a[:8, :64].astype(jnp.uint64)))
    out = f(x)
    float(probe(out))                      # warm + force
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = f(cur)                       # chained: no cache can serve it
    float(probe(cur))
    dt = time.perf_counter() - t0
    elems = float(np.prod(shape)) * rounds * iters
    return {"elems_per_s": elems / dt,
            "ops_per_s": elems * OP_COUNTS[op] / dt,
            "dt": dt, "rounds": rounds}


# ---------------------------------------------------------------------------
# In-VMEM repeated NTT: the butterfly-chain speed-of-light
# ---------------------------------------------------------------------------

def _ntt_repeat_kernel(x_ref, tw_ref, o_ref, *, q, n, reps):
    """`reps` full forward lazy transforms on a VMEM-resident block.

    Identical per-stage code to the production `_ntt_kernel_multi` lazy
    path (stage-entry [0,2q) norm, merged-operand Shoup butterfly); the
    [0,4q) output of one transform is a valid input to the next's entry
    norm, so repeats chain with no extra correction."""
    rows = n // LANES
    x = x_ref[...].reshape(x_ref.shape[0], rows, LANES)
    logn = n.bit_length() - 1
    qq = U32(q)
    q2 = U32(2 * q)

    def one_transform(i, x):
        for s in range(logn):
            t = n >> (s + 1)
            tw = tw_ref[0, 0, s, :].reshape(1, rows, LANES)
            twp = tw_ref[0, 1, s, :].reshape(1, rows, LANES)
            x = _norm2q(x, q2)
            y = _swap_xor_t(x, t, rows)
            first = _first_half_mask(x.shape, t)
            x = _fwd_stage_lazy(x, y, first, tw, twp, qq, q2)
        return x

    x = jax.lax.fori_loop(0, reps, one_transform, x)
    o_ref[...] = x.reshape(x_ref.shape)


def ntt_vmem_ceiling(q: int | None = None, n: int = 1 << 14, *,
                     B: int = 64, reps: int = 8, iters: int = 3,
                     interpret: bool | None = None, device=None) -> dict:
    """Butterflies/s of the pure in-VMEM lazy butterfly chain.

    One HBM fetch per block, `reps` transforms in VMEM, one store: the
    measured rate is the op-sequence ceiling the fused production kernels
    are bounded by.  Returns {"butterflies_per_sec", "dt", ...}."""
    import time

    if q is None:
        q = ntt_mod.CRT_PRIMES_TFHE[0]          # lazy-capable (q < 2^30)
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        reps, B = min(reps, 2), min(B, 8)       # CPU interpreter: smoke only
    logn = n.bit_length() - 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (B, n)).astype(np.uint32))
    if device is not None:
        x = jax.device_put(x, device)
    # same block size policy as the production multi-prime kernel
    block_b = max(1, min(B, (1 << 20) // (n * 4)))
    while block_b > 1 and (B % block_b or (block_b % 8 and block_b != B)):
        block_b -= 1                 # block_b=1 always divides B: no 0 exit
    tw = _tw_dev((q,), n, "fwd")                # [1, 2, logn, n] interned
    kern = partial(_ntt_repeat_kernel, q=q, n=n, reps=reps)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n), lambda i: (i, 0 * i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, logn, n),
                         lambda i: (0 * i, 0 * i, 0 * i, 0 * i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n), lambda i: (i, 0 * i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    f = jax.jit(lambda a: call(a, tw))
    probe = jax.jit(lambda a: jnp.sum(a[:8, :64].astype(jnp.uint64)))
    out = f(x)
    float(probe(out))
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = f(cur)                            # chained
    float(probe(cur))
    dt = time.perf_counter() - t0
    bf = B * reps * iters * logn * (n // 2)
    return {"butterflies_per_sec": bf / dt, "dt": dt, "reps": reps,
            "q": q, "n": n, "B": B}
