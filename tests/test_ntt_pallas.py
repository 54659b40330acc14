"""Pallas fused-NTT kernel: bit-parity with the XLA path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from fhe_study_tpu.ops import ntt, ntt_pallas


def test_pallas_ntt_matches_xla_bit_exact():
    for q in (65537, 2013265921):
        for n in (128, 512):
            rng = np.random.default_rng(1)
            x = jnp.asarray(rng.integers(0, q, size=(8, n), dtype=np.uint64))
            got = np.asarray(ntt_pallas.ntt_u32(x, q, interpret=True))
            want = np.asarray(ntt.ntt(x, q))
            np.testing.assert_array_equal(got, want)


def test_pallas_intt_matches_xla_bit_exact():
    q, n = 65537, 256
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    ex = ntt.ntt(x, q)
    got = np.asarray(ntt_pallas.ntt_u32(ex, q, inverse=True, interpret=True))
    want = np.asarray(ntt.intt(ex, q))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.asarray(x))


def test_pallas_polymul_sage_vectors_scaled():
    """End-to-end negacyclic product through the kernel (batched, n=128)."""
    q, n = 65537, 128
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, q, size=(4, n), dtype=np.uint64))
    ea = ntt_pallas.ntt_u32(a, q, interpret=True)
    eb = ntt_pallas.ntt_u32(b, q, interpret=True)
    prod = (ea * eb) % jnp.uint64(q)
    got = np.asarray(ntt_pallas.ntt_u32(prod, q, inverse=True, interpret=True))
    want = np.asarray(ntt.negacyclic_mul(a, b, q))
    np.testing.assert_array_equal(got, want)


def test_pallas_multi_fin_mont_and_scale():
    """fin epilogue options: forward Montgomery lift == to_mont(plain fwd);
    inverse with folded scale == scale * plain INTT (mod q) — bit-exact on
    the interpret path AND the XLA dispatcher path (ntt_multi mont/scale)."""
    from fhe_study_tpu.ops.primes import ntt_primes
    qs = ntt_primes(3, 30, 1 << 12)
    n = 256
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, (4, n)) for q in qs]).astype(np.uint64))
    qcol = np.array(qs, object)[:, None, None]
    e = ntt.ntt_multi(x, qs)
    em = ntt.ntt_multi(x, qs, mont=True)
    np.testing.assert_array_equal(
        np.asarray(em).astype(object),
        (np.asarray(e).astype(object) * (1 << 32)) % qcol)
    pf = ntt_pallas.ntt_multi_u32(x.astype(jnp.uint32), qs, interpret=True,
                                  fin=tuple((1 << 32) % q for q in qs))
    np.testing.assert_array_equal(np.asarray(pf),
                                  np.asarray(em).astype(np.uint32))
    s = tuple(int(q - 5) for q in qs)
    i0 = ntt.intt_multi(e, qs)
    i1 = ntt.intt_multi(e, qs, scale=s)
    np.testing.assert_array_equal(
        np.asarray(i1).astype(object),
        (np.asarray(i0).astype(object) * np.array(s, object)[:, None, None])
        % qcol)
    fin = tuple(pow(n, q - 2, q) * sv % q for q, sv in zip(qs, s))
    pi = ntt_pallas.ntt_multi_u32(e.astype(jnp.uint32), qs, inverse=True,
                                  interpret=True, fin=fin)
    np.testing.assert_array_equal(np.asarray(pi),
                                  np.asarray(i1).astype(np.uint32))


def test_pallas_tensor_mul_fused():
    """Fused tensor kernel (fwd x4 -> 3 products -> inv x3 + scale epilogue)
    is bit-exact vs composing the public transforms, for both scale=None and
    a per-prime scale.  Layout: [L, batch, 4, n] -> [L, batch, 3, n]."""
    from fhe_study_tpu.ops.primes import ntt_primes
    qs = ntt_primes(3, 30, 1 << 12)
    n = 256
    rng = np.random.default_rng(11)
    x4 = jnp.asarray(np.stack(
        [rng.integers(0, q, (2, 4, n)) for q in qs]).astype(np.uint32))
    for scale in (None, tuple(int(q - 7) for q in qs)):
        got = np.asarray(ntt_pallas.tensor_mul_u32(
            x4, qs, scale=scale, interpret=True)).astype(object)
        e = np.asarray(ntt.ntt_multi(x4.astype(jnp.uint64), qs)).astype(object)
        qcol = np.array(qs, object).reshape(3, 1, 1)
        p0 = (e[:, :, 0] * e[:, :, 2]) % qcol
        p1 = (e[:, :, 0] * e[:, :, 3] + e[:, :, 1] * e[:, :, 2]) % qcol
        p2 = (e[:, :, 1] * e[:, :, 3]) % qcol
        want = np.asarray(ntt.intt_multi(
            jnp.asarray(np.stack([p0, p1, p2], 2).astype(np.uint64)),
            qs)).astype(object)
        if scale is not None:
            want = (want * np.array(scale, object).reshape(3, 1, 1, 1)) % \
                qcol[:, None]
        np.testing.assert_array_equal(got, want % qcol[:, None])


def test_pallas_ks_fused_and_hoisted():
    """Fused key-switch kernels vs the XLA fallback: bit-exact for both the
    full (digits+fwd in-kernel) and hoisted (Montgomery eval digits in)
    variants."""
    from fhe_study_tpu.ops.primes import ntt_primes
    qs = ntt_primes(3, 30, 1 << 12)          # digit source basis
    both = qs + ntt_primes(2, 30, 1 << 12, skip=3)
    n, B, R = 256, 2, 3
    Lp = len(both)
    rng = np.random.default_rng(13)
    c = jnp.asarray(np.stack(
        [rng.integers(0, q, (B, n)) for q in qs]).astype(np.uint64))
    kb = jnp.asarray(np.stack(
        [np.stack([rng.integers(0, p, n) for p in both])
         for _ in range(R)]).astype(np.uint64))
    ka = jnp.asarray(np.stack(
        [np.stack([rng.integers(0, p, n) for p in both])
         for _ in range(R)]).astype(np.uint64))
    # XLA fallback reference (CPU dispatch takes this path automatically)
    want0, want1 = ntt.ks_fused_multi(c, kb, ka, both, qs)
    got0, got1 = ntt_pallas.ks_fused_u32(c, kb, ka, both, qs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got0),
                                  np.asarray(want0).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(got1),
                                  np.asarray(want1).astype(np.uint32))
    # hoisted variant against the same reference: build Montgomery eval
    # digits exactly as hybrid_ks.hoist_digits does
    prow = np.array(both, np.uint64).reshape(1, Lp, 1, 1)
    d = np.broadcast_to(np.asarray(c, np.uint64)[:, None],
                        (R, Lp, B, n)) % prow
    edm = ntt.ntt_multi(jnp.asarray(d.reshape(R * Lp, B, n)), both * R,
                        mont=True).reshape(d.shape).astype(jnp.uint32)
    h0, h1 = ntt_pallas.ks_contract_u32(edm, kb, ka, both, interpret=True)
    np.testing.assert_array_equal(np.asarray(h0),
                                  np.asarray(want0).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(h1),
                                  np.asarray(want1).astype(np.uint32))
    # dispatcher fallback for the hoisted path agrees too
    f0, f1 = ntt.ks_contract_multi(edm, kb, ka, both)
    np.testing.assert_array_equal(np.asarray(f0).astype(np.uint64),
                                  np.asarray(want0))
    np.testing.assert_array_equal(np.asarray(f1).astype(np.uint64),
                                  np.asarray(want1))


def test_pallas_tensor_mul4_and_ext_variant():
    """tensor_mul4_u32 (four separate operand inputs) == tensor_mul_u32 on
    the stacked layout; the src= variant == extend-then-multiply."""
    from fhe_study_tpu.ops.primes import ntt_primes
    qs = ntt_primes(3, 30, 1 << 12)
    ps = ntt_primes(4, 30, 1 << 12, skip=3)
    n, B = 256, 2
    rng = np.random.default_rng(17)
    ops4 = [jnp.asarray(np.stack([rng.integers(0, q, (B, n)) for q in qs])
                        .astype(np.uint32)) for _ in range(4)]
    x4 = jnp.stack(ops4, axis=-2)
    want = np.asarray(ntt_pallas.tensor_mul_u32(x4, qs, interpret=True))
    got = np.asarray(ntt_pallas.tensor_mul4_u32(*ops4, qs, interpret=True))
    np.testing.assert_array_equal(got, want)
    # extension variant vs fast_base_extend + tensor
    from fhe_study_tpu.models.bfv_rns import fast_base_extend
    ext4 = fast_base_extend(x4.astype(jnp.uint64), qs, ps).astype(jnp.uint32)
    want_p = np.asarray(ntt_pallas.tensor_mul_u32(ext4, ps, interpret=True))
    got_p = np.asarray(ntt_pallas.tensor_mul4_u32(*ops4, ps, src=qs,
                                                  interpret=True))
    np.testing.assert_array_equal(got_p, want_p)
    # scaled
    sc = tuple(int(p - 11) for p in ps)
    want_s = np.asarray(ntt_pallas.tensor_mul_u32(ext4, ps, scale=sc,
                                                  interpret=True))
    got_s = np.asarray(ntt_pallas.tensor_mul4_u32(*ops4, ps, scale=sc,
                                                  src=qs, interpret=True))
    np.testing.assert_array_equal(got_s, want_s)


def test_vpu_bench_repeat_kernel_parity():
    """The in-VMEM ceiling kernel (ops/vpu_bench.py) runs the EXACT
    production lazy butterfly chain: one rep == the library forward NTT
    bit-for-bit (mod q; the kernel's lazy output is in [0, 4q))."""
    from functools import partial
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fhe_study_tpu.ops import vpu_bench as V

    q = ntt.CRT_PRIMES_TFHE[0]
    n, B = 512, 8
    logn = n.bit_length() - 1
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, q, (B, n)).astype(np.uint32))
    tw = ntt_pallas._tw_dev((q,), n, "fwd")
    kern = partial(V._ntt_repeat_kernel, q=q, n=n, reps=1)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32), grid=(1,),
        in_specs=[pl.BlockSpec((B, n), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2, logn, n),
                               lambda i: (0 * i, 0 * i, 0 * i, 0 * i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, n), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
        interpret=True)(x, tw)
    want = np.asarray(ntt.ntt_multi(x[None].astype(jnp.uint64), (q,))[0])
    np.testing.assert_array_equal(np.asarray(out).astype(np.uint64) % q, want)
    # two reps == two applications (the [0,4q) residue chains through the
    # next rep's stage-entry norm)
    kern2 = partial(V._ntt_repeat_kernel, q=q, n=n, reps=2)
    out2 = pl.pallas_call(
        kern2, out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32), grid=(1,),
        in_specs=[pl.BlockSpec((B, n), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 2, logn, n),
                               lambda i: (0 * i, 0 * i, 0 * i, 0 * i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, n), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
        interpret=True)(x, tw)
    want2 = np.asarray(ntt.ntt_multi(jnp.asarray(want)[None], (q,))[0])
    np.testing.assert_array_equal(np.asarray(out2).astype(np.uint64) % q,
                                  want2)


def test_vpu_bench_alu_kernels_smoke():
    """The issue-rate kernels execute and their op bodies compute what they
    claim (checked against numpy on one round)."""
    from fhe_study_tpu.ops import vpu_bench as V
    for op in ("add", "mul", "addmod", "shoup_lazy"):
        r = V.alu_rate(op, rounds=4, shape=(8, 256), iters=1, interpret=True)
        assert r["elems_per_s"] > 0
