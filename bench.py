"""Benchmark: the full BASELINE.md scorecard on one chip.

Default run (`python bench.py`) emits ONE JSON line PER config:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
The HEADLINE — BFV ct-mul N=2^14 — runs FIRST (right after the cheap NTT
roofline that sets its ceiling quote) so a driver-side kill can never lose
it, and its line is RE-EMITTED after every subsequent mode and once more at
the very end: the driver parses the FINAL JSON line of the run, so the last
complete line is always the headline no matter where a timeout lands
(duplicate lines are intentional — crash-proofing, see VERDICT r02 #1).
A failing config prints an {"metric": ..., "error": ...} line and the rest
still run.  Wall-clock is budgeted globally: FHE_BENCH_TOTAL_BUDGET
(default 1200 s) is split across modes, and a mode whose slice has run out
is skipped with a *_SKIPPED line instead of starving the scorecard.
FHE_BENCH_KIND=bfv|bfv_linear|ckks|tfhe|tfhe_prod|ckks_boot|ntt runs one.

vs_baseline: the north-star target is ≥10^6 ct-mults/s aggregate on a v5e-16,
i.e. 62500/s per chip — value / 62500.  The NTT line reports
`hbm_equiv_frac` (unfused-chain HBM traffic at 819 GB/s v5e peak — the
speed-of-light an UNFUSED stage chain could reach; the fused VMEM kernel
can and does exceed 1.0) and the compute-path lines report
`butterflies_per_sec` so the roofline fraction of the measured kernel
ceiling is visible in the scorecard (BASELINE.md:33-34).

Env knobs: FHE_BENCH_N, FHE_BENCH_L, FHE_BENCH_M, FHE_BENCH_B, FHE_BENCH_T,
FHE_BENCH_ITERS (for smoke runs on CPU).
"""

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the N=2^14 graphs take minutes through the
# remote-compile tunnel; cache survives across bench invocations
os.makedirs("/root/repo/_build/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/_build/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from fhe_study_tpu.models import bfv_rns as R  # noqa: E402
from fhe_study_tpu.utils import prng  # noqa: E402


# measured fused-kernel ceiling (set by bench_ntt when it runs first; the
# compute-path metrics quote their butterfly throughput against it)
_NTT_CEILING = {}


def _emit(d):
    """Print one scorecard line and hand it back (main re-emits the
    headline's dict after every later mode — crash-proof final line)."""
    print(json.dumps(d), flush=True)
    return d


def _note(msg):
    """Phase timestamp on stderr — makes a killed mode's post-mortem say
    WHERE the slice went (r2-r4 each lost scorecard lines to opaque
    in-slice timeouts)."""
    import sys
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.monotonic()


def _setup_cached(tag: str, cfg: tuple, build):
    """Disk-cache a mode's host-side setup pytree (numpy leaves).

    The r4 scorecard lost tfhe_prod to CPU keygen + upload overrunning its
    alarm slice; every mode's setup is deterministic (fixed PRNG keys), so
    the scorecard run should pay it once per config EVER, not once per
    run.  Keys here are bench artifacts (PRNGKey(0), public code) — no
    secret-material concern.  Falls back to build() on any cache problem."""
    import hashlib
    import pickle
    import signal
    import numpy as np
    # PAUSE the mode's alarm while loading/building setup: cold builds are
    # deterministic bounded host work, and killing one mid-build means the
    # cache is never written — every later cold run dies the same way (the
    # r5 full run lost tfhe+tfhe_prod to exactly this).  The build still
    # burns GLOBAL budget (later modes shrink/skip), but the cache write
    # always lands, so the NEXT run is warm.  signal.alarm(0) returns the
    # seconds that were remaining; re-arm with them on the way out.
    rem = signal.alarm(0)
    try:
        tag_h = hashlib.sha1(repr(cfg).encode()).hexdigest()[:16]
        f = f"/root/repo/_build/setup_{tag}_{tag_h}.pkl"
        if os.path.exists(f):
            try:
                with open(f, "rb") as fh:
                    out = pickle.load(fh)
                _note(f"{tag}: setup loaded from cache")
                return out
            except Exception:
                pass
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            out = build()
            out = jax.tree.map(np.asarray, out)
        try:
            with open(f, "wb") as fh:
                pickle.dump(out, fh, protocol=4)
        except OSError:
            pass
        _note(f"{tag}: setup built (cached for next run)")
        return out
    finally:
        if rem:
            signal.alarm(rem)


def bench_ntt():
    """NTT kernel roofline (BASELINE.md:33-34): fused multi-prime forward
    transform throughput at the headline shape, vs the HBM speed-of-light of
    an UNFUSED stage chain (819 GB/s on v5e)."""
    from fhe_study_tpu.ops import ntt as ntt_mod
    from fhe_study_tpu.ops.primes import ntt_primes
    from fhe_study_tpu.utils.profiling import ntt_roofline

    n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
    L = int(os.environ.get("FHE_BENCH_L", 4)) + int(os.environ.get("FHE_BENCH_M", 5))
    B = int(os.environ.get("FHE_BENCH_B", 64))
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    chain = int(os.environ.get("FHE_BENCH_CHAIN", 8))
    qs = ntt_primes(L, 30, 1 << 16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from fhe_study_tpu.utils import prng
        a = prng.uniform_mod_multi(jax.random.PRNGKey(0), (B, n), qs
                                   ).astype(jnp.uint32)
    dev = jax.devices()[0]
    a = jax.device_put(a, dev)

    def _chain(x):
        # chained: each output feeds the next transform (forward NTT maps
        # [0,q) -> [0,q), so the chain stays in range; values are garbage
        # after the first link but timing is honest — no cache can serve it)
        def body(c, _):
            return ntt_mod.ntt_multi(c, qs), None
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out

    f = jax.jit(_chain)
    probe = jax.jit(lambda x: jnp.sum(x[:, 0, :64].astype(jnp.uint64)))
    out = f(a)
    float(probe(out))
    t0 = time.perf_counter()
    cur = a
    for _ in range(iters):
        cur = f(cur)
    float(probe(cur))
    dt = time.perf_counter() - t0
    n_tr = L * B * chain * iters
    roof = ntt_roofline(n_tr, n, dt, dtype_bytes=4)
    rep = roof.report()
    # the roofline DENOMINATOR is the in-VMEM butterfly-chain ceiling (the
    # exact production op sequence looped register/VMEM-resident, zero HBM
    # in the loop — ops/vpu_bench.py): a first-principles speed-of-light
    # the fused kernels cannot exceed, unlike the r1-r3 self-referential
    # chained-bench denominator (VERDICT r3 weak #3, roofline_frac 1.05).
    # The ceiling is a HARDWARE constant — measured once per (n, B) and
    # disk-cached so a flaky tunnel/compile can't starve the mode's slice
    # (FHE_FORCE_CEILING=1 re-measures).
    # keyed by device_kind too: a pool serving a different TPU generation
    # must not reuse another chip's "hardware constant" (advisor r4, low)
    kind_tag = "".join(ch if ch.isalnum() else "-"
                       for ch in getattr(dev, "device_kind", "unknown"))
    ceil_f = f"/root/repo/_build/vpu_ceiling_{kind_tag}_n{n}_B{B}.json"
    ceil = None
    if (os.path.exists(ceil_f)
            and os.environ.get("FHE_FORCE_CEILING", "0") != "1"):
        try:
            with open(ceil_f) as fh:
                ceil = json.load(fh)
            if ceil.get("device_kind", kind_tag) != kind_tag:
                ceil = None
        except (OSError, ValueError):
            ceil = None
    if ceil is None:
        from fhe_study_tpu.ops.vpu_bench import ntt_vmem_ceiling
        ceil = ntt_vmem_ceiling(n=n, B=B, reps=2048, iters=3,
                                device=dev)   # interpret auto: off-TPU smoke
        ceil["device_kind"] = kind_tag
        try:
            with open(ceil_f, "w") as fh:
                json.dump(ceil, fh)
        except OSError:
            pass
    _NTT_CEILING["bf_per_s"] = ceil["butterflies_per_sec"]
    return _emit({
        "metric": f"ntt_fused_n{n}_L{L}_butterflies_per_sec",
        "value": round(roof.butterflies_per_sec, 0),
        "unit": "butterflies/s",
        "vs_baseline": round(rep["hbm_fraction_of_peak"], 4),
        "hbm_equiv_frac": round(rep["hbm_fraction_of_peak"], 4),
        "hbm_equiv_gbps": round(rep["hbm_gbps"], 1),
        "vmem_ceiling_bf_per_s": round(ceil["butterflies_per_sec"], 0),
    })


def bench_tfhe():
    """bootstraps/s per chip: full blind rotation (correct CMux chain over
    K·N bits) + sample extraction + key switch, batched."""
    import numpy as np
    from fhe_study_tpu.arith import RingParam
    from fhe_study_tpu.arith.params import TORUS_Q
    from fhe_study_tpu.models.gfhe.glwe import Param, ERR_SIGMA
    from fhe_study_tpu.models.tfhe import tlwe, tglwe, bootstrap

    n = int(os.environ.get("FHE_BENCH_N", 1024))
    t = int(os.environ.get("FHE_BENCH_T", 8))
    B = int(os.environ.get("FHE_BENCH_B", 64))   # fused chain amortizes
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    # 2^12 x 2 decomposition: 4 digit rows instead of 6 per CMux step —
    # measured +17%/+14% (short/full chain) with clean decrypts at t=8
    beta = int(os.environ.get("FHE_BENCH_BETA", 4096))
    l = int(os.environ.get("FHE_BENCH_LBR", 2))
    beta_ks, l_ks = 16, 8

    param = Param(ERR_SIGMA, RingParam(TORUS_Q, n), 1, t)
    key = jax.random.PRNGKey(0)
    ks = prng.split(key, 3)
    cpu = jax.devices("cpu")[0]

    def build():
        table = bootstrap.compute_lookup_table_standard(param)
        s, _ = tglwe.new_key(ks[0], param)
        s_flat = tglwe.sk_to_tlwe(s)
        btk, s_out = bootstrap.new_bootstrapping_key(
            ks[1], param, s, beta=beta, l=l, beta_ks=beta_ks, l_ks=l_ks,
            s_lwe_out=s_flat)
        m = jnp.arange(B, dtype=jnp.uint64) % jnp.uint64(t // 2)
        c = tlwe.encrypt_uniform(ks[2], param.lwe(), s_flat,
                                 tlwe.encode(param, m), batch=(B,))
        btk_evals = bootstrap.precompute_btk_evals(param, btk)
        return dict(table=table, btk=btk, evals=btk_evals, c=c, m=m,
                    s_out=s_out)

    st = _setup_cached("tfhe", (n, t, B, beta, l, beta_ks, l_ks, 1), build)
    table, btk, btk_evals, c, m, s_out = (st["table"], st["btk"],
                                          st["evals"], st["c"], st["m"],
                                          st["s_out"])
    dev = jax.devices()[0]
    table, btk, btk_evals, c = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), dev),
        (table, btk, btk_evals, c))
    _note("tfhe: device upload done")

    # NB: keys/tables passed as ARGUMENTS — closed-over arrays become HLO
    # constants and blow up the remote-compile request (HTTP 413)
    def _bs(ca, cb, btk_, table_, ev_):
        return bootstrap.bootstrap(
            param, btk_, table_, tlwe.TLWE(ca, cb), beta=beta, l=l,
            beta_ks=beta_ks, l_ks=l_ks, mode="standard", btk_evals=ev_)

    bs_jit = jax.jit(_bs)
    bs = lambda ca, cb: bs_jit(ca, cb, btk, table, btk_evals)  # noqa: E731
    # timing protocol (r5): CHAIN the bootstrap output into the next call's
    # input (identity LUT -> message preserved, bits differ every link: the
    # relay can't serve a cached result — re-issuing identical calls was
    # measured served-from-cache at 300x the real rate) and close the
    # window on a forced readback (block_until_ready does not reliably
    # block through the relay).
    out = bs(c.a, c.b)
    probe = jax.jit(lambda a: jnp.sum(a[:, :64].astype(jnp.uint64)))
    float(probe(out[0]))
    t0 = time.perf_counter()
    cur = out
    for _ in range(iters):
        cur = bs(cur[0], cur[1])
    float(probe(cur[0]))
    dt = time.perf_counter() - t0

    with jax.default_device(cpu):
        out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), out)
        rec = tlwe.decode(param, tlwe.decrypt(param.lwe(), s_out,
                                              tlwe.TLWE(out_cpu[0], out_cpu[1])))
    ok = bool((np.asarray(rec) == np.asarray(m)).all())
    value = B * iters / dt
    return _emit({
        "metric": f"tfhe_bootstrap_n{n}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 62500.0, 6),
    })


def bench_tfhe_prod():
    """bootstraps/s at a PRODUCTION parameter set: short-LWE keyswitch-first
    pipeline (n_lwe=700 CMux steps instead of k*N=1024; the layout real TFHE
    deployments use — BASELINE config 5's headline)."""
    import numpy as np
    from fhe_study_tpu.arith import RingParam
    from fhe_study_tpu.arith.params import TORUS_Q
    from fhe_study_tpu.models.gfhe.glwe import Param, ERR_SIGMA
    from fhe_study_tpu.models.tfhe import tlwe, tglwe, bootstrap

    n = int(os.environ.get("FHE_BENCH_N", 1024))
    n_lwe = int(os.environ.get("FHE_BENCH_NLWE", 700))
    t = int(os.environ.get("FHE_BENCH_T", 8))
    B = int(os.environ.get("FHE_BENCH_B", 64))
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    # 2^12 x 2 decomposition: 4 digit rows instead of 6 per CMux step —
    # measured +17%/+14% (short/full chain) with clean decrypts at t=8
    beta = int(os.environ.get("FHE_BENCH_BETA", 4096))
    l = int(os.environ.get("FHE_BENCH_LBR", 2))
    beta_ks, l_ks = 16, 8

    param = Param(ERR_SIGMA, RingParam(TORUS_Q, n), 1, t)
    key = jax.random.PRNGKey(0)
    ks = prng.split(key, 3)
    cpu = jax.devices("cpu")[0]

    def build():
        table = bootstrap.compute_lookup_table_standard(param)
        s, _ = tglwe.new_key(ks[0], param)
        s_flat = tglwe.sk_to_tlwe(s)
        sbtk = bootstrap.new_short_bootstrapping_key(
            ks[1], param, s, n_lwe=n_lwe, beta=beta, l=l,
            beta_ks=beta_ks, l_ks=l_ks)
        m = jnp.arange(B, dtype=jnp.uint64) % jnp.uint64(t // 2)
        c = tlwe.encrypt_uniform(ks[2], param.lwe(), s_flat,
                                 tlwe.encode(param, m), batch=(B,))
        btk_evals = bootstrap.precompute_btk_evals(
            param, bootstrap.BootstrappingKey(
                btk_a=sbtk.btk_a, btk_b=sbtk.btk_b,
                ksk_a=sbtk.ksk_a, ksk_b=sbtk.ksk_b))
        return dict(table=table, sbtk=sbtk, evals=btk_evals, c=c, m=m,
                    s_flat=s_flat)

    st = _setup_cached("tfhe_prod",
                       (n, n_lwe, t, B, beta, l, beta_ks, l_ks, 1), build)
    table, sbtk, btk_evals, c, m, s_flat = (st["table"], st["sbtk"],
                                            st["evals"], st["c"], st["m"],
                                            st["s_flat"])
    dev = jax.devices()[0]
    table, sbtk, btk_evals, c = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), dev),
        (table, sbtk, btk_evals, c))
    _note("tfhe_prod: device upload done")

    def _bs(ca, cb, sbtk_, table_, ev_):
        return bootstrap.bootstrap_short(
            param, sbtk_, table_, tlwe.TLWE(ca, cb), beta=beta, l=l,
            beta_ks=beta_ks, l_ks=l_ks, btk_evals=ev_)

    bs_jit = jax.jit(_bs)
    bs = lambda ca, cb: bs_jit(ca, cb, sbtk, table, btk_evals)  # noqa: E731
    # chained + readback-closed window — see bench_tfhe (r5 protocol fix)
    out = bs(c.a, c.b)
    probe = jax.jit(lambda a: jnp.sum(a[:, :64].astype(jnp.uint64)))
    float(probe(out[0]))
    t0 = time.perf_counter()
    cur = out
    for _ in range(iters):
        cur = bs(cur[0], cur[1])
    float(probe(cur[0]))
    dt = time.perf_counter() - t0

    with jax.default_device(cpu):
        out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), out)
        rec = tlwe.decode(param, tlwe.decrypt(
            param.lwe(), s_flat, tlwe.TLWE(out_cpu[0], out_cpu[1])))
    ok = bool((np.asarray(rec) == np.asarray(m)).all())
    value = B * iters / dt
    return _emit({
        "metric": f"tfhe_bootstrap_short_n{n}_nlwe{n_lwe}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 62500.0, 6),
    })


def bench_bfv_linear():
    """BASELINE config 2: encrypt/add/pt-mul, N=2^12, 1K-ciphertext batch.

    Default path (r5): eval-resident chained pipeline — plaintext held in
    NTT form (pt_to_evals) and ciphertexts resident in the eval domain
    across the in-graph chain, so each add+pt-mul step is pure pointwise
    VPU work (no transforms; entry/exit NTTs amortized over the chain).
    FHE_BENCH_EVAL=0 measures the legacy coefficient-domain chain."""
    import numpy as np
    n = int(os.environ.get("FHE_BENCH_N", 1 << 12))
    L = int(os.environ.get("FHE_BENCH_L", 2))
    t = int(os.environ.get("FHE_BENCH_T", 256))
    B = int(os.environ.get("FHE_BENCH_B", 1024))
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    param = R.RnsParam(n=n, t=t, L=L, M=L + 1)
    ks = prng.split(jax.random.PRNGKey(0), 6)
    cpu = jax.devices("cpu")[0]

    def build():
        sk, pk = R.new_key(ks[0], param)
        m1 = prng.uniform_mod(ks[2], (B, n), t)
        m2 = prng.uniform_mod(ks[3], (B, n), t)
        c1 = R.encrypt(ks[4], param, pk, m1, batch=(B,))
        c2 = R.encrypt(ks[5], param, pk, m2, batch=(B,))
        from fhe_study_tpu.ops import ntt as ntt_mod
        from fhe_study_tpu.ops import modops
        s12 = (m1 + m2) % jnp.uint64(t)
        want = modops.coerce_i64(ntt_mod.polymul_i64_crt(
            s12.astype(jnp.int64), m2.astype(jnp.int64)), t)
        return dict(sk=sk, m1=m1, m2=m2, c1=c1, c2=c2, want=want)

    st = _setup_cached("bfv_linear", (n, t, L, B, 2), build)
    sk, m1, m2, c1, c2 = (st["sk"], st["m1"], st["m2"], st["c1"], st["c2"])
    dev = jax.devices()[0]
    # upload compressed: RNS limbs are < 2^31 (u32 exact) and messages are
    # < t <= 256 (u8) — the r5 full-run alarm fired mid-upload of the u64
    # tensors (~300 MB over the C-blocking tunnel); u32/u8 wire halves it.
    # The jitted graphs lift back to u64 at entry.
    c1, c2 = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x).astype(np.uint32), dev),
        (c1, c2))
    m2d = jax.device_put(np.asarray(m2).astype(np.uint8), dev)
    _note("bfv_linear: device upload done")
    _u64 = lambda x: x.astype(jnp.uint64)
    chain = int(os.environ.get("FHE_BENCH_CHAIN", 8))
    evalres = os.environ.get("FHE_BENCH_EVAL", "1") == "1"

    if evalres:
        # production linear path (r5): plaintext in NTT form (pt_to_evals,
        # the SEAL trick) + eval-resident ciphertexts — each chained step is
        # pointwise addmod + Montgomery mul on both bases, ZERO transforms;
        # the NTT entry/exit is amortized over the in-graph chain.  Chained
        # (output feeds input) so no cache can serve the repeat dispatches.
        def _lin_chain(a0, a1, b0, b1, m):
            em = R.pt_to_evals(param, _u64(m))
            ce = R.to_evals(param, R.CT(_u64(a0), _u64(a1)))
            be = R.to_evals(param, R.CT(_u64(b0), _u64(b1)))
            for _ in range(chain):
                ce = R.mul_pt_e(param, R.add_e(param, ce, be), em)
            r = R.from_evals(param, ce)
            return r.c0.astype(jnp.uint32), r.c1.astype(jnp.uint32)

        step_jit = jax.jit(_lin_chain)
        one = jax.jit(lambda a0, a1, b0, b1, m: tuple(
            x.astype(jnp.uint32) for x in R.from_evals(
                param, R.mul_pt_e(param, R.add_e(
                    param, R.to_evals(param, R.CT(_u64(a0), _u64(a1))),
                    R.to_evals(param, R.CT(_u64(b0), _u64(b1)))),
                R.pt_to_evals(param, _u64(m))))))
    else:
        def _lin_chain(a0, a1, b0, b1, m):
            c = R.CT(_u64(a0), _u64(a1))
            for _ in range(chain):
                c = R.mul_pt(param, R.add(param, c, R.CT(_u64(b0), _u64(b1))),
                             _u64(m))
            c = R._lift(c)
            return c.c0.astype(jnp.uint32), c.c1.astype(jnp.uint32)

        step_jit = jax.jit(_lin_chain)
        one = jax.jit(lambda a0, a1, b0, b1, m: tuple(
            x.astype(jnp.uint32) for x in R._lift(R.mul_pt(
                param, R.add(param, R.CT(_u64(a0), _u64(a1)),
                             R.CT(_u64(b0), _u64(b1))), _u64(m)))))

    probe = jax.jit(lambda a: jnp.sum(a[:, 0, :64].astype(jnp.uint64)))
    args = (c1.c0, c1.c1, c2.c0, c2.c1, m2d)
    out = one(*args)                     # fresh single step: decrypt-verified
    float(probe(out[0]))
    w = step_jit(*args)                  # compile the chained step
    float(probe(w[0]))
    t0 = time.perf_counter()
    cur = (c1.c0, c1.c1)
    for _ in range(iters):
        timed = step_jit(cur[0], cur[1], c2.c0, c2.c1, m2d)
        cur = (timed[0], timed[1])       # noise grows — timing only
    float(probe(timed[0]))
    dt = time.perf_counter() - t0

    with jax.default_device(cpu):
        out_cpu = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x).astype(np.uint64), cpu),
            out)
        rec = R.decrypt(param, sk, R.CT(out_cpu[0], out_cpu[1]))
    ok = bool((np.asarray(rec) == np.asarray(st["want"])).all())
    value = B * chain * iters / dt
    return _emit({
        "metric": f"bfv_rns_add_ptmul_n{n}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "ops/s",
        "vs_baseline": round(value / 62500.0, 6),
    })


def bench_ckks():
    """BASELINE config 4: CKKS encode+encrypt+add+mul+rescale pipeline,
    N=2^13, batched."""
    import numpy as np
    from fhe_study_tpu.models.ckks import ckks_rns as C
    n = int(os.environ.get("FHE_BENCH_N", 1 << 13))
    L = int(os.environ.get("FHE_BENCH_L", 4))
    B = int(os.environ.get("FHE_BENCH_B", 32))
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    param = C.Param(n=n, L=L, delta=2.0 ** 28)
    ks = prng.split(jax.random.PRNGKey(0), 5)
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    z1 = rng.uniform(-1, 1, (B, n // 2))
    z2 = rng.uniform(-1, 1, (B, n // 2))

    def build():
        sk, pk = C.new_key(ks[0], param)
        hrlk = C.hybrid_rlk(ks[1], param, sk)
        c1 = C.encrypt(ks[2], param, pk,
                       C.encode(param, jnp.asarray(z1), jnp.zeros_like(z1)),
                       batch=(B,))
        c2 = C.encrypt(ks[3], param, pk,
                       C.encode(param, jnp.asarray(z2), jnp.zeros_like(z2)),
                       batch=(B,))
        return dict(sk=sk, hrlk=hrlk, c1=c1, c2=c2)

    st = _setup_cached("ckks", (n, L, B, 1), build)
    sk, hrlk, c1, c2 = st["sk"], st["hrlk"], st["c1"], st["c2"]
    dev = jax.devices()[0]
    hrlk, c1, c2 = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), dev),
                                (hrlk, c1, c2))
    _note("ckks: device upload done")
    def _step(a0, a1, b0, b1, hb, ha):
        out = C.mul_hybrid(param, type(hrlk)(hb, ha), C.CT(a0, a1),
                           C.add(param, C.CT(a0, a1), C.CT(b0, b1)))[0]
        # padded copies keep the chained input at L limbs (values garbage
        # but DIFFERENT each iteration); padding stays IN-GRAPH — an eager
        # concat would dispatch through the device tunnel per iteration
        pad = lambda a: jnp.concatenate([a, a[-1:]], axis=0)  # noqa: E731
        return out[0], out[1], pad(out[0]), pad(out[1])

    step = jax.jit(_step)
    probe = jax.jit(lambda a: jnp.sum(a[:, 0, :64]))
    out = step(c1.c0, c1.c1, c2.c0, c2.c1, hrlk.b, hrlk.a)
    float(probe(out[0]))
    fresh = out[:2]                        # decrypt-verified below
    t0 = time.perf_counter()
    cur = (c2.c0, c2.c1)
    for _ in range(iters):
        timed = step(c1.c0, c1.c1, cur[0], cur[1], hrlk.b, hrlk.a)
        cur = (timed[2], timed[3])
    float(probe(timed[0]))
    dt = time.perf_counter() - t0
    # correctness check: fresh add+mul decrypts to (z1+z2)*z1
    with jax.default_device(cpu):
        out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), fresh)
        p2 = C.Param(n=n, L=L - 1, delta=param.delta ** 2 / param.qs[-1])
        rr, _ = C.decode(p2, C.decrypt_to_coeffs(p2, sk, C.CT(*out_cpu)))
    ok = bool(np.allclose(np.asarray(rr), (z1 + z2) * z1, atol=1e-2))
    value = B * iters / dt
    return _emit({
        "metric": f"ckks_rns_add_mul_rescale_n{n}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "ops/s",
        "vs_baseline": round(value / 62500.0, 6),
    })


def bench_ckks_boot():
    """CKKS bootstrap throughput at the HIGH-PRECISION production config:
    double-base ModRaise (Q0 = q0*q1, delta0 = 2^45), sparse secret h=64,
    auto-sized EvalMod range (bootstrap.suggest_K_r), double-prime working
    scale 2^60 — ~26 refreshed bits (vs ~4 for the single-prime base at
    these ring sizes).  ModRaise -> C2S (BSGS, hoisted babies, precompiled
    diagonal plans) -> EvalMod -> S2C, per-stage jits, keys as a pytree
    argument (no giant closure constants).  Default n=2^11: the rotation
    key set is ~4.7 GB; n=2^12 (~9.5 GB) exceeds comfortable v5e HBM
    headroom next to the ciphertexts."""
    import numpy as np
    from fhe_study_tpu.models.ckks import bootstrap as BB
    from fhe_study_tpu.models.ckks import ckks_rns as C
    from fhe_study_tpu.models.ckks import poly as P
    n = int(os.environ.get("FHE_BENCH_N", 1 << 11))
    B = int(os.environ.get("FHE_BENCH_B", 8))
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))
    # delta0 = 2^55: the refreshed precision is (C2S w-noise ~2^-34..38) x
    # (2pi(K+.5)) x (Q0/2pi)/delta0 — raising delta0 toward Q0 is the
    # dominant precision lever (measured +1 bit per delta0 bit, r3 probes;
    # scripts/boot_probe.py e2e reproduces the sweep); arcsin_terms=4 keeps
    # the linearization residual below it at s ~ 2^-2.6
    delta0 = float(os.environ.get("FHE_BENCH_DELTA0", 2.0 ** 55))
    delta_w = 2.0 ** 60
    deg, arcsin_terms, base = 30, 4, 2
    h = int(os.environ.get("FHE_BENCH_H", 64))
    K, r = BB.suggest_K_r(n, h)
    # FHE_BENCH_STAGES > 1: radix-split C2S/S2C (r5) — per-stage diagonal
    # material O(2^(log(n/2)/S)) rows instead of dense O(n/2); costs
    # 4*(S-1) extra levels (pt_levels=2 per extra stage per side).  The
    # n=2^12 config REQUIRES it (dense em does not fit HBM).
    S = int(os.environ.get("FHE_BENCH_STAGES", 1 if n <= (1 << 11) else 2))
    # +1 level for the deeper arcsin correction (terms=4)
    L = int(os.environ.get("FHE_BENCH_L", 29 + 2 * r + 4 * (S - 1)))
    param = C.Param(n=n, L=L, delta=delta0)
    ks = prng.split(jax.random.PRNGKey(0), 3)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sk, pk = C.new_key(ks[0], param, h=h)
        rng = np.random.default_rng(0)
        z = rng.uniform(-1, 1, (B, n // 2))
        ct = C.encrypt(ks[1], param, pk,
                       C.encode(param, jnp.asarray(z), jnp.zeros_like(z)),
                       batch=(B,))
        ct1, _ = P.level_drop(param, ct, base)
        # production key path: complete sk-free key set via eval_shape
        # discovery (zero ciphertext compute).  The build costs ~8 CPU
        # minutes at n=2^11/L=39 — DISK-CACHED per config (deterministic:
        # fixed PRNG key) so the scorecard run pays it once per round.
        import hashlib
        import pickle
        cfg = (n, B, L, K, r, deg, float(delta0), float(delta_w),
               arcsin_terms, base, h, S, 6)     # trailing int: cache rev
        # rev 6: a-seed pack format + collision-free _rot_subkey schedule
        # (advisor r4 high/medium) — r<=5 caches hold a master key and the
        # old rotation-key PRNG schedule; never load them
        tag = hashlib.sha1(repr(cfg).encode()).hexdigest()[:16]
        cache_f = f"/root/repo/_build/bootkeys_{tag}.pkl"
        # SEEDED key cache (r4): only the b planes + the PRNG master key are
        # stored/uploaded — half the bytes of the r3 full-pytree cache (the
        # 3.4 GB load + relay upload was most of this mode's 11 min); the
        # `a` planes regenerate bit-exactly ON the TPU (BB.expand_seeded)
        # pause the mode alarm across the key-cache load/build (same
        # rationale as _setup_cached: a mid-build kill means the cache is
        # never written and every later cold run dies identically)
        import signal
        _rem = signal.alarm(0)
        try:
            if os.path.exists(cache_f):
                with open(cache_f, "rb") as fh:
                    packed, static, pout = pickle.load(fh)
                packed = jax.tree.map(jnp.asarray, packed)
                _note("ckks_boot: seeded key cache loaded")
            else:
                arrays, static, pout, em_src = BB.precompute_keys(
                    ks[2], param, sk, delta0, batch=(B,), K=K, r=r, deg=deg,
                    delta_w=delta_w, arcsin_terms=arcsin_terms,
                    base_limbs=base, with_em_src=True, c2s_stages=S,
                    s2c_stages=S)
                packed = BB.pack_seeded(arrays, ks[2], param, em_src=em_src)
                del arrays
                try:
                    with open(cache_f, "wb") as fh:
                        pickle.dump((jax.tree.map(np.asarray, packed), static,
                                     pout), fh, protocol=4)
                    _note("ckks_boot: seeded key cache written")
                except OSError:
                    pass                      # disk-full etc: cache optional
        finally:
            if _rem:
                signal.alarm(_rem)
    if os.environ.get("FHE_BENCH_SETUP_ONLY") == "1":
        # cache-population run (CPU backend, no device upload/measure):
        # lets a builder pre-warm the key cache without riding the tunnel
        _note("ckks_boot: setup-only run complete (key cache on disk)")
        return None
    dev = jax.devices()[0]
    packed, ct1 = jax.tree.map(lambda x: jax.device_put(x, dev),
                               (packed, ct1))
    _note("ckks_boot: device upload done")
    arrays = BB.expand_seeded(packed, param)   # a-planes regenerate on-chip
    jax.block_until_ready(jax.tree.leaves(arrays["rlk"])[0])
    _note("ckks_boot: a-planes + em expanded on-chip")

    # per-STAGE jits: the whole-pipeline single jit is a graph XLA compiles
    # for tens of minutes (see BB.make_staged)
    run = BB.make_staged(param, static, delta0, K=K, r=r, deg=deg,
                         delta_w=delta_w, arcsin_terms=arcsin_terms,
                         base_limbs=base, c2s_stages=S, s2c_stages=S)
    back = jax.jit(lambda c0, c1: P.level_drop(pout, C.CT(c0, c1), base)[0])
    probe = jax.jit(lambda a: jnp.sum(a[:, 0, :64]))
    fresh_ct, _ = run(arrays, ct1.c0, ct1.c1)
    float(probe(fresh_ct.c0))
    _note("ckks_boot: warmup bootstrap done")
    fresh = (fresh_ct.c0, fresh_ct.c1)     # decrypt-verified below
    nxt = back(fresh_ct.c0, fresh_ct.c1)
    float(probe(nxt.c0))
    t0 = time.perf_counter()
    cur = (ct1.c0, ct1.c1)
    for _ in range(iters):
        out_ct, _ = run(arrays, cur[0], cur[1])
        nxt = back(out_ct.c0, out_ct.c1)   # chain back to level 1
        cur = (nxt.c0, nxt.c1)
    float(probe(cur[0]))
    dt = time.perf_counter() - t0
    with jax.default_device(cpu):
        out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), fresh)
        rr, _ = C.decode(pout, C.decrypt_to_coeffs(pout, sk, C.CT(*out_cpu),
                                                   crt_limbs=3))
    # decrypt gate at 2^-18 (a broken kernel produces ~2^0 garbage; the
    # MEASURED precision is reported as refreshed_bits — ~20.8 bits at
    # n=2048/delta0=2^55, B=1 CPU probe; the gate leaves tail margin for
    # the B=8 max over 8x more coefficients)
    err = float(np.max(np.abs(np.asarray(rr) - z)))
    ok = err < 2.0 ** -18
    value = B * iters / dt
    return _emit({
        "metric": f"ckks_bootstrap_n{n}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "bootstraps/s",
        "vs_baseline": round(value / 62500.0, 6),
        "refreshed_bits": round(-np.log2(max(err, 1e-300)), 1),
    })


def bench_bfv():
    n = int(os.environ.get("FHE_BENCH_N", 1 << 14))
    L = int(os.environ.get("FHE_BENCH_L", 4))
    M = int(os.environ.get("FHE_BENCH_M", 5))
    t = int(os.environ.get("FHE_BENCH_T", 256))
    B = int(os.environ.get("FHE_BENCH_B", 128))   # B=128 ~4% over B=64
    iters = int(os.environ.get("FHE_BENCH_ITERS", 3))

    param = R.RnsParam(n=n, t=t, L=L, M=M)
    key = jax.random.PRNGKey(0)
    ks = prng.split(key, 6)
    relin = os.environ.get("FHE_RELIN", "hybrid")
    # setup on the LOCAL CPU backend: eager ops on the remote TPU would each
    # dispatch individually through the tunnel

    def build():
        sk, pk = R.new_key(ks[0], param)
        # hybrid (P-extended) 1-row relin is the production default: L+K
        # digit transforms instead of L^2 (FHE_RELIN=gadget for the legacy
        # RNS-gadget comparison)
        if relin == "hybrid":
            rlk = R.hybrid_rlk1(ks[1], param, sk)
        else:
            rlk = R.rlk_key(ks[1], param, sk)
        m1 = prng.uniform_mod(ks[2], (B, n), t)
        m2 = prng.uniform_mod(ks[3], (B, n), t)
        c1 = R.encrypt(ks[4], param, pk, m1, batch=(B,))
        c2 = R.encrypt(ks[5], param, pk, m2, batch=(B,))
        # expected plaintext product: computing it per run cost ~1-2 min
        # of the mode's alarm slice (O(n log n) CRT mul at B=128, CPU)
        from fhe_study_tpu.ops import ntt as ntt_mod
        from fhe_study_tpu.ops import modops
        want = modops.coerce_i64(ntt_mod.polymul_i64_crt(
            m1.astype(jnp.int64), m2.astype(jnp.int64)), t)
        return dict(sk=sk, rlk=rlk, m1=m1, m2=m2, c1=c1, c2=c2, want=want)

    st = _setup_cached("bfv", (n, t, L, M, B, relin, 2), build)
    sk, rlk, m1, m2, c1, c2 = (st["sk"], st["rlk"], st["m1"], st["m2"],
                               st["c1"], st["c2"])
    krlk = type(rlk)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rlk, c1, c2 = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), dev),
        (rlk, c1, c2))  # sk stays on CPU
    _note("bfv: device upload done")

    chain = int(os.environ.get("FHE_BENCH_CHAIN", 8))
    # eval-resident (NTT-domain) ciphertexts are the production multiply
    # path: mul_e skips all operand forward transforms (FHE_BENCH_EVAL=0
    # benches the legacy coefficient-domain R.mul chain instead)
    evalres = os.environ.get("FHE_BENCH_EVAL", "1") == "1"

    def _mul_chain(x0, x1, y0, y1, rb, ra):
        # `chain` full multiplies per dispatch, each feeding the next
        # (in-graph chaining amortizes the ~3 ms per-call tunnel dispatch).
        # First link runs outside the scan: it establishes the carry dtype
        # (relinearize emits u32 on the fused TPU path, u64 on CPU).
        first = R.mul(param, krlk(rb, ra), R.CT(x0, x1), R.CT(y0, y1))

        def body(c, _):
            o = R.mul(param, krlk(rb, ra), R.CT(c[0], c[1]),
                      R.CT(y0, y1))
            return (o.c0, o.c1), None
        (o0, o1), _ = jax.lax.scan(body, (first.c0, first.c1), None,
                                   length=chain - 1)
        return o0, o1

    def _mul_chain_e(x0, x1, y0, y1, rb, ra):
        # eval-resident chain: operands enter the NTT domain ONCE; every
        # link is a full mul_e (products + scale + relin + P re-entry).
        # UNROLLED (not lax.scan): the scan carry forces layout copies of
        # the ~150 MB CTE tuple per link — measured ~35% slower than the
        # unrolled graph at chain=8.
        ye = R.to_evals(param, R.CT(y0, y1))
        ce = R.to_evals(param, R.CT(x0, x1))
        for _ in range(chain):
            ce = R.mul_e(param, krlk(rb, ra), ce, ye)
        r = R.from_evals(param, ce)
        return r.c0, r.c1

    if evalres:
        mul_jit = jax.jit(lambda x0, x1, y0, y1, rb, ra: tuple(
            R.from_evals(param, R.mul_e(
                param, krlk(rb, ra), R.to_evals(param, R.CT(x0, x1)),
                R.to_evals(param, R.CT(y0, y1))))))
        chain_jit = jax.jit(_mul_chain_e)
    else:
        mul_jit = jax.jit(lambda x0, x1, y0, y1, rb, ra: R.mul(
            param, krlk(rb, ra), R.CT(x0, x1), R.CT(y0, y1)))
        chain_jit = jax.jit(_mul_chain)
    mul = lambda x0, x1, y0, y1: mul_jit(x0, x1, y0, y1, rlk.b, rlk.a)  # noqa: E731
    probe = jax.jit(lambda a: jnp.sum(a[:, 0, :64]))
    args = (c1.c0, c1.c1, c2.c0, c2.c1)
    out = mul(*args)                      # compile + warmup
    float(probe(out[0]))                  # force materialization
    w = chain_jit(*args, rlk.b, rlk.a)    # compile the chained step
    float(probe(w[0]))

    # timing: CHAIN the output into the next multiply (every iteration sees
    # new values — no cache layer can satisfy it) and force a readback
    # inside the window (block_until_ready does not reliably block through
    # the remote-device relay)
    t0 = time.perf_counter()
    cur = (c1.c0, c1.c1)
    for _ in range(iters):
        timed = chain_jit(cur[0], cur[1], c2.c0, c2.c1, rlk.b, rlk.a)
        cur = (timed[0], timed[1])       # noise grows — timing only
    float(probe(timed[0]))
    dt = time.perf_counter() - t0
    # `out` (the single fresh product) is what gets decrypt-verified below

    # correctness spot check (don't bench a broken kernel) — on CPU, with an
    # O(n log n) exact reference product (dense n^2 is infeasible at 2^14)
    import numpy as np
    with jax.default_device(cpu):
        out_cpu = jax.tree.map(lambda x: jax.device_put(x, cpu), out)
        rec = R.decrypt(param, sk, R.CT(out_cpu[0], out_cpu[1]))
    ok = bool((np.asarray(rec) == np.asarray(st["want"])).all())

    value = B * chain * iters / dt
    # butterfly accounting for the roofline fraction: relin digit
    # transforms are L^2 fwd + 2L inv (gadget) or (L+K) fwd + 2(L+K) inv
    # (1-row hybrid, K=2); the eval-resident mul_e drops the 4L+4M operand
    # forwards to 2L+2M (NTT(result) + P re-entry)
    logn = n.bit_length() - 1
    K = 2
    relin_fwd, relin_inv = ((L + K, 2 * (L + K)) if krlk is R.HRLK
                            else (L * L, 2 * L))
    fwd = relin_fwd + (2 * L + 2 * M if evalres else 4 * L + 4 * M)
    n_tr = fwd + (3 * L + 3 * M) + relin_inv
    bf_per_mul = n_tr * logn * (n // 2)
    bf_s = value * bf_per_mul
    extra = {"butterflies_per_sec": round(bf_s, 0)}
    if _NTT_CEILING.get("bf_per_s"):
        extra["roofline_frac"] = round(bf_s / _NTT_CEILING["bf_per_s"], 4)
    return _emit({
        "metric": f"bfv_rns_ctmul_n{n}_L{L}_per_sec_per_chip"
                  + ("" if ok else "_DECRYPT_FAIL"),
        "value": round(value, 3),
        "unit": "ctmul/s",
        "vs_baseline": round(value / 62500.0, 6),
        **extra,
    })


def bench_sweep():
    """dp-batch scaling curve for the headline config on one chip
    (BASELINE.md scaling-efficiency row; run manually, recorded in
    BENCH.md — not part of the default scorecard rotation)."""
    for b in (32, 64, 128, 256):
        os.environ["FHE_BENCH_B"] = str(b)
        try:
            bench_bfv()
        except Exception as e:
            print(json.dumps({"metric": f"bfv_sweep_B{b}_ERROR", "value": 0,
                              "unit": "error", "vs_baseline": 0.0,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
    os.environ.pop("FHE_BENCH_B", None)


def main():
    kind = os.environ.get("FHE_BENCH_KIND", "all")
    if kind == "sweep":
        bench_sweep()
        return
    modes = {
        # order: kernel roofline first (cheap; sets the ceiling the headline
        # quotes), then the HEADLINE (bfv ct-mul) so it lands no matter what
        # the driver's wall-clock budget is, then the remaining CHEAP modes,
        # and ckks_boot — the most expensive AND most fragile mode (multi-GB
        # C-blocking upload the alarm cannot preempt) — strictly LAST, so a
        # boot stall can only cost boot itself (r4 lost tfhe_prod to the
        # tail squeeze after boot).  The headline's line is re-emitted after
        # every later mode and once more at the end — the driver parses the
        # FINAL JSON line of the run.
        "ntt": bench_ntt,
        "bfv": bench_bfv,
        "bfv_linear": bench_bfv_linear,
        "ckks": bench_ckks,
        "tfhe": bench_tfhe,
        "tfhe_prod": bench_tfhe_prod,
        "ckks_boot": bench_ckks_boot,
    }
    if kind != "all":
        modes[kind]()
        return
    import signal
    import sys
    import traceback
    # global wall-clock budget, split across modes: rounds 2 AND 3 lost
    # scorecard lines to a driver-side `timeout` kill (rc=124) — the run
    # must finish INSIDE THE DRIVER'S ~30-min window (which also includes
    # bench.py's own multi-minute startup), with every config either
    # measured, errored, or SKIPPED.  1200 s of measured modes + startup
    # fits with margin.  ckks_boot (the most expensive mode) runs right
    # after the headline so a kill can only cost the cheap tail modes; the
    # headline re-emits after every mode either way.
    # warm-cache measurements (r4): ntt ~2.5 min, bfv ~5, linear ~1.5,
    # ckks ~2, ckks_boot 379-449 s (seeded keys + em sources; was ~11 min
    # — but the 1.2 GB relay upload is C-blocking and high-variance, so
    # boot runs AFTER the cheap modes: an upload stall then costs only the
    # tfhe tail, not the whole scorecard), tfhe/tfhe_prod ~3 each ->
    # ~25 min total incl startup, inside the driver's ~30-min window
    total = int(os.environ.get("FHE_BENCH_TOTAL_BUDGET", 1550))
    # per-mode ceilings (compile-heavy modes need more; measured r02-r04).
    # r5: host-side setups are now disk-cached (_setup_cached), so a warm
    # mode's slice covers only load + upload + cached-compile + measure —
    # the r4 tfhe_prod keygen-in-slice death can't recur warm.  NB a mode
    # whose FIRST compile exceeds its slice can never populate the
    # persistent cache (the alarm kills the wait before the cache write) —
    # builders must pre-warm new graphs with FHE_BENCH_KIND=<mode>
    # standalone runs, which have no alarm.
    # bfv_linear 150 -> 220: the r5 full run lost it to cold setup build +
    # u64 upload inside the slice (setup now disk-cached, wire now u32/u8)
    # tfhe/tfhe_prod 200 -> 260: the r5 full run showed tfhe_prod's warm
    # path alone needs ~90s of load+upload (276 MB setup) before compile
    # and measure even start
    cap = {"ntt": 280, "bfv": 330, "bfv_linear": 220, "ckks": 260,
           "tfhe": 260, "tfhe_prod": 260, "ckks_boot": 10 ** 6}
    # ckks_boot runs LAST: its cap is effectively `left` — the whole
    # remaining budget (r5 run measured cheap modes at ~650 s warm-ish,
    # leaving ~900 s; the old 600 cap starved it under host contention)
    # initialize the device backend BEFORE the mode loop: the first
    # jax.devices() pays the axon tunnel handshake (~30-60 s), which must
    # not be charged against the first mode's alarm slice
    jax.block_until_ready(jax.device_put(jnp.zeros((8, 128), jnp.uint32),
                                         jax.devices()[0]))
    t_start = time.monotonic()
    headline = None

    def _on_alarm(signum, frame):
        raise TimeoutError("bench mode exceeded its wall-clock slice")

    signal.signal(signal.SIGALRM, _on_alarm)
    for name, fn in modes.items():
        left = total - (time.monotonic() - t_start)
        slice_s = int(min(cap.get(name, 300), left))
        if slice_s < 30:
            print(json.dumps({"metric": f"{name}_SKIPPED", "value": 0,
                              "unit": "skipped", "vs_baseline": 0.0,
                              "error": f"budget exhausted ({left:.0f}s left)"}),
                  flush=True)
            continue
        try:
            signal.alarm(slice_s)
            res = fn()
            if name == "bfv":
                headline = res
        except Exception as e:  # one broken config must not hide the rest
            traceback.print_exc(file=sys.stderr)
            print(json.dumps({"metric": f"{name}_ERROR", "value": 0,
                              "unit": "error", "vs_baseline": 0.0,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
        finally:
            signal.alarm(0)
            # release the mode's device buffers promptly: lingering arrays
            # from earlier modes pressure the HBM allocator during
            # ckks_boot's multi-GB upload (measured in-run slowdowns vs
            # the same mode standalone)
            import gc
            gc.collect()
        if headline is not None and name != "bfv":
            _emit(headline)   # crash-proof: final line is always the headline
    if headline is not None:
        _emit(headline)


if __name__ == "__main__":
    main()
