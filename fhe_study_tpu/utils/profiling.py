"""Observability: wall-clock op timing, roofline estimates, noise budget.

The reference has no tracing/metrics beyond `Instant::now()` prints in one
test (SURVEY §5).  This module provides:
  * `timed` — block/fn wall timing with device sync
  * `ntt_roofline` — per-kernel speed-of-light model (butterflies vs HBM)
  * `noise_budget_bits` — the FHE health metric (log2 of remaining headroom),
    generalizing the reference's only probe, `infinity_norm`
    (reference arith/src/ring_nq.rs:347-358)
  * `trace` — context manager around jax.profiler for TPU timeline capture
"""

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def timed(label: str, results: dict | None = None):
    t0 = time.perf_counter()
    yield
    # caller is responsible for block_until_ready on async results
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Compile, warm up, and time fn; returns seconds/iteration."""
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass
class Roofline:
    butterflies: int
    hbm_bytes: int
    secs: float

    @property
    def butterflies_per_sec(self):
        return self.butterflies / self.secs

    @property
    def hbm_gbps(self):
        return self.hbm_bytes / self.secs / 1e9

    def report(self, peak_gbps: float = 819.0):
        """v5e HBM peak ≈ 819 GB/s; an NTT stage chain is HBM-bound unless
        stages fuse in VMEM."""
        return {
            "butterflies_per_sec": self.butterflies_per_sec,
            "hbm_gbps": self.hbm_gbps,
            "hbm_fraction_of_peak": self.hbm_gbps / peak_gbps,
        }


def ntt_roofline(batch: int, n: int, secs: float, dtype_bytes: int = 8):
    """Model: log2(n) stages × n/2 butterflies; each stage reads+writes the
    full array once from HBM in the unfused worst case."""
    logn = n.bit_length() - 1
    return Roofline(
        butterflies=batch * logn * (n // 2),
        hbm_bytes=batch * logn * 2 * n * dtype_bytes,
        secs=secs,
    )


def noise_budget_bits(phase_err, q: int) -> jnp.ndarray:
    """log2(q / (2·|err|)) — bits of headroom before decryption fails.
    phase_err: centered error array (int64)."""
    e = jnp.maximum(jnp.abs(phase_err).astype(jnp.float64), 1.0)
    return jnp.log2(float(q) / (2.0 * e))


@contextlib.contextmanager
def trace(dirname: str = "/tmp/fhe_trace"):
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
