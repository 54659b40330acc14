"""Rounding helpers.

The reference implementation rounds everywhere with Rust's ``f64::round`` which
is round-half-away-from-zero, while ``jnp.round`` is round-half-to-even.  Every
mod-switch / rescale / encode path in this library therefore goes through
:func:`round_half_away` to reproduce the reference semantics
(cf. reference arith/src/zq.rs:137, arith/src/torus.rs:69, arith/src/ring_nq.rs:110).
"""

import jax.numpy as jnp


def round_half_away(x):
    """Round-half-away-from-zero for float arrays.

    Implemented as trunc(x) + sign adjustment on the fractional part, which is
    exact in IEEE f64 (avoids the ``floor(x + 0.5)`` double-rounding edge at
    x = nextafter(0.5, 0)).
    """
    t = jnp.trunc(x)
    frac = x - t
    bump = jnp.where(jnp.abs(frac) >= 0.5, jnp.sign(frac), 0.0)
    return t + bump


def round_half_away_int(x):
    """round_half_away and cast to int64."""
    return round_half_away(x).astype(jnp.int64)
