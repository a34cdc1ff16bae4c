"""Convex-analysis special functions.

The reference implements these as fused CUDA ElementwiseKernels with a
device-function preamble (cupyimg/scipy/special/_convex_analysis.py:1-147,
SURVEY.md C15/N10); on TPU they are plain jnp expressions that XLA fuses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["entr", "kl_div", "rel_entr", "huber", "pseudo_huber"]


def _as_float(x):
    x = jnp.asarray(x)
    if np.dtype(x.dtype).kind != "f":
        x = x.astype(np.float64)
    elif x.dtype == np.float16:
        # scipy's ufuncs have only f/d loops: float16 promotes to float32
        # (also avoids spurious overflow in the intermediate squares)
        x = x.astype(np.float32)
    return x


def entr(x):
    """-x*log(x) for x>0, 0 at x=0, -inf for x<0 (scipy parity)."""
    x = _as_float(x)
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(
        x > 0,
        -safe * jnp.log(safe),
        jnp.where(x == 0, 0.0, -jnp.inf),
    )


def kl_div(x, y):
    """x*log(x/y) - x + y (scipy parity, with the 0/inf edge cases)."""
    x = _as_float(x)
    y = _as_float(y)
    both = jnp.broadcast_arrays(x, y)
    x, y = both
    safe_x = jnp.where(x > 0, x, 1.0)
    safe_y = jnp.where(y > 0, y, 1.0)
    main = safe_x * jnp.log(safe_x / safe_y) - x + y
    return jnp.where(
        (x > 0) & (y > 0),
        main,
        jnp.where((x == 0) & (y >= 0), y, jnp.inf),
    )


def rel_entr(x, y):
    """x*log(x/y) (scipy parity edge cases)."""
    x = _as_float(x)
    y = _as_float(y)
    x, y = jnp.broadcast_arrays(x, y)
    safe_x = jnp.where(x > 0, x, 1.0)
    safe_y = jnp.where(y > 0, y, 1.0)
    main = safe_x * jnp.log(safe_x / safe_y)
    return jnp.where(
        (x > 0) & (y > 0),
        main,
        jnp.where((x == 0) & (y >= 0), 0.0, jnp.inf),
    )


def huber(delta, r):
    """Huber loss (scipy parity)."""
    delta = _as_float(delta)
    r = _as_float(r)
    delta, r = jnp.broadcast_arrays(delta, r)
    abs_r = jnp.abs(r)
    quad = 0.5 * r * r
    lin = delta * (abs_r - 0.5 * delta)
    return jnp.where(delta < 0, jnp.inf, jnp.where(abs_r <= delta, quad, lin))


def pseudo_huber(delta, r):
    """Pseudo-Huber loss (scipy parity)."""
    delta = _as_float(delta)
    r = _as_float(r)
    delta, r = jnp.broadcast_arrays(delta, r)
    safe_delta = jnp.where(delta != 0, delta, 1.0)
    rd = r / safe_delta
    val = delta * delta * (jnp.sqrt(1 + rd * rd) - 1)
    return jnp.where(delta < 0, jnp.inf,
                     jnp.where(delta == 0, 0.0, val))
