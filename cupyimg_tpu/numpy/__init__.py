"""NumPy gap-fillers (reference cupyimg/numpy, SURVEY.md C17).

The reference backfilled functions missing from CuPy at the time
(convolve/correlate/gradient/histogram*/ravel_multi_index/apply_along_axis/
ndim/quantile).  jax.numpy already provides most of them natively, so this
module is a parity shim: 1-d convolve/correlate route through the stencil
engine with numpy's exact dtype semantics (``dtype_mode='numpy'``, reference
filters.py:470-489); the rest re-export jnp implementations.
"""

from __future__ import annotations

import numpy as _np
import jax.numpy as _jnp

from cupyimg_tpu.scipy.ndimage import filters as _filters

__all__ = [
    "convolve",
    "correlate",
    "gradient",
    "histogram",
    "histogram2d",
    "histogramdd",
    "ravel_multi_index",
    "apply_along_axis",
    "ndim",
    "quantile",
]

# direct jnp delegations (native in jax.numpy)
ravel_multi_index = _jnp.ravel_multi_index
apply_along_axis = _jnp.apply_along_axis
quantile = _jnp.quantile


# first-party numpy-parity histograms (int/complex weight dtypes, empty
# input, monotonic-bins validation — see lib/histograms.py).  Imported after
# the jnp delegations above so lib/__init__'s back-references resolve.
from cupyimg_tpu.numpy.lib.histograms import (  # noqa: E402
    histogram,
    histogram2d,
    histogramdd,
)

# first-party numpy-parity gradient (edge_order 1/2, uneven spacing,
# numpy error classes — see lib/function_base.py)
from cupyimg_tpu.numpy.lib.function_base import gradient  # noqa: E402


def ndim(a):
    """Number of dimensions (works on any array-like)."""
    if hasattr(a, "ndim"):
        return a.ndim
    return _np.ndim(a)


def _np_conv_corr(a, v, mode, convolution):
    a = _jnp.asarray(a)
    v = _jnp.asarray(v)
    if a.ndim != 1 or v.ndim != 1:
        raise ValueError("object too deep for desired array")
    if a.shape[0] == 0 or v.shape[0] == 0:
        raise ValueError("v cannot be empty")
    inverted = False
    if v.shape[0] > a.shape[0]:
        a, v = v, a
        inverted = True
    n, k = a.shape[0], v.shape[0]
    if convolution:
        full = _filters.convolve1d(
            a, v, mode="constant", cval=0.0, crop=False, dtype_mode="numpy"
        )
    else:
        full = _filters.correlate1d(
            a, v, mode="constant", cval=0.0, crop=False, dtype_mode="numpy"
        )
    length = n + k - 1
    if mode == "full":
        out = full
    elif mode == "same":
        start = (length - n) // 2
        out = full[start: start + n]
    elif mode == "valid":
        out_len = n - k + 1
        start = (length - out_len) // 2
        out = full[start: start + out_len]
    else:
        raise ValueError(
            f"mode must be one of 'full', 'same', 'valid'; got {mode}"
        )
    if inverted and not convolution:
        # numpy applies the mode window before un-swapping: flip+conj last
        out = _jnp.flip(out).conj()
    return out


def convolve(a, v, mode="full"):
    """1-d convolution with numpy's exact semantics (reference
    cupyimg/numpy/core/numeric.py:12-134)."""
    return _np_conv_corr(a, v, mode, True)


def correlate(a, v, mode="valid"):
    """1-d correlation with numpy's exact semantics (conjugates ``v``)."""
    return _np_conv_corr(a, v, mode, False)
