"""N-dimensional stencil engines.

TPU-native replacement for the reference's runtime CUDA stencil codegen
(`cupyimg/scipy/ndimage/_filters_core.py:190-348` ``_generate_nd_kernel`` and
the masked variant `cupyimg/scipy/ndimage/_kernels/filters_v2.py:17-72`).

Design (SURVEY.md §7): instead of emitting one CUDA kernel per
(ndim, kernel shape, mode, dtype), a single Python engine expresses the
stencil as *boundary-extend + weighted shifted-slice accumulation*; tracing +
jit caching specialize per static configuration, and XLA fuses the slice
reads into one bandwidth-bound loop.  For large dense float kernels the
engine instead routes to ``lax.conv_general_dilated`` (the MXU path).  The
reference's sparse-weights masked kernel (its ``use_weights_mask=True``
crossover, filters.py:95-99) is subsumed: concrete zero taps are skipped
statically at trace time.

All engines take *normalized* arguments (per-axis origins, validated mode);
argument munging lives in the scipy.ndimage API layer.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cupyimg_tpu.core import boundary

# Above this many taps, dense float correlations route to XLA conv (MXU)
# rather than unrolled shift-add (VPU): compile time and HBM traffic both
# favor the conv path for large kernels.
_CONV_TAP_THRESHOLD = 32


def footprint_pad_width(shape, origins):
    """Per-axis (lo, hi) boundary extension for a filter footprint.

    scipy convention: the window for output element ``i`` covers input
    elements ``i + k - size//2 - origin`` for ``k in range(size)``
    (reference _filters_core.py:63-76 + generated index math), hence
    ``lo = size//2 + origin`` and ``hi = size - 1 - lo``.
    """
    pad = []
    for size, origin in zip(shape, origins):
        lo = size // 2 + origin
        pad.append((lo, size - 1 - lo))
    return pad


def _iter_taps(weights):
    """Yield (offset-tuple, weight-scalar) taps.

    If ``weights`` is a concrete (numpy) array, zero taps are skipped
    statically — this replaces the reference's masked sparse-weights kernel
    (filters_v2.py:17-72) with trace-time specialization.
    """
    if isinstance(weights, np.ndarray):
        nz = np.argwhere(weights != 0)
        for idx in nz:
            idx = tuple(int(i) for i in idx)
            yield idx, weights[idx]
    else:
        for idx in itertools.product(*(range(s) for s in weights.shape)):
            yield idx, weights[idx]


def correlate_shift_add(
    x,
    weights,
    mode: str,
    cval,
    origins,
    acc_dtype,
):
    """Dense nd correlation via boundary-extend + shifted-slice accumulation.

    ``out[i] = sum_k weights[k] * x[i + k - size//2 - origin]`` — exactly the
    loop the reference unrolls into CUDA (_filters_core.py:248-311), here as
    jnp ops XLA fuses into a single pass.  Supports every dtype (int/bool/
    float/complex).  ``weights`` may be a concrete numpy array (zero taps
    skipped) or a traced jnp array.
    """
    pad_width = footprint_pad_width(weights.shape, origins)
    xp = boundary.pad(x, pad_width, mode, cval).astype(acc_dtype)
    out = None
    for offsets, w in _iter_taps(weights):
        sl = tuple(
            slice(o, o + n) for o, n in zip(offsets, x.shape)
        )
        term = jnp.asarray(w).astype(acc_dtype) * xp[sl]
        out = term if out is None else out + term
    if out is None:  # all-zero weights
        out = jnp.zeros(x.shape, acc_dtype)
    return out


def correlate_conv(x, weights, mode: str, cval, origins, acc_dtype):
    """Dense nd correlation via ``lax.conv_general_dilated`` (MXU path).

    Used for large dense real-float kernels with ndim <= 3.  XLA's conv is a
    cross-correlation, matching scipy.ndimage.correlate's index convention
    after boundary pre-extension.
    """
    pad_width = footprint_pad_width(weights.shape, origins)
    xp = boundary.pad(x, pad_width, mode, cval).astype(acc_dtype)
    w = jnp.asarray(weights).astype(acc_dtype)
    ndim = x.ndim
    lhs = xp[None, None]  # N=1, C=1, spatial...
    rhs = w[None, None]  # O=1, I=1, spatial...
    dn = lax.conv_dimension_numbers(
        lhs.shape,
        rhs.shape,
        (
            "NC" + "DHW"[3 - ndim :],
            "OI" + "DHW"[3 - ndim :],
            "NC" + "DHW"[3 - ndim :],
        ),
    )
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,) * ndim,
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=acc_dtype,
        precision=lax.Precision.HIGHEST,
    )
    return out[0, 0]


def correlate_nd(x, weights, mode, cval, origins, acc_dtype):
    """Dispatch dense nd correlation.

    Priority on TPU: the fused Pallas dense stencil (one HBM pass,
    unrolled nonzero-tap FMAs in VMEM); weights that are concrete jnp
    arrays are pulled to numpy so the Pallas path and its static
    zero-tap skipping apply.  ``lax.conv_general_dilated`` is never
    used on TPU: single-channel convs lower catastrophically on v5e
    (measured 5.6 s for a 15x15 kernel on 4096^2 — ~500x slower than
    the Pallas engine) and 31x31 crashed the TPU runtime outright.
    """
    if not isinstance(weights, np.ndarray) and not isinstance(
        weights, jax.core.Tracer
    ):
        weights = np.asarray(weights)

    if np.dtype(acc_dtype).kind == "f" and np.dtype(
        acc_dtype
    ).itemsize <= 4:
        from cupyimg_tpu.ops import pallas_stencil as _ps

        xw = x.astype(acc_dtype)
        if _ps.supports_dense(xw, weights):
            return _ps.fused_dense_correlate(
                xw,
                np.asarray(weights, np.float64),
                origins,
                mode,
                cval,
            )

    n_taps = int(np.prod(weights.shape))
    use_conv = (
        n_taps > _CONV_TAP_THRESHOLD
        and 1 <= x.ndim <= 3
        and np.dtype(acc_dtype).kind == "f"
        and not isinstance(weights, np.ndarray)  # concrete: sparse skip wins
        and jax.default_backend() != "tpu"
    )
    if use_conv:
        return correlate_conv(x, weights, mode, cval, origins, acc_dtype)
    return correlate_shift_add(x, weights, mode, cval, origins, acc_dtype)


def correlate1d_axis(x, weights1d, axis: int, mode, cval, origin, acc_dtype):
    """1-d correlation along one axis of an nd array.

    The reference reshapes 1-d weights into an nd singleton kernel
    (_filters_core.py:51-60 ``_convert_1d_args``); here the same trick.

    Symmetric / antisymmetric odd kernels fold pairs scipy-style
    (``w[mid+k]*(x[i+k] ± x[i-k])``, NI_Correlate1D's special case):
    same flop order as scipy, so last-ulp rounding — which integer
    truncation amplifies to ±1 — matches exactly.
    """
    size = weights1d.shape[0]
    if (
        isinstance(weights1d, np.ndarray)
        and origin == 0
        and size > 1
        and size % 2 == 1
        and np.dtype(acc_dtype).kind in "fc"
    ):
        mid = size // 2
        w = weights1d
        sym = bool(np.array_equal(w[:mid], w[:mid:-1]))
        asym = bool(np.array_equal(w[:mid], -w[:mid:-1]))
        if sym or asym:
            pad_width = [(0, 0)] * x.ndim
            pad_width[axis] = (mid, mid)
            xp = boundary.pad(x, pad_width, mode, cval).astype(acc_dtype)
            n = x.shape[axis]

            def seg(k):  # slice at tap offset k (0..size-1)
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(k, k + n)
                return xp[tuple(sl)]

            wc = jnp.asarray(w[mid]).astype(acc_dtype)
            out = wc * seg(mid) if w[mid] != 0 else None
            for k in range(1, mid + 1):
                if w[mid + k] == 0:
                    continue
                pair = seg(mid + k) + seg(mid - k) if sym else (
                    seg(mid + k) - seg(mid - k))
                term = jnp.asarray(w[mid + k]).astype(acc_dtype) * pair
                out = term if out is None else out + term
            if out is None:
                out = jnp.zeros(x.shape, acc_dtype)
            return out
    shape = [1] * x.ndim
    shape[axis] = size
    w_nd = weights1d.reshape(shape)
    origins = [0] * x.ndim
    origins[axis] = origin
    return correlate_shift_add(x, w_nd, mode, cval, origins, acc_dtype)


def reduce_window(
    x,
    offsets,
    mode: str,
    cval,
    reducer,
    init=None,
):
    """Running reduction over footprint taps without materializing windows.

    Drives min/max filters and binary/grey morphology: ``reducer`` combines
    the accumulator with each shifted slice (e.g. ``jnp.minimum``).  TPU-native
    replacement for the reference's generated min-or-max kernel
    (filters.py:1510-1556) — sequential tap accumulation fuses into one pass.

    Parameters
    ----------
    offsets : list of (offset-tuple, pad_width) produced by the caller via
        ``footprint_offsets``.
    """
    taps, pad_width = offsets
    xp = boundary.pad(x, pad_width, mode, cval)
    out = init
    for off in taps:
        sl = tuple(slice(o, o + n) for o, n in zip(off, x.shape))
        piece = xp[sl]
        out = piece if out is None else reducer(out, piece)
    return out


def footprint_offsets(footprint, origins):
    """Static (offsets, pad_width) for a boolean footprint (numpy array)."""
    footprint = np.asarray(footprint)
    pad_width = footprint_pad_width(footprint.shape, origins)
    taps = [tuple(int(i) for i in idx) for idx in np.argwhere(footprint)]
    return taps, pad_width


def gather_windows(x, footprint, origins, mode: str, cval):
    """Materialize footprint windows as a stacked (K, *x.shape) array.

    Used by the rank/median/percentile engine where a running reduction is
    impossible (k-th order statistic needs the whole window; reference
    filters.py:1712-1848).  Memory cost K x volume — the Pallas rank kernel
    (ops/pallas kernels) avoids this on TPU for large volumes.
    """
    taps, pad_width = footprint_offsets(footprint, origins)
    xp = boundary.pad(x, pad_width, mode, cval)
    parts = []
    for off in taps:
        sl = tuple(slice(o, o + n) for o, n in zip(off, x.shape))
        parts.append(xp[sl])
    return jnp.stack(parts, axis=0)
