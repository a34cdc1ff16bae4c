"""scipy.ndimage filters on TPU-native JAX engines.

API parity with reference cupyimg/scipy/ndimage/filters.py (SURVEY.md C8):
correlate/convolve (+1d), separable uniform/gaussian filters, derivative
filters (prewitt/sobel/laplace family), min/max filters, and
rank/median/percentile filters, all with the 8 ndimage boundary modes, the
``dtype_mode`` precision policy, and complex-dtype support.

Differences from the reference driven by the functional JAX model:

- ``output`` may be a dtype (or None) but not a preallocated array.
- weights passed as numpy arrays are specialized at trace time (zero taps
  skipped), subsuming the reference's ``use_weights_mask`` sparse path
  (reference filters.py:95-99).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cupyimg_tpu.core import boundary, dtypes, util
from cupyimg_tpu.core.config import config
from cupyimg_tpu.ops import stencil

__all__ = [
    "generic_filter",
    "generic_filter1d",
    "correlate",
    "convolve",
    "correlate1d",
    "convolve1d",
    "uniform_filter",
    "uniform_filter1d",
    "gaussian_filter",
    "gaussian_filter1d",
    "prewitt",
    "sobel",
    "generic_laplace",
    "laplace",
    "gaussian_laplace",
    "generic_gradient_magnitude",
    "gaussian_gradient_magnitude",
    "minimum_filter",
    "maximum_filter",
    "minimum_filter1d",
    "maximum_filter1d",
    "rank_filter",
    "median_filter",
    "percentile_filter",
]


def _default_dtype_mode(dtype_mode):
    return config.default_dtype_mode if dtype_mode is None else dtype_mode


def _as_weights(weights):
    """Keep concrete weights as numpy (static tap skipping); pass traced through."""
    if isinstance(weights, (np.ndarray, list, tuple)) or np.isscalar(weights):
        return np.asarray(weights)
    return jnp.asarray(weights)


def _flip_all(w):
    sl = tuple([slice(None, None, -1)] * w.ndim)
    return w[sl]


def _cast_output(acc, out_dtype):
    """Cast accumulator to the output dtype with ndimage semantics.

    scipy.ndimage truncates toward zero for integer outputs (C cast), which
    matches ``astype``; complex->real drops the imaginary part.
    """
    out_dtype = np.dtype(out_dtype)
    if np.dtype(acc.dtype).kind == "c" and out_dtype.kind != "c":
        acc = acc.real
    if out_dtype.kind in "iu" and np.dtype(acc.dtype).kind == "f":
        # scipy's C cast truncates toward zero and wraps on overflow (incl.
        # negative -> unsigned); JAX saturates, so go through int64.  Values
        # beyond int64 range (uint64 intermediates round-tripped through
        # f64) are first reduced mod 2^64 into the int64 window — the
        # float->int64 conversion itself saturates, which would otherwise
        # pin them at int64 max instead of wrapping.
        acc = jnp.trunc(acc)
        two63, two64 = 2.0 ** 63, 2.0 ** 64
        big = (acc >= two63) | (acc < -two63)
        wrapped = acc - jnp.floor(acc / two64) * two64
        wrapped = jnp.where(wrapped >= two63, wrapped - two64, wrapped)
        acc = jnp.where(big, wrapped, acc).astype(np.int64)
    return acc.astype(out_dtype)


def _check_nd_weights(input, weights, origin):
    """Validate weights rank and normalize per-axis origins
    (reference _filters_core.py:63-76 ``_check_nd_args``)."""
    if weights.ndim != input.ndim:
        raise RuntimeError("filter weights array has incorrect shape")
    origins = util.fix_sequence_arg(origin, input.ndim, "origin", int)
    for o, w in zip(origins, weights.shape):
        util.check_origin(o, w)
    return origins


def _correlate_or_convolve(
    input,
    weights,
    output,
    mode,
    cval,
    origin,
    convolution=False,
    dtype_mode=None,
):
    """Shared driver (reference filters.py:441-495)."""
    dtype_mode = _default_dtype_mode(dtype_mode)
    input = jnp.asarray(input)
    weights = _as_weights(weights)
    boundary.check_mode(mode)
    origins = _check_nd_weights(input, weights, origin)
    if weights.size == 0:
        return jnp.zeros_like(input)
    util.check_cval(
        mode, cval, dtypes.is_integer_dtype(output or input.dtype)
    )

    if convolution:
        # convolve(x, w) == correlate(x, flip(w)) with mirrored origins
        # (even sizes shift by one) — scipy convention.
        weights = _flip_all(weights)
        origins = [
            -o - 1 if wsize % 2 == 0 else -o
            for o, wsize in zip(origins, weights.shape)
        ]
    elif np.dtype(weights.dtype).kind == "c":
        # numpy.correlate conjugates weights rather than input
        weights = weights.conj()

    if dtype_mode == "numpy":
        # used by the signal/numpy layers: no float promotion of int inputs
        out_dtype = np.promote_types(input.dtype, weights.dtype)
        acc_dtype = out_dtype
        if acc_dtype == np.float16:
            acc_dtype = np.dtype(np.float32)
        if output is not None:
            raise ValueError(
                "dtype_mode == 'numpy' does not support the output argument"
            )
    else:
        acc_dtype = dtypes.promote_weights_dtype(
            input.dtype, weights.dtype, dtype_mode
        )
        out_dtype = dtypes.resolve_output_dtype(output, input.dtype, acc_dtype)

    if input.size == 0:  # scipy passes empty inputs through shape-preserved
        return jnp.zeros(input.shape, out_dtype)
    acc = stencil.correlate_nd(input, weights, mode, cval, origins, acc_dtype)
    return _cast_output(acc, out_dtype)


def correlate(
    input,
    weights,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    use_weights_mask=False,
    axes=None,
    dtype_mode=None,
):
    """Multi-dimensional correlation (scipy.ndimage.correlate parity).

    ``use_weights_mask`` is accepted for reference API parity
    (reference filters.py:65-134) but is a no-op: concrete zero weights are
    always skipped at trace time here.  ``axes`` restricts correlation to
    those axes (scipy >= 1.15): weights spans len(axes) dims.
    """
    del use_weights_mask
    ndim = jnp.ndim(input)
    ax = util.check_axes(axes, ndim)
    if len(ax) != ndim:
        weights = _axes_embed_array(weights, ax, ndim, "filter weights")
        origin = util.expand_axes_arg(origin, ax, ndim, "origin", 0, int)
    return _correlate_or_convolve(
        input, weights, output, mode, cval, origin, False, dtype_mode
    )


def convolve(
    input,
    weights,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    use_weights_mask=False,
    axes=None,
    dtype_mode=None,
):
    """Multi-dimensional convolution (scipy.ndimage.convolve parity;
    ``axes`` as in :func:`correlate`)."""
    del use_weights_mask
    ndim = jnp.ndim(input)
    ax = util.check_axes(axes, ndim)
    if len(ax) != ndim:
        weights = _axes_embed_array(weights, ax, ndim, "filter weights")
        origin = util.expand_axes_arg(origin, ax, ndim, "origin", 0, int)
    return _correlate_or_convolve(
        input, weights, output, mode, cval, origin, True, dtype_mode
    )


def _correlate1d(
    input, weights, axis, output, mode, cval, origin, convolution, dtype_mode,
    crop=True,
):
    """1-d correlate/convolve along an axis (reference filters.py:213-438).

    ``crop=False`` returns the 'full' correlation of length n+size-1 along
    ``axis`` (reference extension used by numpy.convolve/correlate).
    """
    dtype_mode = _default_dtype_mode(dtype_mode)
    input = jnp.asarray(input)
    weights = _as_weights(weights)
    if weights.ndim != 1:
        raise RuntimeError("weights must be 1-d")
    boundary.check_mode(mode)
    axis = util.check_axis(axis, input.ndim)
    origin = int(origin)
    if crop:
        util.check_origin(origin, weights.shape[0])
    if convolution:
        weights = weights[::-1]
        origin = -origin
        if weights.shape[0] % 2 == 0:
            origin -= 1
    elif np.dtype(weights.dtype).kind == "c":
        weights = weights.conj()

    if dtype_mode == "numpy":
        out_dtype = np.promote_types(input.dtype, weights.dtype)
        acc_dtype = out_dtype
        if acc_dtype == np.float16:
            acc_dtype = np.dtype(np.float32)
        if output is not None:
            raise ValueError(
                "dtype_mode == 'numpy' does not support the output argument"
            )
    else:
        acc_dtype = dtypes.promote_weights_dtype(
            input.dtype, weights.dtype, dtype_mode
        )
        out_dtype = dtypes.resolve_output_dtype(output, input.dtype, acc_dtype)

    if crop and input.size == 0:  # scipy shape-preserves empty inputs
        return jnp.zeros(input.shape, out_dtype)
    if crop:
        acc = stencil.correlate1d_axis(
            input, weights, axis, mode, cval, origin, acc_dtype
        )
    else:
        acc = _full_correlate1d(input, weights, axis, mode, cval, acc_dtype)
    return _cast_output(acc, out_dtype)


def _full_correlate1d(x, weights, axis, mode, cval, acc_dtype):
    """'full' 1-d correlation: output length n + size - 1 along ``axis``."""
    size = weights.shape[0]
    n = x.shape[axis]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (size - 1, size - 1)
    xp = boundary.pad(x, pad_width, mode, cval).astype(acc_dtype)
    out = None
    out_len = n + size - 1
    for k in range(size):
        w = weights[k]
        if isinstance(weights, np.ndarray) and w == 0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + out_len)
        term = jnp.asarray(w).astype(acc_dtype) * xp[tuple(sl)]
        out = term if out is None else out + term
    if out is None:
        shape = list(x.shape)
        shape[axis] = out_len
        out = jnp.zeros(shape, acc_dtype)
    return out


def correlate1d(
    input,
    weights,
    axis=-1,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    backend=None,
    dtype_mode=None,
    crop=True,
):
    """1-d correlation along the given axis (scipy.ndimage.correlate1d parity).

    ``backend`` is accepted for reference API parity (its 'fast_upfirdn'
    external-CUDA path, reference filters.py:213-260) but ignored: there is a
    single first-party engine here.
    """
    del backend
    return _correlate1d(
        input, weights, axis, output, mode, cval, origin, False, dtype_mode,
        crop=crop,
    )


def convolve1d(
    input,
    weights,
    axis=-1,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    backend=None,
    dtype_mode=None,
    crop=True,
):
    """1-d convolution along the given axis (scipy.ndimage.convolve1d parity)."""
    del backend
    if not crop:
        # full convolution: flip weights, no origin games needed.  The
        # correlate path conjugates complex weights (numpy.correlate
        # semantics); convolution must not, so pre-conjugate to cancel.
        w = _as_weights(weights)[::-1]
        if np.dtype(w.dtype).kind == "c":
            w = w.conj()
        return _correlate1d(
            input,
            w,
            axis,
            output,
            mode,
            cval,
            0,
            False,
            dtype_mode,
            crop=False,
        )
    return _correlate1d(
        input, weights, axis, output, mode, cval, origin, True, dtype_mode
    )


# ---------------------------------------------------------------------------
# separable smoothing filters
# ---------------------------------------------------------------------------


def _try_fused_separable(x, axes_params, out_dtype, cval_required=None):
    """Route a chain of per-axis 1-d correlations to the fused Pallas
    kernel (ops/pallas_stencil) when it applies: TPU backend, float
    data, 2-/3-d, small static taps.  Returns None when the jnp path
    should run instead."""
    from cupyimg_tpu.ops import pallas_stencil as _ps

    if np.dtype(out_dtype).kind != "f":
        return None
    if np.dtype(x.dtype).kind != "f" or np.dtype(x.dtype).itemsize > 4:
        return None
    weights = [None] * x.ndim
    origins = [0] * x.ndim
    modes = ["reflect"] * x.ndim
    cvals = set()
    for axis, w, mode, cval, origin in axes_params:
        if w is None:
            continue
        if weights[axis] is not None:
            return None  # two passes on one axis: not fusable
        weights[axis] = tuple(float(v) for v in np.asarray(w))
        origins[axis] = int(origin)
        modes[axis] = mode
        cvals.add(float(cval))
    if len(cvals) > 1:
        return None
    cval = cvals.pop() if cvals else 0.0
    if cval != 0.0 and any(
        m in ("constant", "grid-constant") for m in modes
    ):
        # The fused kernel extends the RAW input once with cval; scipy's
        # separable filters re-extend each pass's OUTPUT with cval.  The
        # two agree iff cval is 0 or every filtered axis's taps sum to 1
        # (uniform/gaussian-order-0); derivative kernels must take the
        # sequential path.
        for w in weights:
            if w is not None and abs(sum(w) - 1.0) > 1e-9:
                return None
    if not _ps.supports(x, weights):
        return None
    # NO try/except here: _ps.supports() is the applicability gate, and
    # a failure past it is a kernel bug that must surface loudly — a
    # silent fallback converts kernel bugs into invisible 4x slowdowns
    # (round-1 postmortem: the padless lane-matmul unpack bug shipped
    # exactly this way).
    out = _ps.fused_separable_correlate(
        x,
        tuple(weights),
        tuple(origins),
        tuple(modes),
        cval,
    )
    return out.astype(out_dtype)


def _run_1d_filters(input, axes_params, output, dtype_mode):
    """Apply a chain of per-axis 1-d correlations (reference
    _filters_core.py:79-109 two-buffer driver; here functional chaining —
    each pass casts to the output dtype, matching scipy's semantics where
    pass k writes into the output array read by pass k+1)."""
    x = jnp.asarray(input)
    out_dtype = dtypes.resolve_output_dtype(output, x.dtype)
    fused = _try_fused_separable(x, axes_params, out_dtype)
    if fused is not None:
        return fused
    ran = False
    for axis, weights, mode, cval, origin in axes_params:
        if weights is None:
            continue
        x = _correlate1d(
            x, weights, axis, out_dtype, mode, cval, origin, False, dtype_mode
        )
        ran = True
    if not ran:
        x = x.astype(out_dtype)
    return x


def uniform_filter1d(
    input,
    size,
    axis=-1,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    dtype_mode=None,
):
    """1-d uniform (box) filter (reference filters.py:549-599).

    Matches scipy's rounding exactly: the window is summed first and scaled
    by 1/size once (scipy's NI_UniformFilter1D), not correlated with
    1/size-valued taps — the distinction matters for integer outputs.
    """
    dtype_mode = _default_dtype_mode(dtype_mode)
    if size < 1:
        raise RuntimeError("incorrect filter size")
    input = jnp.asarray(input)
    boundary.check_mode(mode)
    axis = util.check_axis(axis, input.ndim)
    util.check_origin(origin, size)
    if dtype_mode == "numpy":
        raise ValueError("dtype_mode 'numpy' not supported for uniform_filter")
    acc_dtype = dtypes.promote_weights_dtype(
        input.dtype, np.float64, dtype_mode
    )
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype, acc_dtype)
    weights = np.ones(size)
    acc = stencil.correlate1d_axis(
        input, weights, axis, mode, cval, origin, acc_dtype
    )
    acc = acc * jnp.asarray(1.0 / size, dtype=acc_dtype)
    return _cast_output(acc, out_dtype)


def uniform_filter(
    input,
    size=3,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    *,
    axes=None,
    dtype_mode=None,
):
    """Multi-dimensional uniform filter — the README benchmark op
    (reference filters.py:602-665; separable per-axis box passes).
    ``axes`` restricts filtering to those axes (scipy >= 1.11)."""
    input = jnp.asarray(input)
    axes = util.check_axes(axes, input.ndim)
    sizes = util.expand_axes_arg(size, axes, input.ndim, "size", 1, int)
    origins = util.expand_axes_arg(origin, axes, input.ndim, "origin", 0,
                                   int)
    modes = util.expand_axes_arg(mode, axes, input.ndim, "mode",
                                 "reflect", str)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    axes_params = [
        (
            ax,
            np.full(sizes[ax], 1.0 / sizes[ax]) if sizes[ax] > 1 else None,
            modes[ax],
            cval,
            origins[ax],
        )
        for ax in range(input.ndim)
    ]
    fused = _try_fused_separable(input, axes_params, out_dtype)
    if fused is not None:
        return fused
    x = input
    ran = False
    for axis in range(input.ndim):
        if sizes[axis] > 1:
            x = uniform_filter1d(
                x, sizes[axis], axis, out_dtype, modes[axis], cval,
                origins[axis], dtype_mode=dtype_mode,
            )
            ran = True
    if not ran:
        x = x.astype(out_dtype)
    return x


def _gaussian_kernel1d(sigma, order, radius):
    """1-d Gaussian (derivative) kernel — same math as scipy's
    _gaussian_kernel1d (reference filters.py:795+ ports it too)."""
    if order < 0:
        raise ValueError("order must be non-negative")
    exponent_range = np.arange(order + 1)
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1)
    phi_x = np.exp(-0.5 / sigma2 * x ** 2)
    phi_x = phi_x / phi_x.sum()
    if order == 0:
        return phi_x
    # f(x) = q(x) * phi(x) = q(x) * exp(p(x)); recurrence on q coefficients
    q = np.zeros(order + 1)
    q[0] = 1
    D = np.diag(exponent_range[1:], 1)  # D @ q(x) = q'(x)
    P = np.diag(np.ones(order) / -sigma2, -1)  # P @ q(x) = q(x) * p'(x)
    Q_deriv = D + P
    for _ in range(order):
        q = Q_deriv.dot(q)
    q = (x[:, None] ** exponent_range).dot(q)
    return q * phi_x


def gaussian_filter1d(
    input,
    sigma,
    axis=-1,
    order=0,
    output=None,
    mode="reflect",
    cval=0.0,
    truncate=4.0,
    *,
    radius=None,
    dtype_mode=None,
):
    """1-d Gaussian filter (reference filters.py:668-723)."""
    sd = float(sigma)
    lw = int(truncate * sd + 0.5)
    if radius is not None:
        lw = int(radius)
    if lw < 0:
        raise ValueError("Radius must be a nonnegative integer.")
    weights = _gaussian_kernel1d(sd, order, lw)[::-1]
    return correlate1d(
        input, weights, axis, output, mode, cval, 0, dtype_mode=dtype_mode
    )


def gaussian_filter(
    input,
    sigma,
    order=0,
    output=None,
    mode="reflect",
    cval=0.0,
    truncate=4.0,
    *,
    radius=None,
    axes=None,
    dtype_mode=None,
):
    """Multi-dimensional Gaussian filter (reference filters.py:726-795).
    ``axes`` restricts filtering to those axes (scipy >= 1.11)."""
    input = jnp.asarray(input)
    axes = util.check_axes(axes, input.ndim)
    orders = util.expand_axes_arg(order, axes, input.ndim, "order", 0, int)
    sigmas = util.expand_axes_arg(sigma, axes, input.ndim, "sigma", 0.0,
                                  float)
    modes = util.expand_axes_arg(mode, axes, input.ndim, "mode",
                                 "reflect", str)
    radii = util.expand_axes_arg(radius, axes, input.ndim, "radius", None,
                                 lambda v: v)
    axes_params = []
    for axis in range(input.ndim):
        if sigmas[axis] > 1e-15:
            lw = int(truncate * sigmas[axis] + 0.5)
            if radii[axis] is not None:
                lw = int(radii[axis])
            weights = _gaussian_kernel1d(sigmas[axis], orders[axis], lw)[::-1]
        else:
            weights = None
        axes_params.append((axis, weights, modes[axis], cval, 0))
    return _run_1d_filters(input, axes_params, output, dtype_mode)


# ---------------------------------------------------------------------------
# derivative filters
# ---------------------------------------------------------------------------


def _prewitt_or_sobel(input, axis, output, mode, cval, smooth, dtype_mode):
    """Shared derivative-filter driver (reference filters.py:798-880)."""
    input = jnp.asarray(input)
    axis = util.check_axis(axis, input.ndim)
    modes = util.fix_sequence_arg(mode, input.ndim, "mode", str)
    # scipy runs the derivative pass FIRST, then the smoothing axes in
    # ascending order; each pass casts into the output dtype, so the pass
    # order is observable for integer outputs (wraparound between passes).
    axes_params = [
        (axis, np.array([-1.0, 0.0, 1.0]), modes[axis], cval, 0)
    ]
    for ax in range(input.ndim):
        if ax != axis:
            axes_params.append((ax, smooth, modes[ax], cval, 0))
    return _run_1d_filters(input, axes_params, output, dtype_mode)


def prewitt(input, axis=-1, output=None, mode="reflect", cval=0.0, *,
            dtype_mode=None):
    """Prewitt derivative filter (scipy parity)."""
    return _prewitt_or_sobel(
        input, axis, output, mode, cval, np.ones(3), dtype_mode
    )


def sobel(input, axis=-1, output=None, mode="reflect", cval=0.0, *,
          dtype_mode=None):
    """Sobel derivative filter (scipy parity)."""
    return _prewitt_or_sobel(
        input, axis, output, mode, cval, np.array([1.0, 2.0, 1.0]), dtype_mode
    )


def generic_laplace(
    input,
    derivative2,
    output=None,
    mode="reflect",
    cval=0.0,
    extra_arguments=(),
    extra_keywords=None,
    *,
    axes=None,
):
    """Sum of per-axis second derivatives (reference filters.py:883-940).
    ``axes`` selects which axes the derivatives are taken over."""
    if extra_keywords is None:
        extra_keywords = {}
    input = jnp.asarray(input)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    axes = util.check_axes(axes, input.ndim)
    modes = util.fix_sequence_arg(mode, len(axes), "mode", str)
    if input.ndim == 0 or not axes:
        return input.astype(out_dtype)
    acc = derivative2(
        input, axes[0], out_dtype, modes[0], cval,
        *extra_arguments, **extra_keywords
    )
    for i, ax in enumerate(axes[1:], start=1):
        acc = acc + derivative2(
            input, ax, out_dtype, modes[i], cval,
            *extra_arguments, **extra_keywords
        )
    return acc.astype(out_dtype)


def laplace(input, output=None, mode="reflect", cval=0.0, *, axes=None,
            dtype_mode=None):
    """N-d Laplace filter via [1, -2, 1] second differences (scipy parity)."""

    def derivative2(x, axis, out_dtype, mode, cval):
        return correlate1d(
            x, np.array([1.0, -2.0, 1.0]), axis, out_dtype, mode, cval, 0,
            dtype_mode=dtype_mode,
        )

    return generic_laplace(input, derivative2, output, mode, cval,
                           axes=axes)


def gaussian_laplace(
    input, sigma, output=None, mode="reflect", cval=0.0, *,
    axes=None, dtype_mode=None, **kwargs
):
    """Laplace of Gaussian (scipy parity)."""
    ndim = jnp.ndim(input)
    ax = util.check_axes(axes, ndim)
    sigmas = util.expand_axes_arg(sigma, ax, ndim, "sigma", 0.0, float)

    def derivative2(x, axis, out_dtype, mode, cval):
        order = [0] * x.ndim
        order[axis] = 2
        return gaussian_filter(
            x, sigmas, order, out_dtype, mode, cval,
            dtype_mode=dtype_mode, **kwargs
        )

    return generic_laplace(input, derivative2, output, mode, cval,
                           axes=axes)


def generic_gradient_magnitude(
    input,
    derivative,
    output=None,
    mode="reflect",
    cval=0.0,
    extra_arguments=(),
    extra_keywords=None,
    *,
    axes=None,
):
    """sqrt of sum of squared per-axis derivatives (reference
    filters.py:943-1000).  ``axes`` selects the derivative axes."""
    if extra_keywords is None:
        extra_keywords = {}
    input = jnp.asarray(input)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    axes = util.check_axes(axes, input.ndim)
    modes = util.fix_sequence_arg(mode, len(axes), "mode", str)
    if input.ndim == 0 or not axes:
        return input.astype(out_dtype)
    d = derivative(
        input, axes[0], out_dtype, modes[0], cval,
        *extra_arguments, **extra_keywords
    )
    acc = (d * jnp.conj(d)).real if np.dtype(d.dtype).kind == "c" else d * d
    for i, ax in enumerate(axes[1:], start=1):
        d = derivative(
            input, ax, out_dtype, modes[i], cval,
            *extra_arguments, **extra_keywords
        )
        acc = acc + (
            (d * jnp.conj(d)).real if np.dtype(d.dtype).kind == "c" else d * d
        )
    return _cast_output(jnp.sqrt(acc.astype(np.promote_types(acc.dtype, np.float32))), out_dtype)


def gaussian_gradient_magnitude(
    input, sigma, output=None, mode="reflect", cval=0.0, *,
    axes=None, dtype_mode=None, **kwargs
):
    """Gradient magnitude of Gaussian derivatives (scipy parity).

    NB scipy quirk (1.17): with ``axes`` given, the SMOOTHING still
    spans every axis (sigma is forwarded to gaussian_filter raw, full
    rank); only the derivative sum is restricted to ``axes`` — unlike
    gaussian_laplace, which smooths only over ``axes``.  Reproduced
    exactly."""

    def derivative(x, axis, out_dtype, mode, cval):
        order = [0] * x.ndim
        order[axis] = 1
        return gaussian_filter(
            x, sigma, order, out_dtype, mode, cval,
            dtype_mode=dtype_mode, **kwargs
        )

    return generic_gradient_magnitude(input, derivative, output, mode, cval,
                                      axes=axes)


# ---------------------------------------------------------------------------
# min/max filters
# ---------------------------------------------------------------------------


def _axes_embed_array(arr, axes, ndim, name):
    """Insert singleton dims into a len(axes)-rank footprint/structure/
    weights array so it spans the full input rank (scipy `axes`
    semantics, >= 1.11)."""
    if arr is None:
        return None
    a = np.asarray(arr)
    if a.ndim != len(axes):
        raise RuntimeError(f"{name} array has incorrect shape")
    if len(axes) == ndim:
        return arr
    for ax in range(ndim):
        if ax not in axes:
            a = np.expand_dims(a, ax)
    return a


def _get_footprint(input, size, footprint, allow_separable=True):
    """Normalize size/footprint (reference _filters_core.py:14-48)."""
    if size is not None and footprint is not None:
        import warnings

        warnings.warn(
            "ignoring size because footprint is set", UserWarning, stacklevel=3
        )
    if footprint is None:
        if size is None:
            raise RuntimeError("no footprint or filter size provided")
        sizes = util.fix_sequence_arg(size, input.ndim, "size", int)
        return None, sizes  # separable full-rectangle footprint
    footprint = np.asarray(footprint, dtype=bool)
    if footprint.ndim != input.ndim:
        raise RuntimeError("footprint array has incorrect shape")
    if not footprint.any():
        raise ValueError("All-zero footprint is not supported.")
    if allow_separable and footprint.all():
        return None, list(footprint.shape)
    return footprint, list(footprint.shape)


def _min_or_max_1d(
    x, size, axis, mode, cval, origin, is_min
):
    taps = [(k,) for k in range(size)]
    lo = size // 2 + origin
    pad_width_1d = [(lo, size - 1 - lo)]
    # embed the 1d footprint along `axis`
    nd_taps = []
    for (k,) in taps:
        off = [0] * x.ndim
        off[axis] = k
        nd_taps.append(tuple(off))
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = pad_width_1d[0]
    reducer = jnp.minimum if is_min else jnp.maximum
    return stencil.reduce_window(x, (nd_taps, pad_width), mode, cval, reducer)


def _min_or_max_filter(
    input, size, footprint, structure, output, mode, cval, origin, is_min
):
    """Shared min/max driver (reference filters.py:1373-1475).

    When ``structure`` is given (grey morphology path) each tap contributes
    ``x - structure`` (erosion) / ``x + structure`` (dilation).
    """
    input = jnp.asarray(input)
    if structure is None:
        footprint, sizes = _get_footprint(input, size, footprint)
    else:
        structure = np.asarray(structure, dtype=np.float64)
        if footprint is None:
            footprint = np.ones(structure.shape, bool)
        else:
            footprint = np.asarray(footprint, bool)
        sizes = list(structure.shape)
    origins = util.fix_sequence_arg(origin, input.ndim, "origin", int)
    for o, w in zip(origins, sizes):
        util.check_origin(o, w)
    modes = util.fix_sequence_arg(mode, input.ndim, "mode", str)
    for m in modes:
        boundary.check_mode(m)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)

    # NOTE: scipy's minimum_filter and maximum_filter reduce over the SAME
    # window (no footprint mirroring for max); only grey_dilation mirrors,
    # and it does so itself before reaching this driver.

    if footprint is None and structure is None:
        # separable rectangle: fused Pallas pass on TPU, else per-axis
        # 1-d running min/max
        from cupyimg_tpu.ops import pallas_stencil as _ps

        if (
            np.dtype(input.dtype).kind == "f"
            and len(set(float(cval) for _ in [0])) == 1
            and _ps.supports(
                input,
                [
                    (1.0,) * sz if sz > 1 else None
                    for sz in sizes
                ],
            )
        ):
            # no try/except: _ps.supports() gates applicability; a
            # failure past it is a kernel bug that must surface loudly
            out = _ps.fused_separable_minmax(
                input,
                tuple(sizes),
                tuple(int(o) for o in origins),
                tuple(modes),
                float(cval),
                bool(is_min),
            )
            return out.astype(out_dtype)
        x = input
        for axis in range(input.ndim):
            if sizes[axis] > 1:
                x = _min_or_max_1d(
                    x, sizes[axis], axis, modes[axis], cval, origins[axis],
                    is_min,
                )
        return x.astype(out_dtype)

    if structure is not None and (structure != 0).any():
        # additive structure: gather windows with struct offsets applied
        taps, pad_width = stencil.footprint_offsets(footprint, origins)
        xp = boundary.pad(input, pad_width, modes[0], cval)
        comp = None
        xpf = xp.astype(
            np.promote_types(input.dtype, structure.dtype)
            if np.dtype(input.dtype).kind in "fc"
            else input.dtype
        )
        for off in taps:
            sl = tuple(slice(o, o + n) for o, n in zip(off, input.shape))
            sval = structure[off]
            piece = xpf[sl] - sval if is_min else xpf[sl] + sval
            if comp is None:
                comp = piece
            else:
                comp = jnp.minimum(comp, piece) if is_min else jnp.maximum(comp, piece)
        return _cast_output(comp, out_dtype)

    offsets = stencil.footprint_offsets(footprint, origins)
    reducer = jnp.minimum if is_min else jnp.maximum
    # ndimage applies a single mode for footprint filters
    out = stencil.reduce_window(input, offsets, modes[0], cval, reducer)
    return out.astype(out_dtype)


def _axes_minmax_args(input, size, footprint, mode, origin, axes):
    """Expand size/footprint/mode/origin from `axes`-relative to
    full-rank (identity on excluded axes)."""
    ndim = jnp.ndim(input)
    axes = util.check_axes(axes, ndim)
    if len(axes) == ndim:
        return size, footprint, mode, origin
    if footprint is not None:
        footprint = _axes_embed_array(footprint, axes, ndim, "footprint")
    elif size is not None:
        size = util.expand_axes_arg(size, axes, ndim, "size", 1, int)
    mode = util.expand_axes_arg(mode, axes, ndim, "mode", "reflect", str)
    origin = util.expand_axes_arg(origin, axes, ndim, "origin", 0, int)
    return size, footprint, mode, origin


def minimum_filter(
    input, size=None, footprint=None, output=None, mode="reflect", cval=0.0,
    origin=0, *, axes=None,
):
    """Multi-dimensional minimum filter (scipy parity incl. `axes`)."""
    size, footprint, mode, origin = _axes_minmax_args(
        input, size, footprint, mode, origin, axes
    )
    return _min_or_max_filter(
        input, size, footprint, None, output, mode, cval, origin, True
    )


def maximum_filter(
    input, size=None, footprint=None, output=None, mode="reflect", cval=0.0,
    origin=0, *, axes=None,
):
    """Multi-dimensional maximum filter (scipy parity incl. `axes`)."""
    size, footprint, mode, origin = _axes_minmax_args(
        input, size, footprint, mode, origin, axes
    )
    return _min_or_max_filter(
        input, size, footprint, None, output, mode, cval, origin, False
    )


def minimum_filter1d(
    input, size, axis=-1, output=None, mode="reflect", cval=0.0, origin=0
):
    """1-d minimum filter (scipy parity; reference filters.py:1478-1507)."""
    input = jnp.asarray(input)
    axis = util.check_axis(axis, input.ndim)
    util.check_origin(origin, size)
    boundary.check_mode(mode)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    return _min_or_max_1d(input, size, axis, mode, cval, origin, True).astype(
        out_dtype
    )


def maximum_filter1d(
    input, size, axis=-1, output=None, mode="reflect", cval=0.0, origin=0
):
    """1-d maximum filter (scipy parity)."""
    input = jnp.asarray(input)
    axis = util.check_axis(axis, input.ndim)
    util.check_origin(origin, size)
    boundary.check_mode(mode)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    return _min_or_max_1d(input, size, axis, mode, cval, origin, False).astype(
        out_dtype
    )


# ---------------------------------------------------------------------------
# rank filters
# ---------------------------------------------------------------------------


def _rank_filter(
    input, rank_fn, size, footprint, output, mode, cval, origin
):
    """Shared rank-filter driver (reference filters.py:1712-1848).

    The reference specializes CUDA sorting networks per footprint size
    (_filters_optimal_medians.py); here small footprints (<= 64 taps) run
    a rank-pruned Batcher network as a fused min/max DAG over shifted
    slices (ops/sorting_networks.py), larger footprints fall back to a
    stacked XLA sort.
    """
    input = jnp.asarray(input)
    footprint, sizes = _get_footprint(input, size, footprint,
                                      allow_separable=False)
    if footprint is None:
        footprint = np.ones(tuple(sizes), dtype=bool)
    origins = util.fix_sequence_arg(origin, input.ndim, "origin", int)
    for o, w in zip(origins, footprint.shape):
        util.check_origin(o, w)
    boundary.check_mode(mode)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)
    filter_size = int(footprint.sum())
    rank = rank_fn(filter_size)
    if rank < 0:
        rank += filter_size
    if rank < 0 or rank >= filter_size:
        raise RuntimeError("rank not within filter footprint size")
    if rank == 0:
        return _min_or_max_filter(
            input, None, footprint, None, output, mode, cval, origins, True
        )
    if rank == filter_size - 1:
        return _min_or_max_filter(
            input, None, footprint, None, output, mode, cval, origins, False
        )
    if filter_size <= 64:
        from cupyimg_tpu.ops import pallas_stencil as _ps

        if (
            _ps.supports_rank(input, filter_size)
            and np.dtype(out_dtype) == np.dtype(input.dtype)
        ):
            # fused Pallas pass: slab DMA + rank-pruned Batcher network
            # in VMEM (one HBM round trip instead of an XLA fusion that
            # re-reads the array per shifted operand)
            return _ps.fused_rank_filter(
                input, footprint, origins, rank, mode, cval
            )
        # pruned sorting network over shifted slices: XLA fuses the
        # min/max DAG into one elementwise pass, no window tensor and
        # no generic sort (the reference's median-network strategy,
        # _filters_optimal_medians.py / SURVEY.md C9)
        from cupyimg_tpu.ops.sorting_networks import rank_select

        taps, pad_width = stencil.footprint_offsets(footprint, origins)
        xp = boundary.pad(input, pad_width, mode, cval)
        vals = [
            xp[tuple(slice(o, o + n) for o, n in zip(off, input.shape))]
            for off in taps
        ]
        return rank_select(vals, rank).astype(out_dtype)
    windows = stencil.gather_windows(input, footprint, origins, mode, cval)
    sorted_w = jnp.sort(windows, axis=0)
    return sorted_w[rank].astype(out_dtype)


def _axes_rank_args(input, size, footprint, origin, axes):
    ndim = jnp.ndim(input)
    axes = util.check_axes(axes, ndim)
    if len(axes) == ndim:
        return size, footprint, origin
    if footprint is not None:
        footprint = _axes_embed_array(footprint, axes, ndim, "footprint")
    elif size is not None:
        size = util.expand_axes_arg(size, axes, ndim, "size", 1, int)
    origin = util.expand_axes_arg(origin, axes, ndim, "origin", 0, int)
    return size, footprint, origin


def rank_filter(
    input, rank, size=None, footprint=None, output=None, mode="reflect",
    cval=0.0, origin=0, *, axes=None,
):
    """Multi-dimensional rank filter (scipy parity incl. `axes`)."""
    if not isinstance(rank, (int, np.integer)):
        # scipy raises for float ranks (upstream issue 9388 regression)
        raise TypeError("rank must be an integer")
    rank = int(rank)
    size, footprint, origin = _axes_rank_args(input, size, footprint,
                                              origin, axes)
    return _rank_filter(
        input, lambda fs: rank, size, footprint, output, mode, cval, origin
    )


def median_filter(
    input, size=None, footprint=None, output=None, mode="reflect", cval=0.0,
    origin=0, *, axes=None,
):
    """Multi-dimensional median filter (scipy parity incl. `axes`)."""
    size, footprint, origin = _axes_rank_args(input, size, footprint,
                                              origin, axes)
    return _rank_filter(
        input, lambda fs: fs // 2, size, footprint, output, mode, cval, origin
    )


def percentile_filter(
    input, percentile, size=None, footprint=None, output=None, mode="reflect",
    cval=0.0, origin=0, *, axes=None,
):
    """Multi-dimensional percentile filter (scipy parity incl. `axes`)."""
    percentile = float(percentile)
    if percentile < 0.0:
        percentile += 100.0
    if percentile < 0 or percentile > 100:
        raise RuntimeError("invalid percentile")

    def get_rank(fs):
        if percentile == 100.0:
            return fs - 1
        return int(float(fs) * percentile / 100.0)

    size, footprint, origin = _axes_rank_args(input, size, footprint,
                                              origin, axes)
    return _rank_filter(
        input, get_rank, size, footprint, output, mode, cval, origin
    )


# ---------------------------------------------------------------------------
# generic filters (absent in the reference — filters.py:62 leaves them as a
# TODO because CUDA kernels cannot call back into Python; with tracing they
# come for free: the callback must be jnp-traceable)
# ---------------------------------------------------------------------------


def generic_filter(
    input,
    function,
    size=None,
    footprint=None,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    extra_arguments=(),
    extra_keywords=None,
):
    """Multidimensional filter with a user-supplied window reduction.

    scipy parity, with the TPU-native contract that ``function`` operates
    on a 1-d jnp array of the footprint values and must be traceable
    (pure jnp ops — it is vmapped over every window, so Python-side
    side effects and host callbacks are not supported).
    """
    if extra_keywords is None:
        extra_keywords = {}
    input = jnp.asarray(input)
    footprint, sizes = _get_footprint(
        input, size, footprint, allow_separable=False
    )
    if footprint is None:
        footprint = np.ones(tuple(sizes), bool)
    origins = util.fix_sequence_arg(origin, input.ndim, "origin", int)
    for o, w in zip(origins, footprint.shape):
        util.check_origin(o, w)
    boundary.check_mode(mode)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)

    taps, pad_width = stencil.footprint_offsets(footprint, origins)
    xp = boundary.pad(input, pad_width, mode, cval)
    windows = jnp.stack(
        [
            xp[tuple(slice(o, o + n) for o, n in zip(off, input.shape))]
            for off in taps
        ],
        axis=-1,
    )
    flat = windows.reshape(-1, len(taps))

    def apply_fn(w):
        return function(w, *extra_arguments, **extra_keywords)

    out = jax.vmap(apply_fn)(flat)
    return out.reshape(input.shape).astype(out_dtype)


def generic_filter1d(
    input,
    function,
    filter_size,
    axis=-1,
    output=None,
    mode="reflect",
    cval=0.0,
    origin=0,
    extra_arguments=(),
    extra_keywords=None,
):
    """1-d generic filter along ``axis`` (scipy parity).

    ``function`` receives the boundary-extended input line (length
    ``line + filter_size - 1``) and must return the filtered line of the
    original length — the functional analog of scipy's in-place
    ``(iline, oline)`` callback contract.  It is vmapped over lines and
    must be jnp-traceable.
    """
    if extra_keywords is None:
        extra_keywords = {}
    input = jnp.asarray(input)
    if filter_size < 1:
        raise RuntimeError("invalid filter size")
    axis = util.check_axis(axis, input.ndim)
    util.check_origin(origin, filter_size)
    boundary.check_mode(mode)
    out_dtype = dtypes.resolve_output_dtype(output, input.dtype)

    size = int(filter_size)
    lo = size // 2 + int(origin)
    hi = size - 1 - lo
    pad_width = [(0, 0)] * input.ndim
    pad_width[axis] = (lo, hi)
    xp = boundary.pad(input, pad_width, mode, cval)

    moved = jnp.moveaxis(xp, axis, -1)
    lines = moved.reshape(-1, moved.shape[-1])

    def apply_fn(iline):
        return function(iline, *extra_arguments, **extra_keywords)

    out = jax.vmap(apply_fn)(lines)
    n = input.shape[axis]
    if out.shape[-1] != n:
        raise RuntimeError(
            "function must return lines of the original length"
        )
    out = out.reshape(moved.shape[:-1] + (n,))
    return jnp.moveaxis(out, -1, axis).astype(out_dtype)
