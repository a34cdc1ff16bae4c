"""histogram family with NumPy-parity semantics.

Reference: cupyimg/numpy/lib/histograms.py:199-520 (custom bin-search
ElementwiseKernels, SURVEY.md N8).  On TPU the bin search is a
``jnp.searchsorted`` over the edge vector plus a scatter-add — XLA lowers
both natively — so no custom kernel is needed; what this module adds over
``jnp.histogram`` is numpy's exact contract:

- empty input returns zero counts over the default ``[0, 1)`` range instead
  of raising;
- integer/bool weights produce an integer-dtype histogram, complex weights
  a complex one (reference histograms.py:256-269);
- non-monotonic explicit bin edges raise ``ValueError``;
- ``range`` validation (two elements, finite, first <= last) matches
  numpy's error classes.
"""

from __future__ import annotations

import operator

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["histogram", "histogram2d", "histogramdd"]


def _ravel_and_check_weights(a, weights):
    a = jnp.asarray(a)
    if a.dtype.kind == "c":
        raise NotImplementedError("complex number is not supported")
    if a.dtype == jnp.bool_:
        a = a.astype(jnp.uint8)
    if weights is not None:
        weights = jnp.asarray(weights)
        if weights.shape != a.shape:
            raise ValueError("weights should have the same shape as a.")
        weights = weights.ravel()
    return a.ravel(), weights


def _get_outer_edges(a, range):
    """numpy's first/last edge selection (empty -> (0, 1), equal -> +-0.5).

    Data-derived edges keep the array's scalar dtype (numpy computes the
    linspace in that dtype — e.g. float32 data yields 9.099999 not 9.1);
    user-range / empty-default edges stay weak Python scalars (numpy then
    computes in float64 and casts at the end).
    """
    traced = isinstance(a, jax.core.Tracer)
    if range is not None:
        first_edge, last_edge = range
        if first_edge > last_edge:
            raise ValueError("max must be larger than min in range parameter.")
        if not (np.isfinite(first_edge) and np.isfinite(last_edge)):
            raise ValueError(
                "supplied range of [{}, {}] is not finite".format(
                    first_edge, last_edge
                )
            )
    elif a.size == 0:
        first_edge, last_edge = 0, 1
    else:
        first_edge = jnp.min(a)
        last_edge = jnp.max(a)
        if not traced and not (
            np.isfinite(np.asarray(first_edge))
            and np.isfinite(np.asarray(last_edge))
        ):
            raise ValueError(
                "autodetected range of [{}, {}] is not finite".format(
                    first_edge, last_edge
                )
            )
    if traced and hasattr(first_edge, "dtype"):
        eq = first_edge == last_edge
        first_edge = jnp.where(eq, first_edge - 0.5, first_edge)
        last_edge = jnp.where(eq, last_edge + 0.5, last_edge)
    elif first_edge == last_edge:
        first_edge = first_edge - 0.5
        last_edge = last_edge + 0.5
    return first_edge, last_edge


def _get_bin_edges(a, bins, range):
    """Return (edges, n_bins).  Mirrors numpy's histogram_bin_edges minus
    the string bin-selection methods (the reference also omits them)."""
    if isinstance(bins, str):
        raise NotImplementedError(
            "only integer and array bins are implemented"
        )
    bins_arr = np.asarray(bins) if not isinstance(bins, jax.core.Tracer) else None
    if bins_arr is not None and bins_arr.ndim == 0:
        try:
            n_equal_bins = operator.index(bins)
        except TypeError:
            raise TypeError("`bins` must be an integer, a string, or an array")
        if n_equal_bins < 1:
            raise ValueError("`bins` must be positive, when an integer")
        first_edge, last_edge = _get_outer_edges(a, range)
        bin_type = jnp.result_type(
            jnp.asarray(first_edge), jnp.asarray(last_edge), a
        )
        if jnp.issubdtype(bin_type, jnp.integer):
            bin_type = jnp.result_type(bin_type, jnp.float64)
        # numpy linspace computes in result_type(start, stop, float(num)):
        # strong array scalars keep their dtype, weak Python scalars promote
        # to float64; the result is cast to bin_type at the end.
        operands = [
            v.dtype if hasattr(v, "dtype") else np.float64
            for v in (first_edge, last_edge)
        ]
        # the trailing 1.0 plays numpy's weak float(num) operand; canonical
        # so the no-x64 TPU path degrades to f32 without warnings
        compute_dt = jax.dtypes.canonicalize_dtype(
            np.result_type(*operands, 1.0)
        )
        start = jnp.asarray(first_edge, dtype=compute_dt)
        stop = jnp.asarray(last_edge, dtype=compute_dt)
        step = (stop - start) / n_equal_bins
        edges = start + jnp.arange(
            n_equal_bins + 1, dtype=compute_dt
        ) * step
        edges = edges.at[-1].set(stop)
        return edges.astype(bin_type), n_equal_bins
    edges = jnp.asarray(bins)
    if edges.ndim != 1:
        raise ValueError("`bins` must be 1d, when an array")
    if not isinstance(edges, jax.core.Tracer):
        e = np.asarray(edges)
        if e.size > 1 and np.any(e[:-1] > e[1:]):
            raise ValueError(
                "`bins` must increase monotonically, when an array"
            )
    return edges, edges.shape[0] - 1


def _bin_values(x, edges, n_bins, weights, out_dtype):
    """searchsorted + scatter-add binning; last bin is edge-inclusive."""
    idx = jnp.searchsorted(edges, x, side="right") - 1
    idx = jnp.where(x == edges[-1], n_bins - 1, idx)
    valid = (x >= edges[0]) & (x <= edges[-1])
    idx = jnp.clip(idx, 0, max(n_bins - 1, 0))
    if weights is None:
        w = jnp.where(valid, 1, 0).astype(out_dtype)
    else:
        w = jnp.where(valid, weights, jnp.zeros_like(weights)).astype(
            out_dtype
        )
    return jnp.zeros((n_bins,), dtype=out_dtype).at[idx].add(w)


def _weights_out_dtype(weights):
    canon = jax.dtypes.canonicalize_dtype
    if weights is None:
        return canon(np.dtype(np.int64))
    kind = jnp.dtype(weights.dtype).kind
    if kind == "c":
        return jnp.result_type(weights.dtype, jnp.complex64)
    if kind in "bui":
        return canon(np.dtype(np.int64))
    return jnp.result_type(weights.dtype, jnp.float32)


def histogram(x, bins=10, range=None, weights=None, density=False):
    """Compute the histogram of a dataset (numpy.histogram parity).

    Reference: cupyimg/numpy/lib/histograms.py:199-275.
    """
    x, weights = _ravel_and_check_weights(x, weights)
    edges, n_bins = _get_bin_edges(x, bins, range)
    out_dtype = _weights_out_dtype(weights)
    y = _bin_values(x, edges, n_bins, weights, out_dtype)
    if density:
        db = jnp.diff(edges).astype(jnp.result_type(float))
        return y / db / y.sum(), edges
    return y, edges


def histogramdd(sample, bins=10, range=None, weights=None, density=False):
    """Multidimensional histogram (numpy.histogramdd parity).

    Reference: cupyimg/numpy/lib/histograms.py:278-520.
    """
    if hasattr(sample, "ndim") and sample.ndim > 0 or isinstance(
        sample, np.ndarray
    ):
        sample = jnp.asarray(sample)
        if sample.ndim == 1:
            sample = sample[:, None]
        N, D = sample.shape
    else:
        sample = jnp.stack(
            [jnp.asarray(s).ravel() for s in sample], axis=-1
        )
        N, D = sample.shape

    try:
        M = len(bins)
        if M != D:
            raise ValueError(
                "The dimension of bins must be equal to the dimension of "
                "the sample x."
            )
    except TypeError:
        bins = [bins] * D

    if range is None:
        range = [None] * D
    elif len(range) != D:
        raise ValueError("range argument must have one entry per dimension")

    if weights is not None:
        weights = jnp.asarray(weights).ravel()
        if weights.shape[0] != N:
            raise ValueError("weights should have the same length as sample.")

    edges_list = []
    n_bins_list = []
    for i in np.arange(D):
        edges, n_bins = _get_bin_edges(sample[:, i], bins[i], range[i])
        edges_list.append(edges)
        n_bins_list.append(n_bins)

    out_dtype = _weights_out_dtype(weights)
    flat_idx = jnp.zeros((N,), dtype=jnp.int32)
    valid = jnp.ones((N,), dtype=bool)
    for i, (edges, n_bins) in enumerate(zip(edges_list, n_bins_list)):
        x = sample[:, i]
        idx = jnp.searchsorted(edges, x, side="right") - 1
        idx = jnp.where(x == edges[-1], n_bins - 1, idx)
        valid = valid & (x >= edges[0]) & (x <= edges[-1])
        idx = jnp.clip(idx, 0, max(n_bins - 1, 0))
        flat_idx = flat_idx * n_bins + idx.astype(jnp.int32)

    total = int(np.prod(n_bins_list)) if n_bins_list else 1
    if weights is None:
        w = jnp.where(valid, 1, 0).astype(out_dtype)
    else:
        w = jnp.where(valid, weights, jnp.zeros_like(weights)).astype(
            out_dtype
        )
    hist = (
        jnp.zeros((total,), dtype=out_dtype)
        .at[flat_idx]
        .add(w)
        .reshape(tuple(n_bins_list))
    )

    if density:
        hist = hist.astype(jnp.result_type(float))
        s = hist.sum()
        for i in np.arange(D):
            db = jnp.diff(edges_list[i]).astype(jnp.result_type(float))
            shape = [1] * D
            shape[i] = n_bins_list[i]
            hist = hist / db.reshape(shape)
        hist = hist / s
    return hist, edges_list


def histogram2d(x, y, bins=10, range=None, weights=None, density=False):
    """2-d histogram (numpy.histogram2d parity).

    Reference: cupyimg/numpy/lib/histograms.py (histogram2d wrapper).
    """
    try:
        n = len(bins)
    except TypeError:
        n = 1
    if n != 1 and n != 2:
        xedges = yedges = jnp.asarray(bins)
        bins = [xedges, yedges]
    hist, edges = histogramdd(
        [x, y], bins, range, weights=weights, density=density
    )
    return hist, edges[0], edges[1]
