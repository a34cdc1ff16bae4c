"""scipy.ndimage measurements on TPU-native JAX engines.

API parity with reference cupyimg/scipy/ndimage/measurements.py
(SURVEY.md C12): ``label`` and the labeled reductions (sum/mean/variance/
std/min/max/positions/median/extrema/center_of_mass/histogram/
labeled_comprehension).

TPU-first redesign (SURVEY.md N6/N7): the reference's label is a 5-kernel
atomicCAS union-find (measurements.py:143-277); Pallas-TPU has no atomics,
so label here is a *deterministic* fixpoint algorithm: min-label propagation
over the structure's neighbor offsets fused with pointer doubling
(``lab <- min(lab, lab[lab])``), iterated under ``lax.while_loop`` until
convergence — O(log diameter) iterations.  Final labels are assigned by a
cumsum over component roots, which reproduces scipy's raster-scan
first-occurrence numbering exactly with no sort and no host sync inside the
loop.  Labeled reductions map onto XLA segment ops
(``jax.ops.segment_sum`` et al.) instead of per-label atomicAdd kernels.

Like the reference (its "This function may synchronize the device" notes),
the reduction APIs synchronize once to learn the number of labels; ``label``
itself is fully jit-compatible and returns the count as a device scalar.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cupyimg_tpu.scipy.ndimage.morphology import generate_binary_structure

__all__ = [
    "label",
    "sum",
    "sum_labels",
    "mean",
    "variance",
    "standard_deviation",
    "minimum",
    "maximum",
    "median",
    "minimum_position",
    "maximum_position",
    "extrema",
    "center_of_mass",
    "histogram",
    "labeled_comprehension",
    "find_objects",
    "value_indices",
]


def _structure_offsets(structure, ndim):
    """Nonzero structure offsets relative to the center (excluding center)."""
    if structure is None:
        structure = generate_binary_structure(ndim, 1)
    structure = np.asarray(structure)
    if structure.ndim != ndim:
        raise RuntimeError("structure and input must have equal rank")
    for s in structure.shape:
        if s != 3:
            raise ValueError("structure dimensions must be equal to 3")
    offs = []
    center = (1,) * ndim
    for idx in np.argwhere(structure != 0):
        off = tuple(int(i) - 1 for i in idx)
        if off != (0,) * ndim:
            offs.append(off)
    return offs


def _shift_with_fill(a, off, fill):
    """Shift array by ``off`` (neighbor at position i+off lands at i),
    filling vacated cells with ``fill``."""
    out = a
    for axis, o in enumerate(off):
        if o == 0:
            continue
        pad = [(0, 0)] * a.ndim
        n = a.shape[axis]
        if o > 0:
            pad[axis] = (0, o)
            out = jnp.pad(out, pad, constant_values=fill)
            out = lax.slice_in_dim(out, o, o + n, axis=axis)
        else:
            pad[axis] = (-o, 0)
            out = jnp.pad(out, pad, constant_values=fill)
            out = lax.slice_in_dim(out, 0, n, axis=axis)
    return out


def label(input, structure=None, output=None, *, greyscale_mode=False):
    """Label connected components (scipy parity; reference
    measurements.py:29-141).

    Returns ``(labels, num_features)`` with ``num_features`` a device
    scalar (int32) — call ``int()`` on it outside jit for the Python int.
    ``greyscale_mode=True`` connects neighbors only where the input values
    are equal (the reference's extension backing skimage.measure.label).
    """
    x = jnp.asarray(input)
    if x.ndim < 1:
        # scipy labels a scalar as a single (0-d) component
        lab1, num = label(x.reshape(1), structure=None, output=output,
                          greyscale_mode=greyscale_mode)
        return lab1.reshape(()), num
    ndim = x.ndim
    offsets = _structure_offsets(structure, ndim)
    # full-box structure (all 3^ndim - 1 neighbors)? then propagation is
    # one reduce_window min, which compiles and runs far faster than the
    # per-offset shift chain
    use_box = (not greyscale_mode) and len(offsets) == 3**ndim - 1
    out_dtype = np.int32 if output is None else output
    labels, num = _label_core(
        x, tuple(offsets), bool(greyscale_mode), use_box
    )
    return labels.astype(out_dtype), num


@functools.partial(
    jax.jit, static_argnames=("offsets", "greyscale_mode", "use_box")
)
def _label_core(x, offsets, greyscale_mode, use_box):
    ndim = x.ndim
    fg = x != 0
    n = x.size
    SENT = np.int32(n)

    flat_idx = jnp.arange(n, dtype=np.int32).reshape(x.shape)
    lab0 = jnp.where(fg, flat_idx, SENT)

    if use_box:
        # background stays SENT (the min identity), so a plain window
        # min over the labels is exactly min-label propagation
        def propagate(lab):
            m = lax.reduce_window(
                lab, SENT, lax.min, (3,) * ndim, (1,) * ndim, "SAME"
            )
            return jnp.where(fg, m, SENT)

    elif not greyscale_mode:
        # arbitrary structure, binary connectivity: background labels
        # are SENT already, so shifted background contributes nothing
        def propagate(lab):
            new = lab
            for off in offsets:
                new = jnp.minimum(
                    new, _shift_with_fill(lab, off, SENT)
                )
            return jnp.where(fg, new, SENT)

    else:
        # greyscale mode: neighbors connect only where values are equal
        valid_masks = []
        for off in offsets:
            nb_fg = _shift_with_fill(fg, off, False)
            valid = fg & nb_fg
            nb_val = _shift_with_fill(x, off, jnp.asarray(0, x.dtype))
            valid = valid & (x == nb_val)
            valid_masks.append(valid)

        def propagate(lab):
            new = lab
            for off, valid in zip(offsets, valid_masks):
                nb = _shift_with_fill(lab, off, SENT)
                new = jnp.minimum(
                    new, jnp.where(valid, nb, SENT)
                )
            return new

    def compress(lab):
        # pointer doubling: follow the parent link twice
        flat = lab.ravel()
        safe = jnp.minimum(flat, np.int32(n - 1))
        hop = jnp.where(flat == SENT, SENT, flat[safe])
        hop2_safe = jnp.minimum(hop, np.int32(n - 1))
        hop2 = jnp.where(hop == SENT, SENT, flat[hop2_safe])
        return jnp.minimum(flat, hop2).reshape(lab.shape)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        lab, _ = carry
        new = compress(propagate(lab))
        return new, jnp.any(new != lab)

    lab1 = compress(propagate(lab0))
    lab, _ = lax.while_loop(cond, body, (lab1, jnp.any(lab1 != lab0)))

    # relabel roots to 1..N in raster order of first pixel (root = min flat
    # index of the component, so ascending roots == scipy's numbering)
    flat = lab.ravel()
    is_root = (flat == jnp.arange(n, dtype=np.int32)) & fg.ravel()
    rank = jnp.cumsum(is_root.astype(np.int32))
    safe = jnp.minimum(flat, np.int32(n - 1))
    new_flat = jnp.where(flat == SENT, 0, rank[safe])
    num = rank[n - 1] if n > 0 else jnp.asarray(0, np.int32)
    return new_flat.reshape(x.shape), num


# ---------------------------------------------------------------------------
# labeled reductions (segment ops; SURVEY.md N7)
# ---------------------------------------------------------------------------


def _norm_labels_index(input, labels, index):
    """Normalize (labels, index); returns (x, labels, index_array, scalar)."""
    x = jnp.asarray(input)
    if labels is None:
        return x, None, None, False
    labels = jnp.asarray(labels)
    if labels.shape != x.shape:
        # scipy broadcasts labels against input
        labels = jnp.broadcast_to(labels, x.shape)
    scalar = False
    if index is None:
        return x, labels, None, False
    if np.isscalar(index) or (
        hasattr(index, "ndim") and getattr(index, "ndim") == 0
    ):
        scalar = True
        index = [int(index)]
    index = np.asarray(index, dtype=np.int64)
    return x, labels, index, scalar


def _reject_complex(x):
    """scipy's stats reductions cast to float64 with 'safe' casting, so
    complex input raises TypeError (reference measurements.py stats
    kernels have the same restriction)."""
    if np.dtype(x.dtype).kind == "c":
        raise TypeError(
            "Cannot cast array data from {} to float64 according to the "
            "rule 'safe'".format(np.dtype(x.dtype))
        )


def _num_segments(labels):
    """Host sync to learn label count (the reference documents the same
    sync, measurements.py:48-50)."""
    return int(jnp.max(labels)) + 1 if labels.size else 1


def _host_counts(labels, num_seg):
    """Per-label pixel counts on the host (the call sites already sync)."""
    lab = np.asarray(labels).ravel()
    lab = np.clip(lab, 0, None).astype(np.int64)
    return np.bincount(lab, minlength=num_seg)


def _present_mask(index, num_seg, counts):
    """Which requested labels actually occur (absent => scipy's
    empty-set semantics: 0 for sum, NaN for mean-family, ValueError for
    min/max/positions, 0 for extrema)."""
    idx = np.asarray(index)
    within = (idx >= 0) & (idx < num_seg)
    safe = np.clip(idx, 0, num_seg - 1)
    return within & (counts[safe] > 0)


def _segment_sum_by(values, labels, num_seg):
    return jax.ops.segment_sum(
        values.ravel(), labels.ravel().astype(np.int32), num_segments=num_seg
    )


def _select_index(per_label, index, labels_given, x_sum_all):
    """Assemble the scipy-style return: scalar, array over index, or the
    global reduction when index is None."""
    if index is None:
        return x_sum_all
    vals = per_label[jnp.asarray(index)]
    return vals


def sum(input, labels=None, index=None):
    """Sum of values per label (scipy parity)."""
    _reject_complex(jnp.asarray(input))
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        return jnp.sum(x)
    num_seg = _num_segments(labels)
    sums = _segment_sum_by(x.astype(np.promote_types(x.dtype, np.float64)),
                           labels, num_seg)
    if index is None:
        return jnp.sum(jnp.where(jnp.arange(num_seg) > 0, sums, 0.0))
    out = sums[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    out = jnp.where(jnp.asarray(index) < num_seg, out, 0.0)
    return out[0] if scalar else out


sum_labels = sum


def _count_and_sum(x, labels, num_seg):
    xf = x.astype(np.promote_types(x.dtype, np.float64))
    sums = _segment_sum_by(xf, labels, num_seg)
    counts = _segment_sum_by(jnp.ones_like(xf), labels, num_seg)
    return counts, sums


def mean(input, labels=None, index=None):
    """Mean of values per label (scipy parity)."""
    _reject_complex(jnp.asarray(input))
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        return jnp.mean(x)
    num_seg = _num_segments(labels)
    counts, sums = _count_and_sum(x, labels, num_seg)
    means = sums / jnp.maximum(counts, 1)
    if index is None:
        mask = jnp.arange(num_seg) > 0
        tot = jnp.sum(jnp.where(mask, sums, 0.0))
        cnt = jnp.sum(jnp.where(mask, counts, 0.0))
        return tot / cnt  # 0/0 -> nan, matching scipy's empty division
    out = means[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    present = jnp.asarray(_present_mask(index, num_seg,
                                        _host_counts(labels, num_seg)))
    out = jnp.where(present, out, jnp.nan)
    return out[0] if scalar else out


def variance(input, labels=None, index=None):
    """Variance of values per label (scipy parity)."""
    _reject_complex(jnp.asarray(input))
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        return jnp.var(x)
    num_seg = _num_segments(labels)
    xf = x.astype(np.promote_types(x.dtype, np.float64))
    counts = _segment_sum_by(jnp.ones_like(xf.real), labels, num_seg)
    sums = _segment_sum_by(xf, labels, num_seg)
    means = sums / jnp.maximum(counts, 1)
    dev = xf - means[labels.astype(np.int32)]
    if np.dtype(xf.dtype).kind == "c":
        sq = (dev * jnp.conj(dev)).real
    else:
        sq = dev * dev
    var_sums = _segment_sum_by(sq, labels, num_seg)
    vars_ = var_sums / jnp.maximum(counts, 1)
    if index is None:
        mask = (jnp.arange(num_seg) > 0) & (counts > 0)
        cnt_all = jnp.sum(jnp.where(mask, counts, 0.0))
        m_all = jnp.sum(jnp.where(mask, sums, 0.0)) / cnt_all
        dev_all = jnp.where(labels.ravel() > 0, (xf.ravel() - m_all), 0.0)
        if np.dtype(xf.dtype).kind == "c":
            sq_all = (dev_all * jnp.conj(dev_all)).real
        else:
            sq_all = dev_all * dev_all
        return jnp.sum(sq_all) / cnt_all  # 0/0 -> nan like scipy
    out = vars_[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    present = jnp.asarray(_present_mask(index, num_seg,
                                        _host_counts(labels, num_seg)))
    out = jnp.where(present, out, jnp.nan)
    return out[0] if scalar else out


def standard_deviation(input, labels=None, index=None):
    """Standard deviation per label (scipy parity)."""
    return jnp.sqrt(variance(input, labels, index))


def _segment_minmax(x, labels, num_seg, is_min):
    xf = x.ravel()
    seg = labels.ravel().astype(np.int32)
    if is_min:
        return jax.ops.segment_min(xf, seg, num_segments=num_seg)
    return jax.ops.segment_max(xf, seg, num_segments=num_seg)


def minimum(input, labels=None, index=None):
    """Minimum per label (scipy parity)."""
    return _min_or_max(input, labels, index, True)


def maximum(input, labels=None, index=None):
    """Maximum per label (scipy parity)."""
    return _min_or_max(input, labels, index, False)


def _empty_reduction_error(is_min):
    # scipy lets numpy raise this when a requested label has no pixels
    return ValueError(
        "zero-size array to reduction operation "
        f"{'minimum' if is_min else 'maximum'} which has no identity"
    )


def _min_or_max(input, labels, index, is_min):
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        return jnp.min(x) if is_min else jnp.max(x)
    num_seg = _num_segments(labels)
    per = _segment_minmax(x, labels, num_seg, is_min)
    if index is None:
        if num_seg == 1:  # no nonzero labels at all
            raise _empty_reduction_error(is_min)
        masked = jnp.where(
            labels.ravel() > 0,
            x.ravel(),
            jnp.inf if is_min else -jnp.inf,
        )
        return jnp.min(masked) if is_min else jnp.max(masked)
    present = _present_mask(index, num_seg, _host_counts(labels, num_seg))
    # scipy raises only for a SCALAR absent index (np.min of the empty
    # value set); the list form reads 0.0 for absent labels
    if scalar and not present.all():
        raise _empty_reduction_error(is_min)
    out = per[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    if not present.all():
        out = jnp.where(jnp.asarray(present), out,
                        jnp.asarray(0, out.dtype))
    return out[0] if scalar else out


def _position_of(input, labels, index, is_min):
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        labels = jnp.ones(x.shape, np.int32)
        if index is None:
            flat = jnp.argmin(x) if is_min else jnp.argmax(x)
            return tuple(
                int(v) for v in np.unravel_index(int(flat), x.shape)
            )
    n = x.size
    if index is None and int(jnp.max(labels)) == 0:
        raise _empty_reduction_error(is_min)
    if index is None:
        # scipy merges every nonzero label into one region when index is
        # None (its _select path): position of the GLOBAL extremum over
        # labels>0, not the first per-label extremum.
        valid = labels.ravel() > 0
        xf = x.ravel()
        # dtype-safe sentinel: losers get the opposite global extremum so
        # they can never win the reduction below.
        if is_min:
            gval = jnp.min(jnp.where(valid, xf, jnp.max(xf)))
        else:
            gval = jnp.max(jnp.where(valid, xf, jnp.min(xf)))
        flat = jnp.min(jnp.where(valid & (xf == gval), jnp.arange(n), n))
        return tuple(int(v) for v in np.unravel_index(int(flat), x.shape))
    num_seg = _num_segments(labels)
    present = _present_mask(index, num_seg, _host_counts(labels, num_seg))
    # scalar absent index raises like scipy; list form yields position 0
    if scalar and not present.all():
        raise _empty_reduction_error(is_min)
    per = _segment_minmax(x, labels, num_seg, is_min)
    target = per[labels.ravel().astype(np.int32)]
    hit = x.ravel() == target
    # scipy's sort-based _select tie convention (with an explicit index):
    # minima report the FIRST raveled hit, maxima the LAST (stable sort by
    # (label, value) leaves the largest position at the segment end).
    if is_min:
        pos = jnp.where(hit, jnp.arange(n), n)
        first = jax.ops.segment_min(
            pos, labels.ravel().astype(np.int32), num_segments=num_seg
        )
    else:
        pos = jnp.where(hit, jnp.arange(n), -1)
        first = jax.ops.segment_max(
            pos, labels.ravel().astype(np.int32), num_segments=num_seg
        )
    flats = np.asarray(first[jnp.asarray(np.clip(index, 0, num_seg - 1))])
    flats = np.where(present, flats, 0)  # absent (extrema): position 0
    out = [
        tuple(int(v) for v in np.unravel_index(int(f), x.shape))
        for f in flats
    ]
    return out[0] if scalar else out


def minimum_position(input, labels=None, index=None):
    """Position of the per-label minimum (scipy parity; host sync)."""
    return _position_of(input, labels, index, True)


def maximum_position(input, labels=None, index=None):
    """Position of the per-label maximum (scipy parity; host sync)."""
    return _position_of(input, labels, index, False)


def extrema(input, labels=None, index=None):
    """(min, max, min_position, max_position) per label (scipy parity:
    a scalar absent index raises; absent labels in a list yield 0.0
    values and position 0, same as minimum()/maximum())."""
    return (
        minimum(input, labels, index),
        maximum(input, labels, index),
        minimum_position(input, labels, index),
        maximum_position(input, labels, index),
    )


def median(input, labels=None, index=None):
    """Median per label via sort + segment boundaries (scipy parity;
    replaces the reference's CUB lexsort path, measurements.py:719-902)."""
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    if labels is None:
        return jnp.median(x)
    num_seg = _num_segments(labels)
    seg = labels.ravel().astype(np.int64)
    xf = x.ravel().astype(np.promote_types(x.dtype, np.float64))
    # sort by (label, value) via a single key: label * large + rank-of-value
    order = jnp.lexsort((xf, seg))
    seg_sorted = seg[order]
    val_sorted = xf[order]
    counts = jnp.bincount(seg.astype(np.int32), length=num_seg)
    starts = jnp.concatenate(
        [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    lo_idx = starts + jnp.maximum((counts - 1) // 2, 0)
    hi_idx = starts + jnp.maximum(counts // 2, 0)
    lo = val_sorted[jnp.clip(lo_idx, 0, x.size - 1)]
    hi = val_sorted[jnp.clip(hi_idx, 0, x.size - 1)]
    med = 0.5 * (lo + hi)
    if index is None:
        mask = seg > 0
        vals = jnp.where(mask, xf, jnp.nan)
        return jnp.nanmedian(vals)
    out = med[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    # absent labels -> NaN.  (scipy's scalar form gives NaN; its list
    # form reads unspecified garbage out of the empty segment-boundary
    # arithmetic — NaN is the sane common answer.)
    present = jnp.asarray(_present_mask(index, num_seg,
                                        _host_counts(labels, num_seg)))
    out = jnp.where(present, out, jnp.nan)
    return out[0] if scalar else out


def center_of_mass(input, labels=None, index=None):
    """Center of mass per label (scipy parity)."""
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    xf = x.astype(np.promote_types(x.dtype, np.float64))
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=np.float64) for s in x.shape], indexing="ij"
    )
    if labels is None:
        total = jnp.sum(xf)
        return tuple(float(jnp.sum(xf * g) / total) for g in grids)
    num_seg = _num_segments(labels)
    wsum = _segment_sum_by(xf, labels, num_seg)
    coords = [
        _segment_sum_by(xf * g, labels, num_seg) / wsum for g in grids
    ]
    if index is None:
        mask = labels.ravel() > 0
        tot = jnp.sum(jnp.where(mask, xf.ravel(), 0.0))
        return tuple(
            float(jnp.sum(jnp.where(mask, (xf * g).ravel(), 0.0)) / tot)
            for g in grids
        )
    idx = jnp.asarray(np.clip(index, 0, num_seg - 1))
    present = _present_mask(index, num_seg, _host_counts(labels, num_seg))
    cols = [np.where(present, np.asarray(c[idx]), np.nan) for c in coords]
    out = [tuple(float(c[i]) for c in cols) for i in range(len(index))]
    return out[0] if scalar else out


def histogram(input, min, max, bins, labels=None, index=None):
    """Histogram of values (optionally per label) (scipy parity)."""
    x, labels, index, scalar = _norm_labels_index(input, labels, index)
    bins = int(bins)
    edges = np.linspace(float(min), float(max), bins + 1)
    xf = x.ravel()
    bin_idx = jnp.searchsorted(jnp.asarray(edges), xf, side="right") - 1
    bin_idx = jnp.where(xf == edges[-1], bins - 1, bin_idx)
    in_range = (bin_idx >= 0) & (bin_idx < bins)
    if labels is None:
        counts = jnp.bincount(
            jnp.where(in_range, bin_idx, 0).astype(np.int32),
            weights=in_range.astype(np.float64),
            length=bins,
        )
        return counts.astype(np.int64)
    num_seg = _num_segments(labels)
    seg = labels.ravel().astype(np.int64)
    key = seg * bins + jnp.where(in_range, bin_idx, 0)
    counts = jnp.bincount(
        key.astype(np.int64),
        weights=in_range.astype(np.float64),
        length=num_seg * bins,
    ).reshape(num_seg, bins).astype(np.int64)
    if index is None:
        mask = (jnp.arange(num_seg) > 0)[:, None]
        return jnp.sum(jnp.where(mask, counts, 0), axis=0)
    sel = counts[jnp.asarray(np.clip(index, 0, num_seg - 1))]
    if scalar:
        return sel[0]
    return [sel[i] for i in range(sel.shape[0])]


def labeled_comprehension(
    input, labels, index, func, out_dtype, default, pass_positions=False
):
    """Apply ``func`` to the values (and optionally positions) of each
    labeled region (scipy parity; host loop over regions like the
    reference, measurements.py:1245+)."""
    x = jnp.asarray(input)
    if labels is None:
        if pass_positions:
            return func(x.ravel(), jnp.arange(x.size))
        return func(x.ravel())
    labels_np = np.asarray(labels)
    x_np = np.asarray(x)
    scalar = np.isscalar(index) or (
        hasattr(index, "ndim") and getattr(index, "ndim") == 0
    )
    if index is None:
        mask = labels_np > 0
        vals = x_np[mask]
        if pass_positions:
            pos = np.flatnonzero(mask)
            return func(vals, pos)
        return func(vals)
    idx_list = [int(index)] if scalar else [int(i) for i in np.asarray(index)]
    out = np.empty(len(idx_list), dtype=out_dtype)
    flat_labels = labels_np.ravel()
    flat_x = x_np.ravel()
    for k, i in enumerate(idx_list):
        mask = flat_labels == i
        if not mask.any():
            out[k] = default
            continue
        if pass_positions:
            out[k] = func(flat_x[mask], np.flatnonzero(mask))
        else:
            out[k] = func(flat_x[mask])
    return out[0] if scalar else out


@functools.partial(jax.jit, static_argnames=("num_seg",))
def _bbox_reduce(labels, num_seg):
    """Per-label coordinate min/max via segment reductions.

    Device-side replacement for scipy's host ``find_objects`` loop
    (reference _regionprops.py:8,1235 round-trips through the CPU); XLA
    scatter-min/max is native on TPU (SURVEY.md N14).
    """
    seg = labels.ravel().astype(np.int32)
    seg = jnp.where((seg < 0) | (seg >= num_seg), 0, seg)
    los, his = [], []
    for ax in range(labels.ndim):
        shape = [1] * labels.ndim
        shape[ax] = labels.shape[ax]
        coord = jnp.arange(labels.shape[ax], dtype=np.int32).reshape(shape)
        coord = jnp.broadcast_to(coord, labels.shape).ravel()
        los.append(jax.ops.segment_min(coord, seg, num_segments=num_seg))
        his.append(jax.ops.segment_max(coord, seg, num_segments=num_seg))
    return jnp.stack(los, 1), jnp.stack(his, 1)


def find_objects(input, max_label=0):
    """Find the bounding slices of labeled objects (scipy parity).

    Returns a list of slice-tuples for labels ``1..max_label`` (``None``
    for labels not present).  The bounding boxes are computed on device
    with one segment-min/max pass; only the (max_label, 2*ndim) box table
    crosses to the host.
    """
    x = jnp.asarray(input)
    if x.ndim == 0:
        # scipy: a nonzero scalar is one object with an empty slice tuple
        n = max_label if max_label > 0 else int(x)
        return [() if lbl == int(x) else None for lbl in range(1, n + 1)]
    if max_label <= 0:
        max_label = int(jnp.max(x)) if x.size else 0
    if max_label <= 0:
        return []
    lo, hi = _bbox_reduce(x, max_label + 1)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    imax = np.iinfo(np.int32).max
    result = []
    for lbl in range(1, max_label + 1):
        if lo[lbl, 0] == imax:  # segment_min identity => label absent
            result.append(None)
        else:
            result.append(
                tuple(
                    slice(int(a), int(b) + 1)
                    for a, b in zip(lo[lbl], hi[lbl])
                )
            )
    return result


def value_indices(arr, *, ignore_value=None):
    """Dict mapping each distinct value to its index arrays (scipy >=
    1.10 parity; beyond the reference's scipy era).

    One device sort groups all positions (XLA sort replaces scipy's
    C histogram pass); the final dict of numpy index arrays is host
    data by construction, matching scipy's return type.
    """
    a = jnp.asarray(arr)
    if a.dtype.kind not in "iu":
        raise ValueError(
            "Parameter 'arr' must be an integer array"
        )
    flat = a.ravel()
    order = np.asarray(jnp.argsort(flat, stable=True))
    svals = np.asarray(flat)[order]
    # group boundaries on the sorted values
    uniq, starts = np.unique(svals, return_index=True)
    out = {}
    bounds = list(starts) + [svals.size]
    for i, v in enumerate(uniq):
        if ignore_value is not None and v == ignore_value:
            continue
        idx = np.sort(order[bounds[i]:bounds[i + 1]])
        out[v] = np.unravel_index(idx, a.shape)
    return out
