"""Halo exchange and sharded separable filtering over a TPU mesh.

Design (new for TPU; no reference counterpart — SURVEY.md §2.4):

- A volume axis sharded over a mesh axis needs ``lo``/``hi`` halo slabs from
  its neighbors to evaluate a stencil near shard edges.  Interior halos move
  over ICI with ``lax.ppermute``; the global array edges use the ndimage
  boundary mode, computed *locally* (valid whenever halo width <= local
  shard width, which holds for all practical filter sizes).
- ``wrap``/``grid-wrap`` close the ppermute ring instead, so periodic
  boundaries also ride ICI.
- After exchange, the local stencil runs on the extended slab with the pads
  already consumed — one fused XLA computation per shard, collectives only
  at the halos.
"""

from __future__ import annotations

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cupyimg_tpu.core import boundary, dtypes, util


def _edge_pad(x, lo, hi, axis, mode, cval):
    """Boundary-extend one axis locally (used at global mesh edges)."""
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (lo, hi)
    return boundary.pad(x, pad_width, mode, cval)


def halo_exchange(x, lo: int, hi: int, axis: int, axis_name: str, mode: str,
                  cval=0.0):
    """Extend ``x`` along ``axis`` by (lo, hi) halo slabs inside shard_map.

    Interior shards receive neighbor data via ppermute; the first/last shard
    fill their outward-facing halo with the ndimage boundary mode.
    Must be called inside a ``shard_map`` with ``axis_name`` bound.
    """
    if lo == 0 and hi == 0:
        return x
    n_dev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    nloc = x.shape[axis]
    if lo > nloc or hi > nloc:
        raise ValueError(
            f"halo ({lo},{hi}) exceeds local shard extent {nloc}"
        )
    wrap = mode in ("wrap", "grid-wrap")

    parts = []
    if lo > 0:
        # slab my left neighbor sends me: its last `lo` elements
        send_right = lax.slice_in_dim(x, nloc - lo, nloc, axis=axis)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        if not wrap:
            perm = [(i, i + 1) for i in range(n_dev - 1)]
        from_left = lax.ppermute(send_right, axis_name, perm)
        if not wrap:
            # global low edge: boundary-extend locally and take the pad
            local = lax.slice_in_dim(
                _edge_pad(x, lo, 0, axis, mode, cval), 0, lo, axis=axis
            )
            from_left = jnp.where(
                idx == 0, local, from_left
            )
        parts.append(from_left)
    parts.append(x)
    if hi > 0:
        send_left = lax.slice_in_dim(x, 0, hi, axis=axis)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        if not wrap:
            perm = [(i + 1, i) for i in range(n_dev - 1)]
        from_right = lax.ppermute(send_left, axis_name, perm)
        if not wrap:
            ext = _edge_pad(x, 0, hi, axis, mode, cval)
            local = lax.slice_in_dim(
                ext, ext.shape[axis] - hi, ext.shape[axis], axis=axis
            )
            from_right = jnp.where(idx == n_dev - 1, local, from_right)
        parts.append(from_right)
    return jnp.concatenate(parts, axis=axis)


def _local_correlate1d_prehalo(xext, weights, axis, nloc, acc_dtype):
    """1-d correlation on a halo-extended slab (pads already consumed)."""
    out = None
    for k in range(weights.shape[0]):
        w = weights[k]
        if isinstance(weights, np.ndarray) and w == 0:
            continue
        sl = [slice(None)] * xext.ndim
        sl[axis] = slice(k, k + nloc)
        term = jnp.asarray(w).astype(acc_dtype) * xext[tuple(sl)].astype(
            acc_dtype
        )
        out = term if out is None else out + term
    return out


def _spec_axis_names(spec, ndim):
    """Per-array-axis mesh axis name (or None) from a PartitionSpec."""
    names = list(spec) + [None] * (ndim - len(list(spec)))
    out = []
    for nm in names:
        if isinstance(nm, (tuple, list)):
            if len(nm) > 1:
                raise NotImplementedError(
                    "multiple mesh axes per array axis not supported"
                )
            nm = nm[0] if nm else None
        out.append(nm)
    return out


def sharded_correlate1d(x, weights, axis, mesh, spec, mode="reflect",
                        cval=0.0, origin=0, acc_dtype=None):
    """1-d correlation along ``axis`` of an array sharded per ``spec``.

    ``spec`` is a ``PartitionSpec`` matching ``x``'s rank. If ``axis`` is
    sharded, halos move over ICI; unsharded axes are purely local.
    """
    weights = np.asarray(weights)
    x = jnp.asarray(x)
    if acc_dtype is None:
        acc_dtype = dtypes.promote_weights_dtype(x.dtype, weights.dtype,
                                                 "float")
    axis = util.check_axis(axis, x.ndim)
    size = weights.shape[0]
    lo = size // 2 + origin
    hi = size - 1 - lo
    names = _spec_axis_names(spec, x.ndim)
    axis_name = names[axis]

    def local_fn(xs):
        if axis_name is None:
            ext = _edge_pad(xs, lo, hi, axis, mode, cval)
        else:
            ext = halo_exchange(xs, lo, hi, axis, axis_name, mode, cval)
        return _local_correlate1d_prehalo(
            ext, weights, axis, xs.shape[axis], acc_dtype
        )

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return fn(x)


def sharded_separable(x, weights_per_axis, mesh, spec, mode="reflect",
                      cval=0.0, out_dtype=None):
    """Chain per-axis 1-d sharded correlations (separable filter)."""
    x = jnp.asarray(x)
    out_dtype = np.dtype(out_dtype or x.dtype)
    y = x
    for axis, w in enumerate(weights_per_axis):
        if w is None:
            continue
        y = sharded_correlate1d(y, w, axis, mesh, spec, mode, cval)
        y = y.astype(out_dtype)
    return y


def sharded_uniform_filter(x, size, mesh, spec, mode="reflect", cval=0.0):
    """uniform_filter for mesh-sharded volumes (ICI halo exchange)."""
    sizes = util.fix_sequence_arg(size, jnp.ndim(x), "size", int)
    weights = [
        np.full(s, 1.0 / s) if s > 1 else None for s in sizes
    ]
    return sharded_separable(x, weights, mesh, spec, mode, cval)


def sharded_gaussian_filter(x, sigma, mesh, spec, mode="reflect", cval=0.0,
                            truncate=4.0):
    """gaussian_filter for mesh-sharded volumes (ICI halo exchange)."""
    from cupyimg_tpu.scipy.ndimage.filters import _gaussian_kernel1d

    sigmas = util.fix_sequence_arg(sigma, jnp.ndim(x), "sigma", float)
    weights = []
    for s in sigmas:
        if s > 1e-15:
            lw = int(truncate * s + 0.5)
            weights.append(_gaussian_kernel1d(s, 0, lw)[::-1])
        else:
            weights.append(None)
    return sharded_separable(x, weights, mesh, spec, mode, cval)


def _local_minmax1d_prehalo(xext, size, axis, nloc, is_min):
    """Running 1-d min/max on a halo-extended slab."""
    op = jnp.minimum if is_min else jnp.maximum
    out = None
    for k in range(size):
        sl = [slice(None)] * xext.ndim
        sl[axis] = slice(k, k + nloc)
        term = xext[tuple(sl)]
        out = term if out is None else op(out, term)
    return out


def sharded_min_max_filter(x, size, mesh, spec, mode="reflect", cval=0.0,
                           *, is_min=True, origin=0):
    """Separable box minimum/maximum filter over a sharded volume
    (ICI halo exchange per sharded axis)."""
    x = jnp.asarray(x)
    sizes = util.fix_sequence_arg(size, x.ndim, "size", int)
    origins = util.fix_sequence_arg(origin, x.ndim, "origin", int)
    names = _spec_axis_names(spec, x.ndim)

    def make_local(axis, sz, og, axis_name):
        lo = sz // 2 + og
        hi = sz - 1 - lo

        def local_fn(xs):
            if axis_name is None:
                ext = _edge_pad(xs, lo, hi, axis, mode, cval)
            else:
                ext = halo_exchange(
                    xs, lo, hi, axis, axis_name, mode, cval
                )
            return _local_minmax1d_prehalo(
                ext, sz, axis, xs.shape[axis], is_min
            )

        return local_fn

    y = x
    for axis in range(x.ndim):
        if sizes[axis] <= 1:
            continue
        fn = shard_map(
            make_local(axis, sizes[axis], origins[axis], names[axis]),
            mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
        y = fn(y)
    return y


def sharded_minimum_filter(x, size, mesh, spec, mode="reflect", cval=0.0):
    """minimum_filter for mesh-sharded volumes."""
    return sharded_min_max_filter(
        x, size, mesh, spec, mode, cval, is_min=True
    )


def sharded_maximum_filter(x, size, mesh, spec, mode="reflect", cval=0.0):
    """maximum_filter for mesh-sharded volumes."""
    return sharded_min_max_filter(
        x, size, mesh, spec, mode, cval, is_min=False
    )


def sharded_median_filter(x, size, mesh, spec, mode="reflect", cval=0.0):
    """Box median filter over a sharded volume.

    Halos for every sharded axis are exchanged once, then each shard
    runs the rank-pruned sorting network locally (no further
    communication)."""
    from cupyimg_tpu.ops.sorting_networks import rank_select

    x = jnp.asarray(x)
    sizes = util.fix_sequence_arg(size, x.ndim, "size", int)
    names = _spec_axis_names(spec, x.ndim)
    k = int(np.prod(sizes))
    rank = k // 2
    los = [s // 2 for s in sizes]
    his = [s - 1 - lo for s, lo in zip(sizes, los)]

    def local_fn(xs):
        ext = xs
        for axis in range(xs.ndim):
            if sizes[axis] <= 1:
                continue
            if names[axis] is None:
                ext = _edge_pad(
                    ext, los[axis], his[axis], axis, mode, cval
                )
            else:
                ext = halo_exchange(
                    ext, los[axis], his[axis], axis, names[axis],
                    mode, cval,
                )
        vals = []
        import itertools as _it

        for off in _it.product(*[range(s) for s in sizes]):
            sl = tuple(
                slice(o, o + n) for o, n in zip(off, xs.shape)
            )
            vals.append(ext[sl])
        return rank_select(vals, rank)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return fn(x)


def sharded_fftconvolve(x, kernel, mesh, spec, mode="same"):
    """Batched FFT convolution where only BATCH axes are sharded.

    The convolved (trailing ``kernel.ndim``) axes must be unsharded in
    ``spec``; each shard then runs a plain local fftconvolve — data
    parallelism over ICI-free batch shards, the standard layout for
    filtering stacks of images."""
    from cupyimg_tpu.scipy.signal import fftconvolve

    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel)
    names = _spec_axis_names(spec, x.ndim)
    kdim = kernel.ndim
    if any(n is not None for n in names[x.ndim - kdim:]):
        raise ValueError(
            "convolved axes must be unsharded; shard only the batch "
            "axes"
        )

    def local_fn(xs):
        flat = xs.reshape((-1,) + xs.shape[x.ndim - kdim:])
        out = jax.vmap(
            lambda v: fftconvolve(v, kernel, mode=mode)
        )(flat)
        return out.reshape(xs.shape[: x.ndim - kdim] + out.shape[1:])

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return fn(x)


def sharded_label(x, mesh, spec, structure=None):
    """Distributed connected-component labeling over a device mesh.

    Any subset of the array axes may be sharded (``spec`` entries name
    mesh axes; 1-D row sharding and 2-D tile sharding both work).
    Labeling is the same atomics-free min-label propagation as
    :func:`cupyimg_tpu.scipy.ndimage.label` (measurements.py), run
    cooperatively:

    - labels are GLOBAL flat indices, built per shard from the global
      coordinate frame (shard start = mesh index * local extent), so
      root ids are globally consistent without communication;
    - each round, every shard exchanges a one-deep boundary slab with
      its mesh neighbors over ICI (``lax.ppermute``) on every sharded
      axis (global edges and unsharded axes pad with the SENT
      background sentinel), takes the windowed label minimum, and
      path-compresses against its *local* pointer table (cross-shard
      parents pass through unchanged — compression is only an
      accelerator, min-propagation alone converges);
    - the round loop is a ``lax.while_loop`` whose continue flag is the
      ``psum`` of the shards' local change flags over all mesh axes, so
      all shards stop together after the global fixpoint.

    The final 1..N relabel runs as plain global ops on the sharded
    result (a cumsum + gather; GSPMD inserts the collectives), which is
    cheap next to the propagation rounds.

    Returns ``(labels, num_features)`` like ``ndi.label``.
    """
    from cupyimg_tpu.scipy.ndimage.measurements import (
        _structure_offsets,
    )

    x = jnp.asarray(x)
    ndim = x.ndim
    names = _spec_axis_names(spec, ndim)
    sharded_names = [nm for nm in names if nm is not None]
    if not sharded_names:
        raise ValueError("spec shards no axis; use ndi.label instead")
    nloc = []
    for j, nm in enumerate(names):
        if nm is None:
            nloc.append(x.shape[j])
        else:
            nd = mesh.shape[nm]
            if x.shape[j] % nd:
                raise ValueError(
                    f"axis {j} ({x.shape[j]}) must divide mesh axis "
                    f"'{nm}' ({nd})"
                )
            nloc.append(x.shape[j] // nd)

    offsets = _structure_offsets(structure, ndim)
    use_box = len(offsets) == 3 ** ndim - 1
    n = x.size
    if n >= np.iinfo(np.int32).max:
        raise ValueError("sharded_label supports < 2^31 elements")
    SENT = np.int32(n)
    # global C-order strides
    strides = [1] * ndim
    for j in range(ndim - 2, -1, -1):
        strides[j] = strides[j + 1] * x.shape[j + 1]
    nlocal = int(np.prod(nloc, dtype=np.int64))

    def _starts():
        return [
            (lax.axis_index(names[j]) * nloc[j]).astype(np.int32)
            if names[j] is not None else np.int32(0)
            for j in range(ndim)
        ]

    def local_fn(xs):
        fg = xs != 0
        starts = _starts()
        # global flat index of every local cell
        gidx = jnp.zeros((), np.int32)
        for j in range(ndim):
            g = (jnp.arange(nloc[j], dtype=np.int32) + starts[j]) \
                * np.int32(strides[j])
            shp = [1] * ndim
            shp[j] = nloc[j]
            gidx = gidx + g.reshape(shp)
        gidx = jnp.broadcast_to(gidx, xs.shape)
        lab0 = jnp.where(fg, gidx, SENT)

        # Each outer round exchanges one K-deep halo, then runs K local
        # propagate+compress steps on the extended block before the
        # next collective.  Min-propagation is monotone, so working
        # from a halo that goes stale over the K steps cannot corrupt
        # the fixpoint — it only defers cross-shard information to the
        # next exchange — and the outer psum still certifies the global
        # fixpoint (an unchanged round starts with a fresh exchange).
        # This cuts per-round collectives K-fold: the loop is latency-
        # bound by ppermute/psum round trips, not by the array work.
        K = int(_os.environ.get("CUPYIMG_TPU_LABEL_STEPS", "1"))
        HOPS = int(_os.environ.get("CUPYIMG_TPU_LABEL_HOPS", "2"))
        for j in range(ndim):
            if names[j] is not None:
                K = min(K, nloc[j])  # single-hop ppermute depth bound
        interior = tuple(
            slice(K, K + nloc[j]) if names[j] is not None
            else slice(None)
            for j in range(ndim)
        )

        def localize(f, starts_):
            # global flat label value -> (in-shard?, local flat index)
            in_loc = f != SENT
            loc = jnp.zeros_like(f)
            for j in range(ndim):
                c = (f // np.int32(strides[j])) % np.int32(
                    x.shape[j])
                lc = c - starts_[j]
                in_loc = in_loc & (lc >= 0) & (lc < nloc[j])
                loc = loc * np.int32(nloc[j]) + lc
            return in_loc, jnp.clip(loc, 0, nlocal - 1)

        def propagate_ext(ext, fg_ext):
            """One min-propagation step over the whole extended block
            (halo cells evolve locally too; monotone, so safe)."""
            e1 = ext
            for j in range(ndim):
                e1 = _edge_pad(e1, 1, 1, j, "grid-constant", SENT)
            if use_box:
                m = lax.reduce_window(
                    e1, SENT, lax.min, (3,) * ndim, (1,) * ndim,
                    "VALID",
                )
            else:
                m = ext
                for off in offsets:
                    sl = tuple(
                        slice(1 + off[j], 1 + off[j] + ext.shape[j])
                        for j in range(ndim)
                    )
                    m = jnp.minimum(m, e1[sl])
            return jnp.where(fg_ext, jnp.minimum(ext, m), SENT)

        def compress_ext(ext, starts_):
            """Multi-hop path compression against the interior's local
            parent table (labels owned by other shards pass through).
            More hops shorten parent chains faster, trading local
            gathers for propagation rounds (and their collectives)."""
            tbl = ext[interior].ravel()
            f = ext.ravel()
            hop = f
            for _ in range(HOPS):
                in_, l_ = localize(hop, starts_)
                hop = jnp.where(in_, tbl[l_], hop)
            return jnp.minimum(f, hop).reshape(ext.shape)

        def round_(lab):
            # unsharded axes need no pre-pad: propagate_ext SENT-pads
            # every axis by one per step, which is the global edge
            ext = lab
            for j in range(ndim):
                if names[j] is not None:
                    ext = halo_exchange(
                        ext, K, K, j, names[j], "grid-constant", SENT
                    )
            fg_ext = ext != SENT
            starts_ = _starts()
            for _ in range(K):
                ext = compress_ext(
                    propagate_ext(ext, fg_ext), starts_
                )
            return ext[interior]

        def _changed(new, old):
            delta = jnp.any(new != old).astype(np.int32)
            for nm in sharded_names:
                delta = lax.psum(delta, nm)
            return delta > 0

        def cond(carry):
            _, changed = carry
            return changed

        def body(carry):
            lab, _ = carry
            new = round_(lab)
            return new, _changed(new, lab)

        lab1 = round_(lab0)
        lab, _ = lax.while_loop(cond, body, (lab1, _changed(lab1, lab0)))
        return lab

    roots = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )(x)

    # global 1..N relabel (raster-order roots, scipy's numbering)
    flat = roots.ravel()
    fg = flat != SENT
    is_root = (flat == jnp.arange(n, dtype=np.int32)) & fg
    rank = jnp.cumsum(is_root.astype(np.int32))
    safe = jnp.minimum(flat, np.int32(n - 1))
    new_flat = jnp.where(fg, rank[safe], 0)
    num = rank[n - 1] if n else jnp.asarray(0, np.int32)
    return new_flat.reshape(x.shape), num


def _normalize_depth(depth, ndim):
    """Per-axis (lo, hi) halo widths from an int / seq / seq-of-pairs."""
    if np.isscalar(depth):
        return [(int(depth), int(depth))] * ndim
    out = []
    for d in depth:
        if np.isscalar(d):
            out.append((int(d), int(d)))
        else:
            lo, hi = d
            out.append((int(lo), int(hi)))
    if len(out) != ndim:
        raise ValueError("depth must give one entry per array axis")
    return out


def sharded_map_overlap(func, x, depth, mesh, spec, mode="reflect",
                        cval=0.0):
    """Run a local stencil-style op over a sharded volume with halos.

    The generic overlap primitive the named wrappers build on (the
    TPU-native analog of the reference's overlap-add decomposition,
    signaltools.py:664-985, with the block boundary moved over ICI):
    every axis is extended by its ``depth`` = (lo, hi) halo — sharded
    axes exchange slabs with mesh neighbors via ``lax.ppermute``,
    unsharded axes take the ndimage boundary pad locally — then
    ``func`` runs on the extended local block and the interior is
    sliced back out.

    ``func`` must be shape-preserving and aligned: output element
    ``i`` of the extended block corresponds to input element ``i``
    (i.e. it consumes the pads in place, like a 'same' stencil).
    """
    x = jnp.asarray(x)
    depths = _normalize_depth(depth, x.ndim)
    names = _spec_axis_names(spec, x.ndim)

    def local_fn(xs):
        ext = xs
        for axis, (lo, hi) in enumerate(depths):
            if lo == 0 and hi == 0:
                continue
            if names[axis] is None:
                ext = _edge_pad(ext, lo, hi, axis, mode, cval)
            else:
                ext = halo_exchange(
                    ext, lo, hi, axis, names[axis], mode, cval
                )
        out = func(ext)
        for axis, (lo, _) in enumerate(depths):
            out = lax.slice_in_dim(
                out, lo, lo + xs.shape[axis], axis=axis
            )
        return out

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False,
    )
    return fn(x)


def _tap_accumulate(ext, taps, nloc_shape, acc_dtype):
    """Shifted-tap accumulation on a halo-extended block (pads
    consumed; the local compute of the dense sharded stencils)."""
    out = None
    for off, w in taps:
        sl = tuple(
            slice(o, o + n) for o, n in zip(off, nloc_shape)
        )
        term = jnp.asarray(w, acc_dtype) * ext[sl].astype(acc_dtype)
        out = term if out is None else out + term
    return out


def sharded_correlate(x, weights, mesh, spec, mode="reflect", cval=0.0,
                      origin=0, acc_dtype=None):
    """Dense nd correlation of a mesh-sharded volume.

    Halo widths come from the weight shape and origins; zero taps are
    skipped statically (the sharded counterpart of
    scipy.ndimage.correlate / the reference's dense stencil,
    _filters_core.py:190-348)."""
    weights = np.asarray(weights)
    x = jnp.asarray(x)
    if weights.ndim != x.ndim:
        raise RuntimeError("filter weights array has incorrect shape")
    if acc_dtype is None:
        acc_dtype = dtypes.promote_weights_dtype(
            x.dtype, weights.dtype, "float"
        )
    origins = util.fix_sequence_arg(origin, x.ndim, "origin", int)
    depths = []
    for ax in range(x.ndim):
        size = weights.shape[ax]
        lo = size // 2 + origins[ax]
        hi = size - 1 - lo
        if lo < 0 or hi < 0:
            raise ValueError("invalid origin")
        depths.append((lo, hi))
    taps = [
        (tuple(int(v) for v in idx), float(weights[tuple(idx)]))
        for idx in np.argwhere(weights != 0)
    ]

    def local_fn(ext):
        nloc_shape = tuple(
            e - lo - hi for e, (lo, hi) in zip(ext.shape, depths)
        )
        out = _tap_accumulate(ext, taps, nloc_shape, acc_dtype)
        pads = [(lo, e - n - lo) for e, n, (lo, _) in
                zip(ext.shape, nloc_shape, depths)]
        return jnp.pad(out, pads)  # re-align to the extended block

    return sharded_map_overlap(
        local_fn, x, depths, mesh, spec, mode, cval
    )


def sharded_convolve(x, weights, mesh, spec, mode="reflect", cval=0.0,
                     origin=0, acc_dtype=None):
    """Dense nd convolution of a mesh-sharded volume (mirrored
    correlation, scipy's origin flip for even sizes)."""
    weights = np.asarray(weights)
    origins = util.fix_sequence_arg(origin, jnp.ndim(x), "origin", int)
    flipped = weights[(slice(None, None, -1),) * weights.ndim]
    new_origins = [
        -o - 1 + (ws % 2) for o, ws in zip(origins, weights.shape)
    ]
    return sharded_correlate(
        x, flipped, mesh, spec, mode, cval, new_origins, acc_dtype
    )


def _binary_taps(structure, ndim):
    structure = (
        np.asarray(structure) if structure is not None
        else None
    )
    if structure is None:
        structure = np.zeros((3,) * ndim, bool)
        center = (1,) * ndim
        structure[center] = True
        for ax in range(ndim):
            for d in (0, 2):
                idx = list(center)
                idx[ax] = d
                structure[tuple(idx)] = True
    if structure.ndim != ndim:
        raise RuntimeError("structure rank must match input rank")
    return structure.astype(bool)


def _sharded_binary(x, structure, mesh, spec, border_value, is_erosion):
    x = jnp.asarray(x)
    structure = _binary_taps(structure, x.ndim)
    if not is_erosion:
        structure = structure[
            (slice(None, None, -1),) * structure.ndim
        ]
    depths = [
        (s // 2, s - 1 - s // 2) for s in structure.shape
    ]
    offs = [tuple(int(v) for v in idx)
            for idx in np.argwhere(structure)]
    fill = bool(border_value) if is_erosion else bool(border_value)

    def local_fn(ext):
        b = ext != 0
        nloc_shape = tuple(
            e - lo - hi for e, (lo, hi) in zip(ext.shape, depths)
        )
        acc = None
        op = jnp.logical_and if is_erosion else jnp.logical_or
        for off in offs:
            sl = tuple(
                slice(o, o + n) for o, n in zip(off, nloc_shape)
            )
            acc = b[sl] if acc is None else op(acc, b[sl])
        pads = [(lo, e - n - lo) for e, n, (lo, _) in
                zip(ext.shape, nloc_shape, depths)]
        return jnp.pad(acc, pads)

    return sharded_map_overlap(
        local_fn, x, depths, mesh, spec, "grid-constant", fill
    )


def sharded_binary_erosion(x, structure=None, mesh=None, spec=None,
                           border_value=0):
    """binary_erosion over a mesh-sharded volume (reference
    morphology.py:204-333 semantics for one iteration; the border is a
    constant ``border_value`` plane exchanged like any other halo)."""
    return _sharded_binary(x, structure, mesh, spec, border_value, True)


def sharded_binary_dilation(x, structure=None, mesh=None, spec=None,
                            border_value=0):
    """binary_dilation over a mesh-sharded volume (mirrored structure,
    reference morphology.py:396)."""
    return _sharded_binary(x, structure, mesh, spec, border_value,
                           False)

# ---------------------------------------------------------------------------
# Sharded interpolation: bounded-displacement warps.
#
# A spatially-sharded resample is feasible whenever every output element's
# source coordinate stays within a bounded distance D of its own position
# (registration-style warps, optical-flow resampling, subpixel shifts --
# the reference's map_coordinates uses, _optical_flow_utils.py:14-36).
# Then a halo of ceil(D) + spline support suffices and the gather never
# leaves the extended local block.  Spline prefiltering (order >= 2) is
# run locally on the extended block with extra halo: the IIR boundary
# init decays like pole^d (reference _spline_prefilter_core.py:270-275
# uses the same truncation), so _PREFILTER_HALO of 16 keeps the error
# under ~2e-6 even for order 5 (pole 0.43).
# ---------------------------------------------------------------------------

_PREFILTER_HALO = 16


def _interp_support(order):
    """Taps reach at most this many pixels from the rounded coordinate."""
    return order // 2 + 1


def _sharded_interp_depths(disp_lo, disp_hi, order, prefilter, ndim):
    r = _interp_support(order)
    p = _PREFILTER_HALO if (order >= 2 and prefilter) else 0
    return [
        (int(np.ceil(disp_lo[j])) + r + p,
         int(np.ceil(disp_hi[j])) + r + p)
        for j in range(ndim)
    ]


def _local_prefilter(ext, order, mode):
    from cupyimg_tpu.scipy.ndimage import interpolation as _interp

    # modes whose prefilter the reference implements by prepadding
    # (interpolation.py:254-270) reduce to mirror on the extended block;
    # the halo already holds the true neighbor/boundary data
    m = mode if mode in ("mirror", "reflect", "grid-wrap") else "mirror"
    return _interp.spline_filter(ext, order=order, mode=m,
                                 output=ext.dtype)


def _check_sharded_interp_mode(mode):
    if mode in ("wrap",):
        # legacy 'wrap' has period n-1 (last and first sample overlap),
        # which a ring halo exchange cannot express; grid-wrap (period
        # n) is supported.
        raise NotImplementedError(
            "sharded interpolation supports 'grid-wrap' but not legacy "
            "'wrap'"
        )


def _halo_fill_mode(mode):
    """Halo fill at the GLOBAL edges.

    Legacy 'constant' interpolates via the MIRROR extension of the
    spline coefficients and only masks fully-out-of-domain output
    coordinates to cval (scipy semantics; see ops/interp.py tap_mode
    for 'constant'), so its halo fill is mirror and the outer mask in
    the callers does the rest."""
    return "mirror" if mode == "constant" else mode


def sharded_shift(x, shift, mesh, spec, order=1, mode="reflect", cval=0.0,
                  prefilter=True):
    """ndi.shift over a mesh-sharded volume (uniform subpixel shift).

    The displacement is the same everywhere, so the halo per axis is
    ceil(|shift_j|) + spline support (+ prefilter halo).  Matches
    single-device ``ndi.shift`` to ~1e-5 (prefilter truncation at shard
    boundaries); halos must fit in one neighbor shard.
    """
    from cupyimg_tpu.scipy.ndimage import interpolation as _interp

    _check_sharded_interp_mode(mode)
    x = jnp.asarray(x)
    shifts = np.atleast_1d(np.asarray(shift, dtype=np.float64))
    if shifts.size == 1:
        shifts = np.full(x.ndim, float(shifts[0]))
    names = _spec_axis_names(spec, x.ndim)
    depths = _sharded_interp_depths(
        np.maximum(shifts, 0), np.maximum(-shifts, 0), order, prefilter,
        x.ndim,
    )
    n_glob = x.shape
    fill = _halo_fill_mode(mode)

    def local_fn(xs):
        ext = xs
        for axis, (lo, hi) in enumerate(depths):
            if names[axis] is None:
                ext = _edge_pad(ext, lo, hi, axis, fill, cval)
            else:
                ext = halo_exchange(ext, lo, hi, axis, names[axis], fill,
                                    cval)
        if order >= 2 and prefilter:
            ext = _local_prefilter(ext, order, mode)
        out = _interp.shift(ext, shifts, order=order, mode="nearest",
                            prefilter=False)
        for axis, (lo, _) in enumerate(depths):
            out = lax.slice_in_dim(out, lo, lo + xs.shape[axis],
                                   axis=axis)
        if mode == "constant":
            # scipy 'constant': source coordinate outside [0, n-1]
            # yields cval outright (no interpolation into the pad)
            bad = jnp.zeros(out.shape, bool)
            for axis in range(out.ndim):
                gi = jnp.arange(xs.shape[axis], dtype=np.float64)
                if names[axis] is not None:
                    gi = gi + lax.axis_index(names[axis]) * xs.shape[axis]
                src = gi - shifts[axis]
                bad1 = (src < 0) | (src > n_glob[axis] - 1)
                shp = [1] * out.ndim
                shp[axis] = out.shape[axis]
                bad = bad | bad1.reshape(shp)
            out = jnp.where(bad, jnp.asarray(cval, out.dtype), out)
        return out

    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    return fn(x)


def sharded_map_coordinates(x, coordinates, mesh, spec, max_displacement,
                            order=1, mode="reflect", cval=0.0,
                            prefilter=True):
    """ndi.map_coordinates over a mesh-sharded volume.

    ``coordinates`` has shape ``(x.ndim, *x.shape)`` and is sharded with
    the same spec as ``x`` (leading axis replicated); every coordinate
    must satisfy ``|coords[j] - index_j| <= max_displacement[j]``.  The
    gather then stays inside a halo-extended local block.
    """
    from cupyimg_tpu.scipy.ndimage import interpolation as _interp

    _check_sharded_interp_mode(mode)
    x = jnp.asarray(x)
    coordinates = jnp.asarray(coordinates)
    if coordinates.shape != (x.ndim,) + x.shape:
        raise ValueError(
            "sharded_map_coordinates needs dense identity-shaped "
            "coordinates (ndim, *x.shape)"
        )
    disp = np.atleast_1d(np.asarray(max_displacement, dtype=np.float64))
    if disp.size == 1:
        disp = np.full(x.ndim, float(disp[0]))
    names = _spec_axis_names(spec, x.ndim)
    depths = _sharded_interp_depths(disp, disp, order, prefilter, x.ndim)
    n_glob = x.shape
    cspec = P(None, *tuple(spec))
    fill = _halo_fill_mode(mode)

    def local_fn(xs, cs):
        ext = xs
        for axis, (lo, hi) in enumerate(depths):
            if names[axis] is None:
                ext = _edge_pad(ext, lo, hi, axis, fill, cval)
            else:
                ext = halo_exchange(ext, lo, hi, axis, names[axis], fill,
                                    cval)
        if order >= 2 and prefilter:
            ext = _local_prefilter(ext, order, mode)
        # global -> extended-local coordinates
        local_coords = []
        for j in range(x.ndim):
            c = cs[j]
            if names[j] is not None:
                c = c - (lax.axis_index(names[j]) * xs.shape[j]).astype(
                    c.dtype)
            local_coords.append(c + depths[j][0])
        out = _interp.map_coordinates(
            ext, jnp.stack(local_coords), order=order, mode="nearest",
            prefilter=False,
        )
        if mode == "constant":
            bad = jnp.zeros(out.shape, bool)
            for j in range(x.ndim):
                bad = bad | (cs[j] < 0) | (cs[j] > n_glob[j] - 1)
            out = jnp.where(bad, jnp.asarray(cval, out.dtype), out)
        return out

    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, cspec),
                   out_specs=spec, check_vma=False)
    return fn(x, coordinates)


def sharded_affine_transform(x, matrix, offset=0.0, mesh=None, spec=None,
                             order=1, mode="reflect", cval=0.0,
                             prefilter=True):
    """ndi.affine_transform over a mesh-sharded volume.

    Feasible for near-identity affines (small rotations/scalings around
    the volume, registration-style): the displacement ``M @ o + off - o``
    is linear in ``o``, so its per-axis extremes over the global output
    box sit at the box corners; those bound the halo.  Raises if the
    halo would exceed one neighbor shard.
    """
    from cupyimg_tpu.scipy.ndimage import interpolation as _interp

    _check_sharded_interp_mode(mode)
    x = jnp.asarray(x)
    ndim = x.ndim
    matrix = np.asarray(matrix, dtype=np.float64)
    if matrix.ndim == 1:
        matrix = np.diag(matrix)
    if matrix.shape != (ndim, ndim):
        raise ValueError("matrix must be (ndim,) or (ndim, ndim)")
    offsets = np.atleast_1d(np.asarray(offset, dtype=np.float64))
    if offsets.size == 1:
        offsets = np.full(ndim, float(offsets[0]))

    # displacement extremes over the global output box corners
    corners = np.array(
        [[(x.shape[j] - 1) * ((k >> j) & 1) for j in range(ndim)]
         for k in range(1 << ndim)], dtype=np.float64)
    disp = corners @ matrix.T + offsets - corners  # (2^ndim, ndim)
    disp_hi = np.maximum(disp.max(axis=0), 0)   # source beyond index
    disp_lo = np.maximum(-disp.min(axis=0), 0)  # source before index
    names = _spec_axis_names(spec, ndim)
    depths = _sharded_interp_depths(disp_lo, disp_hi, order, prefilter,
                                    ndim)
    n_glob = x.shape
    fill = _halo_fill_mode(mode)
    mat_j = jnp.asarray(matrix)
    off_j = jnp.asarray(offsets)

    def local_fn(xs):
        ext = xs
        for axis, (lo, hi) in enumerate(depths):
            if names[axis] is None:
                ext = _edge_pad(ext, lo, hi, axis, fill, cval)
            else:
                ext = halo_exchange(ext, lo, hi, axis, names[axis], fill,
                                    cval)
        if order >= 2 and prefilter:
            ext = _local_prefilter(ext, order, mode)
        # global output indices of this shard's block
        starts = []
        gidx = []
        for j in range(ndim):
            g = jnp.arange(xs.shape[j], dtype=jnp.float64)
            if names[j] is not None:
                start = lax.axis_index(names[j]) * xs.shape[j]
                g = g + start
                starts.append(start)
            else:
                starts.append(0)
            shp = [1] * ndim
            shp[j] = xs.shape[j]
            gidx.append(g.reshape(shp))
        # src_i = sum_j M[i, j] * o_j + off_i, then to ext-local frame
        local_coords = []
        for i in range(ndim):
            src = off_j[i]
            for j in range(ndim):
                src = src + mat_j[i, j] * gidx[j]
            src = jnp.broadcast_to(src, xs.shape)
            local_coords.append(src - starts[i] + depths[i][0])
        out = _interp.map_coordinates(
            ext, jnp.stack(local_coords), order=order, mode="nearest",
            prefilter=False,
        )
        if mode == "constant":
            bad = jnp.zeros(out.shape, bool)
            for i in range(ndim):
                src = off_j[i]
                for j in range(ndim):
                    src = src + mat_j[i, j] * gidx[j]
                src = jnp.broadcast_to(src, xs.shape)
                bad = bad | (src < 0) | (src > n_glob[i] - 1)
            out = jnp.where(bad, jnp.asarray(cval, out.dtype), out)
        return out

    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    return fn(x)


# ---------------------------------------------------------------------------
# transpose-based distributed FFT (SURVEY.md §5: collective-friendly FFT —
# shard non-FFT axes, retile with all-to-all between axis transforms)
# ---------------------------------------------------------------------------


def sharded_fft2(x, mesh, spec, inverse=False, transposed_out=False):
    """Distributed 2-D FFT of a 2-D array sharded along ONE axis.

    Transpose-based decomposition over ICI: each shard transforms its
    local rows along the *unsharded* axis, one ``all_to_all`` retiles so
    the other axis becomes fully local, the second transform runs, and
    (unless ``transposed_out``) a final ``all_to_all`` restores the input
    layout.  Exactly two collectives per transform — the textbook
    distributed-FFT layout for a mesh (the reference is single-GPU cuFFT,
    cupyimg/scipy/signal/signaltools.py:437-504; this axis-split design
    is new for the mesh).

    ``spec`` must shard exactly one of the two axes.  With
    ``transposed_out=True`` the result is returned still sharded along
    the OTHER axis (spec reversed) saving one all_to_all — callers doing
    fwd->pointwise->inv round trips (convolution) should use it for the
    forward pass and feed the same flag to the inverse.
    """
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("sharded_fft2 expects a 2-D array")
    names = _spec_axis_names(spec, 2)
    if sum(nm is not None for nm in names) != 1:
        raise ValueError("spec must shard exactly one of the two axes")
    sh_ax = 0 if names[0] is not None else 1
    loc_ax = 1 - sh_ax
    axis_name = names[sh_ax]
    fft = jnp.fft.ifft if inverse else jnp.fft.fft

    def local_fn(xs):
        # pass 1: transform the locally-complete axis
        y = fft(xs.astype(jnp.complex64 if xs.dtype != jnp.complex128
                          else xs.dtype), axis=loc_ax)
        # retile: split the local block along loc_ax, concatenate along
        # sh_ax — after this the formerly-sharded axis is fully local
        y = lax.all_to_all(
            y, axis_name, split_axis=loc_ax, concat_axis=sh_ax,
            tiled=True,
        )
        # pass 2: transform the now-local axis
        y = fft(y, axis=sh_ax)
        if not transposed_out:
            y = lax.all_to_all(
                y, axis_name, split_axis=sh_ax, concat_axis=loc_ax,
                tiled=True,
            )
        return y

    out_spec = spec
    if transposed_out:
        rev = [None, None]
        rev[loc_ax] = axis_name
        out_spec = P(*rev)
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
        check_vma=False,
    )
    return fn(x)


def sharded_fftconvolve2d_spatial(x, kernel, mesh, spec, mode="same"):
    """2-D FFT convolution with the IMAGE spatially sharded.

    For volumes too large for one device: forward distributed FFT
    (transposed output — saves one all_to_all), pointwise product with
    the replicated kernel spectrum under GSPMD, inverse distributed FFT.
    ``spec`` shards exactly one image axis; ``mode`` is 'same' or 'full'.
    """
    from cupyimg_tpu.scipy.signal.signaltools import _centered

    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel)
    if x.ndim != 2 or kernel.ndim != 2:
        raise ValueError("expects 2-D image and kernel")
    names = _spec_axis_names(spec, 2)
    sh_ax = 0 if names[0] is not None else 1
    axis_name = names[sh_ax]
    p = mesh.shape[axis_name]

    full = [x.shape[a] + kernel.shape[a] - 1 for a in range(2)]
    # padded global sizes: divisible by the mesh extent on BOTH axes so
    # the all_to_all retile has uniform blocks
    S = [-(-full[a] // p) * p for a in range(2)]

    xp = jnp.pad(x, [(0, S[0] - x.shape[0]), (0, S[1] - x.shape[1])])
    kf = jnp.fft.fftn(kernel.astype(xp.dtype), S)

    F = sharded_fft2(xp, mesh, spec, transposed_out=True)
    # the product is plain elementwise math on the (transposed-sharded)
    # spectrum; under jit/GSPMD it runs shard-local (kf is replicated)
    G = F * kf
    rev = [None, None]
    rev[1 - sh_ax] = axis_name
    out = sharded_fft2(G, mesh, P(*rev), inverse=True)
    # the inverse returned sharding along 1 - sh_ax; the crop below is
    # global-index math, GSPMD reshards as needed
    out = jnp.real(out)[: full[0], : full[1]]
    if mode == "full":
        return out
    if mode == "same":
        return _centered(out, x.shape)
    raise ValueError("mode must be 'same' or 'full'")
