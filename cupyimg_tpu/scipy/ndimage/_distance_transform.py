"""Distance transforms (absent in the reference — its morphology.py:32-38
documents them as not implemented; scipy parity here).

TPU-native design: the exact squared Euclidean distance transform is
separable into per-axis *min-plus convolutions*
``g(i) = min_j (f(j) + s^2 (i-j)^2)`` (Felzenszwalb & Huttenlocher 2012).
scipy computes each 1-D envelope with a sequential stack algorithm; here
the min-plus form is evaluated directly as a blocked, fully vectorized
reduction over j — O(n) per output element but embarrassingly parallel
over rows and output positions, which maps far better onto the VPU than
a data-dependent stack.  Feature-index tracking (``return_indices``)
rides along as the argmin of the same reduction.

``distance_transform_cdt`` (taxicab/chessboard) and the brute-force
variant reuse the same machinery with the appropriate per-axis metric.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "distance_transform_edt",
    "distance_transform_cdt",
    "distance_transform_bf",
]

_BLOCK = 256


@functools.partial(jax.jit, static_argnames=("axis", "track"))
def _minplus_axis(f, pos, axis, scale2, track):
    """One min-plus pass: out(i) = min_j f(j) + scale2*(i-j)^2 along
    ``axis``; optionally carries the per-axis feature coordinates in
    ``pos`` (tuple of int32 arrays) through the argmin.

    The reduction over j runs as a ``lax.scan`` over j-blocks so the
    (rows, n, B) broadcast stays a fused transient instead of a
    materialized cost tensor.
    """
    n = f.shape[axis]
    fm = jnp.moveaxis(f, axis, -1)
    lead = fm.shape[:-1]
    fm = fm.reshape(-1, n)
    pm = [jnp.moveaxis(p, axis, -1).reshape(-1, n) for p in pos]

    nb = -(-n // _BLOCK)
    npad = nb * _BLOCK
    big = jnp.asarray(np.float32(np.inf), f.dtype)
    fpad = jnp.pad(fm, ((0, 0), (0, npad - n)), constant_values=big)
    jidx = jnp.arange(npad, dtype=jnp.int32)
    i = jnp.arange(n, dtype=f.dtype)

    f_blocks = fpad.T.reshape(nb, _BLOCK, -1)  # (nb, B, R)
    j_blocks = jidx.reshape(nb, _BLOCK)

    R = fm.shape[0]
    init_v = jnp.full((R, n), big, dtype=f.dtype)
    init_j = jnp.zeros((R, n), dtype=jnp.int32)

    def step(carry, blk):
        bestv, bestj = carry
        vals_t, jb = blk  # (B, R), (B,)
        # (R, n, B) broadcast fused into the reductions below
        cost = (
            vals_t.T[:, None, :]
            + scale2 * (i[None, :, None] - jb.astype(f.dtype)) ** 2
        )
        v = jnp.min(cost, axis=-1)
        a = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        upd = v < bestv
        bestv = jnp.where(upd, v, bestv)
        bestj = jnp.where(upd, jb[a], bestj)
        return (bestv, bestj), None

    (bestv, bestj), _ = lax.scan(
        step, (init_v, init_j), (f_blocks, j_blocks)
    )

    out = jnp.moveaxis(bestv.reshape(lead + (n,)), -1, axis)
    if not track:
        return out, pos
    new_pos = []
    for p in pm:
        g = jnp.take_along_axis(p, bestj, axis=-1)
        new_pos.append(
            jnp.moveaxis(g.reshape(lead + (n,)), -1, axis)
        )
    return out, new_pos


def _edt_core(input_bool, sampling, track):
    ndim = input_bool.ndim
    big = jnp.asarray(np.float32(1e20))
    f = jnp.where(input_bool, big, 0.0).astype(jnp.float32)

    if sampling is None:
        sampling = (1.0,) * ndim
    elif np.isscalar(sampling):
        sampling = (float(sampling),) * ndim
    else:
        sampling = tuple(float(s) for s in np.asarray(sampling))

    pos = None
    if track:
        pos = [
            jnp.broadcast_to(
                jnp.arange(input_bool.shape[ax], dtype=jnp.int32).reshape(
                    [-1 if i == ax else 1 for i in range(ndim)]
                ),
                input_bool.shape,
            )
            for ax in range(ndim)
        ]

    for ax in range(ndim):
        if track:
            # update all coordinate planes through this axis's argmin,
            # then overwrite this axis's plane with the argmin itself
            f, new_pos = _minplus_axis(
                f, tuple(pos), ax, np.float32(sampling[ax] ** 2), True
            )
            # recompute this axis's own coordinate: the argmin j is
            # where the feature came from along ax; new_pos[ax] already
            # holds pos[ax] gathered at argmin, which IS j's stored
            # coordinate from previous passes — correct as-is.
            pos = list(new_pos)
        else:
            f, _ = _minplus_axis(
                f, (), ax, np.float32(sampling[ax] ** 2), False
            )

    dist = jnp.sqrt(f)
    return dist, pos


def distance_transform_edt(
    input,
    sampling=None,
    return_distances=True,
    return_indices=False,
    distances=None,
    indices=None,
):
    """Exact Euclidean distance transform (scipy parity).

    Not implemented by the reference (cupyimg morphology.py:32-38).
    """
    if distances is not None or indices is not None:
        raise NotImplementedError(
            "cupyimg_tpu is functional: output arrays are returned, "
            "not written in place"
        )
    if not (return_distances or return_indices):
        raise RuntimeError("at least one output must be requested")
    x = jnp.asarray(input) != 0
    dist, pos = _edt_core(x, sampling, bool(return_indices))
    # scipy artifact for an all-foreground input (no zeros anywhere):
    # the nearest "feature" defaults to virtual index (-1, 0, ..., 0),
    # so dist[i0,...] = hypot((i0+1)*s0, i1*s1, ...)
    has_bg = jnp.any(~x)
    ndim = x.ndim
    if sampling is None:
        samp = (1.0,) * ndim
    elif np.isscalar(sampling):
        samp = (float(sampling),) * ndim
    else:
        samp = tuple(float(s) for s in np.asarray(sampling))
    acc = jnp.zeros((), jnp.float32)
    for ax in range(ndim):
        g = jnp.arange(x.shape[ax], dtype=jnp.float32)
        if ax == 0:
            g = g + 1.0
        shp = [1] * ndim
        shp[ax] = x.shape[ax]
        acc = acc + (g.reshape(shp) * np.float32(samp[ax])) ** 2
    virtual = jnp.broadcast_to(jnp.sqrt(acc), x.shape)
    dist = jnp.where(has_bg, dist, virtual)
    results = []
    if return_distances:
        results.append(dist)
    if return_indices:
        idx = jnp.stack(pos, axis=0)
        vidx = jnp.zeros_like(idx).at[0].set(-1)
        idx = jnp.where(has_bg, idx, vidx)
        results.append(idx)
    return results[0] if len(results) == 1 else tuple(results)


_CDT_METRICS = {
    "taxicab": 1,
    "cityblock": 1,
    "manhattan": 1,
    "chessboard": np.inf,
}


@functools.partial(jax.jit, static_argnames=("metric",))
def _cdt_core(x, metric):
    """Chamfer distance via iterated unit-ball dilation of the
    background (lax.while_loop until no unresolved pixels), exact for
    taxicab and chessboard metrics."""
    ndim = x.ndim
    big = jnp.asarray(np.int32(np.iinfo(np.int32).max // 2))
    d = jnp.where(x, big, 0).astype(jnp.int32)

    if metric == "chessboard":
        offsets = [
            off
            for off in np.ndindex(*([3] * ndim))
            if any(o != 1 for o in off)
        ]
        offsets = [tuple(int(o) - 1 for o in off) for off in offsets]
    else:
        offsets = []
        for ax in range(ndim):
            for s in (-1, 1):
                off = [0] * ndim
                off[ax] = s
                offsets.append(tuple(off))

    def shift(a, off):
        pads = []
        sls = []
        for ax, o in enumerate(off):
            if o >= 0:
                pads.append((o, 0))
                sls.append(slice(0, a.shape[ax]))
            else:
                pads.append((0, -o))
                sls.append(slice(-o, a.shape[ax] - o))
        return jnp.pad(a, pads, constant_values=big)[tuple(sls)]

    def body(carry):
        d, _ = carry
        best = d
        for off in offsets:
            best = jnp.minimum(best, shift(d, off) + 1)
        return best, jnp.any(best != d)

    d, _ = lax.while_loop(
        lambda c: c[1], body, (d, jnp.asarray(True))
    )
    return d


def distance_transform_cdt(
    input,
    metric="chessboard",
    return_distances=True,
    return_indices=False,
    distances=None,
    indices=None,
):
    """Chamfer distance transform (taxicab or chessboard; scipy
    parity).  Not implemented by the reference."""
    if distances is not None or indices is not None:
        raise NotImplementedError(
            "cupyimg_tpu is functional: output arrays are returned, "
            "not written in place"
        )
    if isinstance(metric, str):
        m = metric.lower()
        if m not in _CDT_METRICS:
            raise ValueError("invalid metric provided")
    else:
        raise NotImplementedError(
            "custom structuring-element metrics are not supported"
        )
    x = jnp.asarray(input) != 0
    results = []
    if return_distances:
        out = _cdt_core(x, "chessboard" if m == "chessboard" else "taxicab")
        # scipy returns -1 everywhere when there is no background
        out = jnp.where(jnp.any(~x), out, jnp.asarray(-1, out.dtype))
        results.append(out)
    if return_indices:
        # feature indices via the EDT machinery with the matching metric
        # exponentiation is not defined for chamfer; use euclidean argmin
        _, pos = _edt_core(x, None, True)
        results.append(jnp.stack(pos, axis=0))
    if not results:
        raise RuntimeError("at least one output must be requested")
    return results[0] if len(results) == 1 else tuple(results)


def distance_transform_bf(
    input,
    metric="euclidean",
    sampling=None,
    return_distances=True,
    return_indices=False,
    distances=None,
    indices=None,
):
    """Brute-force-equivalent distance transform (scipy parity).

    Dispatches to the same exact separable/chamfer engines — on TPU the
    'brute force' and 'fast' paths coincide."""
    m = metric.lower() if isinstance(metric, str) else metric
    if m in ("euclidean", 1):
        return distance_transform_edt(
            input, sampling, return_distances, return_indices,
            distances, indices,
        )
    if m in ("taxicab", "cityblock", "manhattan", 2):
        name = "taxicab"
    elif m in ("chessboard", 3):
        name = "chessboard"
    else:
        raise RuntimeError("distance metric not supported")
    return distance_transform_cdt(
        input, name, return_distances, return_indices, distances,
        indices,
    )
