"""Spline interpolation: tap/weight computation and gather engines.

TPU-native replacement for the reference's fused CUDA gather kernels
(cupyimg/scipy/ndimage/_interp_kernels.py:277-592, SURVEY.md N4).  Two
engines:

- ``gather_separable``: when the target coordinate along each axis depends
  only on that axis' output index (zoom/shift/diagonal affine), evaluation
  factorizes into sequential per-axis 1-d interpolation passes —
  (order+1) * ndim gathers instead of (order+1)^ndim.  This beats the
  reference's design point (its kernels always walk the full tap product).
- ``gather_general``: full per-point coordinates (map_coordinates / dense
  affine) — accumulates over the (order+1)^ndim tap product, one fused XLA
  gather per tap combination.

Spline weight formulas are SciPy's ni_splines.c math (public domain
formulas, also used by the reference's _spline_kernel_weights.py).
"""

from __future__ import annotations

import itertools
import math as _math

import numpy as np
import jax.numpy as jnp
from jax import lax

from cupyimg_tpu.core import boundary
from cupyimg_tpu.ops.iir import get_spline_mode


def spline_weights(t, order: int):
    """B-spline weights for fractional offset ``t`` (array), orders 1-5.

    ``t = c - floor(c)`` for odd orders, ``t = c - floor(c + 0.5)`` for even
    orders; returns a list of ``order + 1`` arrays.
    """
    if order == 1:
        return [1.0 - t, t]
    if order == 2:
        w1 = 0.75 - t * t
        y = 0.5 - t
        w0 = 0.5 * y * y
        return [w0, w1, 1.0 - w0 - w1]
    if order == 3:
        y = 1.0 - t
        w1 = (t * t * (t - 2.0) * 3.0 + 4.0) / 6.0
        w2 = (y * y * (y - 2.0) * 3.0 + 4.0) / 6.0
        w0 = y * y * y / 6.0
        return [w0, w1, w2, 1.0 - w0 - w1 - w2]
    if order == 4:
        y = t * t
        w2 = y * (y * 0.25 - 0.625) + 115.0 / 192.0
        y = 1.0 + t
        w1 = y * (y * (y * (5.0 - y) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0
        y = 1.0 - t
        w3 = y * (y * (y * (5.0 - y) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0
        y = 0.5 - t
        y = y * y
        w0 = y * y / 24.0
        return [w0, w1, w2, w3, 1.0 - w0 - w1 - w2 - w3]
    if order == 5:
        y = t * t
        w2 = y * (y * (0.25 - t / 12.0) - 0.5) + 0.55
        y = 1.0 - t
        yy = y * y
        w3 = yy * (yy * (0.25 - (1.0 - t) / 12.0) - 0.5) + 0.55
        y = t + 1.0
        w1 = (
            y * (y * (y * (y * (y / 24.0 - 0.375) + 1.25) - 1.75) + 0.625)
            + 0.425
        )
        y = 2.0 - t
        w4 = (
            y * (y * (y * (y * (y / 24.0 - 0.375) + 1.25) - 1.75) + 0.625)
            + 0.425
        )
        y = 1.0 - t
        yy = y * y
        w0 = (1.0 - t) * yy * yy / 120.0
        return [w0, w1, w2, w3, w4, 1.0 - w0 - w1 - w2 - w3 - w4]
    raise ValueError("order must be in 1..5")


def wrap_coord(c, n: int):
    """Remap a float coordinate into [0, n-1] with period n-1 ('wrap' mode:
    first and last samples are identified; reference _util.py:213-220)."""
    if n == 1:
        return jnp.zeros_like(c)
    period = float(n - 1)
    neg = c + period * (jnp.trunc(-c / period) + 1.0)
    pos = c - period * jnp.trunc(c / period)
    return jnp.where(c < 0, neg, jnp.where(c > period, pos, c))


def premap_coord(c, n: int, mode: str):
    """Float boundary premap of the target coordinate, matching scipy's
    map_coordinate() C routine: the coordinate folds into (or near) the
    domain *before* tap selection.  The distinction from mapping integer
    taps only matters at reflection tie points (e.g. half-integer
    coordinates under order 0), where orientation reversal flips the
    round-half-up direction."""
    if mode in ("constant", "grid-constant"):
        return c
    if mode == "wrap":
        return wrap_coord(c, n)
    if n == 1:
        return jnp.zeros_like(c)
    if mode == "nearest":
        return jnp.clip(c, 0, n - 1)
    if mode in ("grid-wrap",):
        return c - n * jnp.floor(c / n)
    if mode == "mirror":
        # scipy ni_interpolation.c map_coordinate NI_EXTEND_MIRROR: fold the
        # negative side up by whole periods, then either translate by one
        # period or negate.  Using abs(c) instead lands far-out negative
        # half-integers on the other side of the tie, flipping order-0
        # round-half-up direction (e.g. c=-4.5, n=5: scipy 3.5, abs 4.5).
        sz2 = 2.0 * n - 2.0
        cn = jnp.where(c < -sz2, sz2 * jnp.trunc(-c / sz2) + c, c)
        cn = jnp.where(cn <= 1.0 - n, cn + sz2, -cn)
        cp = c - sz2 * jnp.trunc(c / sz2)
        cp = jnp.where(cp >= n, sz2 - cp, cp)
        return jnp.where(c < 0, cn, jnp.where(c > n - 1, cp, c))
    if mode in ("reflect", "grid-mirror"):
        sz2 = 2.0 * n
        # negative side: fold up near the domain then reflect about -0.5
        cn = jnp.where(c < -sz2, sz2 * jnp.trunc(-c / sz2) + c, c)
        cn = jnp.where(cn < -n, cn + sz2, -cn - 1.0)
        # positive side: fold down then reflect about n-0.5
        cp = c - sz2 * jnp.trunc(c / sz2)
        cp = jnp.where(cp >= n, sz2 - cp - 1.0, cp)
        return jnp.where(c < 0, cn, jnp.where(c > n - 1, cp, c))
    raise ValueError(f"unrecognized mode: {mode}")


def _map_tap(idx, n: int, mode: str):
    """Map one integer tap index per ``mode``; returns (safe_idx, oob|None).

    For 'constant' the out-of-domain handling is the caller's outer mask, so
    taps just clamp; 'grid-constant' marks per-tap oob.
    """
    if mode == "grid-constant":
        oob = (idx < 0) | (idx >= n)
        return jnp.clip(idx, 0, n - 1), oob
    if mode == "constant":
        return jnp.clip(idx, 0, n - 1), None
    mapped, _ = boundary.map_indices(idx, n, mode)
    return mapped, None


def axis_taps(c, n: int, order: int, mode: str):
    """Per-axis taps: list of (index array, weight array, oob mask or None).

    Implements the tap/boundary decision table of the reference's
    _generate_interp_custom (_interp_kernels.py:355-560): 'wrap' remaps the
    float coordinate first; order >= 2 taps use the spline boundary family.
    """
    d = premap_coord(c, n, mode)
    if order == 0:
        # scipy rounds half up for the nearest-neighbor tap
        cf = jnp.floor(d + 0.5).astype(np.int32)
        idx, oob = _map_tap(cf, n, mode)
        return [(idx, None, oob)]

    if order == 1:
        cf = jnp.floor(d)
        w1 = d - cf
        w0 = 1.0 - w1
        cfi = cf.astype(np.int32)
        i0, oob0 = _map_tap(cfi, n, mode)
        i1, oob1 = _map_tap(cfi + 1, n, mode)
        return [(i0, w0, oob0), (i1, w1, oob1)]

    # order >= 2: spline footprint
    if mode == "grid-constant":
        tap_mode = "grid-constant"  # per-tap cval
    elif mode == "nearest":
        # scipy does NOT fold the coordinate into the domain here: taps
        # come from the raw coordinate and each clamps individually, so
        # out-of-domain points extrapolate with the edge sample's weight
        # mass (ni_interpolation.c edge handling).  Clip far enough out
        # that every tap still clamps to the same edge — keeps the int32
        # cast safe for arbitrarily large float coordinates.
        d = jnp.clip(c, -float(order + 2), float(n + order + 1))
        tap_mode = "nearest"
    elif mode == "constant":
        tap_mode = get_spline_mode("constant")  # mirror + outer mask
    else:
        tap_mode = get_spline_mode(mode)
    if order % 2:
        t = d - jnp.floor(d)
        start = jnp.floor(d).astype(np.int32) - order // 2
    else:
        half = jnp.floor(d + 0.5)
        t = d - half
        start = half.astype(np.int32) - order // 2
    weights = spline_weights(t, order)
    out = []
    for k in range(order + 1):
        idx, oob = _map_tap(start + k, n, tap_mode)
        out.append((idx, weights[k], oob))
    return out


def _outer_constant_mask(coords, shape):
    """mode='constant': any coordinate outside [0, n-1] -> cval."""
    mask = None
    for c, n in zip(coords, shape):
        m = (c < 0) | (c > n - 1)
        mask = m if mask is None else mask | m
    return mask


def _apply_cval(vals, oob, cval):
    if oob is None:
        return vals
    return jnp.where(oob, jnp.asarray(cval, dtype=vals.dtype), vals)


def shift_fir(filtered, shifts, npad: int, order: int, mode: str, cval,
              out_shape):
    """Constant-fraction shift as a static-slice separable FIR.

    ``scipy.ndimage.shift`` evaluates the spline at ``c_i = i - s`` per
    axis: the fractional part (hence the tap weights) is the *same* for
    every output index, so the whole op is one boundary extension plus an
    (order+1)-tap correlation with scalar weights per axis — static slices
    XLA fuses into a single HBM pass, instead of (order+1)*ndim dynamic
    gathers.  Exactness: for every mode whose float premap folds the
    coordinate with the same symmetry group as the integer tap map
    (mirror/reflect/grid-mirror/grid-wrap/nearest/constant/grid-constant),
    interpolating the extended sequence at the raw coordinate equals
    scipy's premap-then-tap, because the spline interpolant of the
    extension is invariant under the fold and B-splines are even.  Legacy
    'wrap' premaps with period n-1 but patches tap overruns with a mirror
    family (reference _interp_kernels.py:355-560 decision table) — no
    single extension reproduces that, so it returns None (caller falls
    back to the gather engine).

    Parameters mirror the gather path: ``filtered`` is the (possibly
    prepadded by ``npad``) coefficient array, ``shifts`` concrete per-axis
    floats, ``out_shape`` the original input shape.  Returns the shifted
    array or None when the fast path does not apply.
    """
    if mode in ("wrap",):
        return None
    ndim = filtered.ndim
    if order == 0 and mode in ("reflect", "mirror", "grid-mirror"):
        # order-0 rounds half UP; a reflection premap flips orientation, so
        # at exact half-integer coordinates the folded tie rounds the other
        # way — the one case where extension-then-raw-tap differs.
        for ax in range(ndim):
            if _math.remainder(float(npad) - float(shifts[ax]), 1.0) in (
                0.5, -0.5,
            ):
                return None

    # per-axis plan: (pad_lo, pad_hi, base_offset, weights)
    plans = []
    for ax in range(ndim):
        n_out = out_shape[ax]
        m = filtered.shape[ax]
        c0 = float(npad) - float(shifts[ax])  # c_i = i + c0 in filtered coords
        if order == 0:
            base = int(_math.floor(c0 + 0.5))
            weights = [1.0]
        elif order % 2:
            t = c0 - _math.floor(c0)
            base = int(_math.floor(c0)) - order // 2
            weights = [float(w) for w in spline_weights(np.float64(t), order)]
        else:
            half = _math.floor(c0 + 0.5)
            t = c0 - half
            base = int(half) - order // 2
            weights = [float(w) for w in spline_weights(np.float64(t), order)]
        ntap = len(weights)
        j_min = base
        j_max = n_out - 1 + base + ntap - 1
        pad_lo = max(0, -j_min)
        pad_hi = max(0, j_max - (m - 1))
        if pad_lo > m + ntap or pad_hi > m + ntap:
            return None  # giant shift: not worth the memory blow-up
        plans.append((pad_lo, pad_hi, base + pad_lo, weights))

    if mode == "grid-constant":
        pad_mode = "grid-constant"
    elif mode == "nearest":
        pad_mode = "nearest"
    elif mode == "constant":
        pad_mode = get_spline_mode("constant") if order >= 2 else "nearest"
    else:
        pad_mode = get_spline_mode(mode) if order >= 2 else mode

    y = boundary.pad(
        filtered, [(p[0], p[1]) for p in plans], pad_mode, cval,
    )
    wdtype = y.real.dtype
    for ax in range(ndim):
        _, _, off, weights = plans[ax]
        n_out = out_shape[ax]
        acc = None
        for k, w in enumerate(weights):
            part = lax.slice_in_dim(y, off + k, off + k + n_out, axis=ax)
            if order > 0:
                part = part * jnp.asarray(w, wdtype)
            acc = part if acc is None else acc + part
        y = acc

    if mode == "constant":
        # outer mask (c outside the original domain) has static extent
        cv = jnp.asarray(cval, y.dtype)
        for ax in range(ndim):
            n_out = out_shape[ax]
            s = float(shifts[ax])
            lo = min(n_out, max(0, int(_math.ceil(s))))
            hi_first = int(_math.floor(n_out - 1 + s)) + 1
            hi = min(n_out, max(0, n_out - hi_first))
            if lo:
                sl = [slice(None)] * ndim
                sl[ax] = slice(0, lo)
                y = y.at[tuple(sl)].set(cv)
            if hi:
                sl = [slice(None)] * ndim
                sl[ax] = slice(n_out - hi, n_out)
                y = y.at[tuple(sl)].set(cv)
    return y


def shift_spline_fused(x, shifts, order: int, mode: str, cval,
                       interpret=False):
    """Order >= 2 shift with the spline prefilter FUSED into the tap FIR.

    The spline prefilter is a separable symmetric FIR per axis
    (ops/iir.spline_filter_fir) and a constant-fraction shift is a
    separable (order+1)-tap FIR per axis (``shift_fir`` above); both use
    the same boundary extension, and for the extension-invariant mode
    family (mirror/reflect/grid-mirror/grid-wrap — the same invariance
    argument as ``shift_fir``'s docstring) their composition is exactly
    one correlation with the convolved kernel.  That collapses
    ``ndi.shift(order>=2)`` from 2-3 HBM passes (one per prefilter pole
    + the tap FIR) into ONE fused Pallas pass: the reference runs one
    spline-prefilter RawKernel per axis plus the gather kernel
    (cupyimg/scipy/ndimage/interpolation.py:701-818).

    The combined kernel's tails are trimmed at 3e-9 of the peak (below
    f32 resolution of the result; the prefilter itself already
    truncates its boundary sums at 1e-10, reference
    _spline_prefilter_core.py:270-275).  Returns None when the path
    does not apply (wrong backend/dtype/mode, shift too large for an
    in-window origin, kernel longer than the engine's tap limit).
    """
    if order < 2 or mode not in (
        "mirror", "reflect", "grid-mirror", "grid-wrap"
    ):
        return None
    if np.dtype(x.dtype) != np.float32 or x.ndim not in (2, 3):
        return None
    if not interpret:
        import jax

        if jax.default_backend() != "tpu":
            return None
    from cupyimg_tpu.ops import pallas_stencil
    from cupyimg_tpu.ops.iir import get_poles, _symmetric_pole_taps

    # combined prefilter impulse response over all poles (f64)
    h = np.ones(1, dtype=np.float64)
    for z in get_poles(order):
        nb = int(_math.ceil(_math.log(1e-10) / _math.log(abs(z))))
        h = np.convolve(h, _symmetric_pole_taps(z, nb))
    nh = (len(h) - 1) // 2

    spline_mode = get_spline_mode(mode)
    weights = []
    origins = []
    for ax in range(x.ndim):
        c0 = -float(shifts[ax])
        if order % 2:
            t = c0 - _math.floor(c0)
            base = int(_math.floor(c0)) - order // 2
        else:
            half = _math.floor(c0 + 0.5)
            t = c0 - half
            base = int(half) - order // 2
        w = np.array(
            [float(v) for v in spline_weights(np.float64(t), order)],
            dtype=np.float64,
        )
        # tap positions: (base - nh) .. (base + order + nh)
        g = np.convolve(h, w)
        start = base - nh
        keep = np.abs(g) > 3e-9 * np.abs(g).max()
        i0 = int(np.argmax(keep))
        i1 = len(g) - int(np.argmax(keep[::-1]))
        g = g[i0:i1]
        start += i0
        # near-integer shifts collapse the composed kernel to ~a delta
        # away from the center; pad with zero taps so the window
        # straddles the output index (the engine requires lo, hi >= 0)
        if start > 0:
            g = np.concatenate([np.zeros(start), g])
            start = 0
        end = start + len(g) - 1
        if end < 0:
            g = np.concatenate([g, np.zeros(-end)])
        size = len(g)
        # stencil convention: tap k at i + k - size//2 - origin
        origin = -(size // 2) - start
        lo = size // 2 + origin
        hi = size - 1 - lo
        if lo < 0 or hi < 0:
            return None  # shift too large: window does not straddle i
        if size > 2 * x.shape[ax] or size > 64:
            return None  # engine tap limit (pallas_stencil._MAX_TAPS)
        weights.append(tuple(float(v) for v in g))
        origins.append(int(origin))

    if not interpret and not pallas_stencil.supports(x, weights):
        return None
    return pallas_stencil.fused_separable_correlate(
        x, weights, tuple(origins), (spline_mode,) * x.ndim, float(cval),
        interpret=interpret,
    )


def gather_general(x, coords, order: int, mode: str, cval):
    """Interpolate ``x`` at dense coordinates (list of ndim arrays, each of
    the output shape).  Returns the accumulated float/complex output."""
    ndim = x.ndim
    taps = [axis_taps(coords[j], x.shape[j], order, mode) for j in range(ndim)]
    out = None
    for combo in itertools.product(*taps):
        idxs = tuple(t[0] for t in combo)
        vals = x[idxs]
        w = None
        oob = None
        for t in combo:
            if t[1] is not None:
                w = t[1] if w is None else w * t[1]
            if t[2] is not None:
                oob = t[2] if oob is None else oob | t[2]
        vals = _apply_cval(vals, oob, cval)
        term = vals if w is None else vals * w.astype(vals.real.dtype)
        out = term if out is None else out + term
    if mode == "constant":
        mask = _outer_constant_mask(coords, x.shape)
        out = jnp.where(mask, jnp.asarray(cval, dtype=out.dtype), out)
    return out


def gather_plane_rows(xflat, coords2, plane_shape, order: int, mode: str,
                      cval):
    """Interpolate a 2-axis-coupled plane with a lane-uniform batch axis.

    ``xflat`` is ``(n0 * n1, B)``: the coupled plane flattened on axis 0
    and every un-mixed (identity) axis flattened to ``B`` lanes.  Because
    the batch coordinate is untouched by the transform, each of the
    ``(order+1)^2`` taps is one *row* move — a ``jnp.take`` along axis 0
    of 4*B-byte rows, which XLA lowers to plain DMA at a measured ~500
    GB/s on v5e for B=256 — with zero within-row lane gathers.  This is
    the fast path for ``rotate`` on volumes: the GTG kernel pays the
    dynamic-gather unit for every tap, while the identity axis makes
    that work unnecessary.

    Semantics identical to ``gather_general`` over the two coupled axes
    (same axis_taps / oob / cval handling); the outer mode='constant'
    mask is the caller's job, matching the one-hot/GTG route in
    scipy/ndimage/interpolation.py.

    Reference: cupyimg/scipy/ndimage/_interp_kernels.py:277-592 (the
    per-thread tap loop; here the batch axis amortizes it across lanes).
    """
    n0, n1 = plane_shape
    B = xflat.shape[1]
    out_shape = coords2[0].shape
    taps0 = axis_taps(coords2[0], n0, order, mode)
    taps1 = axis_taps(coords2[1], n1, order, mode)
    out = None
    for i0, w0, ob0 in taps0:
        for i1, w1, ob1 in taps1:
            flat = (i0 * np.int32(n1) + i1).reshape(-1)
            vals = jnp.take(xflat, flat, axis=0)  # (P, B) row gather
            oob = None
            if ob0 is not None:
                oob = ob0
            if ob1 is not None:
                oob = ob1 if oob is None else (oob | ob1)
            if oob is not None:
                vals = jnp.where(
                    oob.reshape(-1, 1),
                    jnp.asarray(cval, dtype=vals.dtype),
                    vals,
                )
            w = None
            if w0 is not None:
                w = w0
            if w1 is not None:
                w = w1 if w is None else w * w1
            if w is not None:
                vals = vals * w.reshape(-1, 1).astype(vals.real.dtype)
            out = vals if out is None else out + vals
    return out.reshape(out_shape + (B,))


def gather_separable(x, coords_1d, order: int, mode: str, cval):
    """Interpolate with per-axis 1-d coordinates (zoom/shift/diagonal
    affine): sequential per-axis passes, (order+1)*ndim gathers total.

    cval substitution per axis is correct because it is absorbing: once a
    tap reads cval it stays cval through later axes (grid-constant), and the
    'constant' outer mask is applied pointwise at the end.
    """
    ndim = x.ndim
    y = x
    for axis in range(ndim):
        c = coords_1d[axis]
        taps = axis_taps(c, x.shape[axis], order, mode)
        acc = None
        for idx, w, oob in taps:
            vals = jnp.take(y, idx, axis=axis)
            if oob is not None:
                shape = [1] * y.ndim
                shape[axis] = oob.shape[0]
                vals = jnp.where(
                    oob.reshape(shape), jnp.asarray(cval, dtype=vals.dtype),
                    vals,
                )
            if w is not None:
                shape = [1] * y.ndim
                shape[axis] = w.shape[0]
                vals = vals * w.reshape(shape).astype(vals.real.dtype)
            acc = vals if acc is None else acc + vals
        y = acc
    if mode == "constant":
        mask = None
        for axis in range(ndim):
            c = coords_1d[axis]
            m = (c < 0) | (c > x.shape[axis] - 1)
            shape = [1] * ndim
            shape[axis] = m.shape[0]
            m = m.reshape(shape)
            mask = m if mask is None else mask | m
        y = jnp.where(mask, jnp.asarray(cval, dtype=y.dtype), y)
    return y
