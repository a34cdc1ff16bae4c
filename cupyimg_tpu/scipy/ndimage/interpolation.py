"""scipy.ndimage interpolation on TPU-native JAX engines.

API parity with reference cupyimg/scipy/ndimage/interpolation.py
(SURVEY.md C10): spline_filter1d/spline_filter, map_coordinates,
affine_transform, shift, zoom, rotate — spline orders 0-5, all boundary
modes, complex dtypes, integer-output rounding, ``allow_float32``.

TPU-first design: the prefilter is a batched lax.scan recurrence
(ops/iir.py), and separable transforms (shift/zoom/diagonal affine) run as
sequential per-axis 1-d interpolation passes — (order+1)*ndim gathers
instead of the reference's (order+1)^ndim-tap kernels (ops/interp.py).
"""

from __future__ import annotations

import functools
import math
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from cupyimg_tpu.core import boundary as _boundary, util
from cupyimg_tpu.ops import iir, interp

__all__ = [
    "spline_filter1d",
    "spline_filter",
    "map_coordinates",
    "affine_transform",
    "shift",
    "zoom",
    "rotate",
    "geometric_transform",
]


def _check_parameter(func_name, order, mode):
    if order is None:
        order = 3
    if order < 0 or 5 < order:
        raise ValueError("spline order is not supported")
    if mode not in (
        "constant",
        "grid-constant",
        "nearest",
        "mirror",
        "reflect",
        "grid-mirror",
        "wrap",
        "grid-wrap",
        "opencv",
        "_opencv_edge",
    ):
        raise ValueError("boundary mode is not supported")
    return order


def _resolve_out_dtype(output, input):
    if isinstance(output, jnp.ndarray):
        raise NotImplementedError(
            "cupyimg_tpu is functional: preallocated `output` arrays are not "
            "supported; pass a dtype instead"
        )
    return np.dtype(input.dtype if output is None else output)


def _float_work_dtype(dtype, allow_float32):
    dtype = np.dtype(dtype)
    if dtype.kind == "c":
        minf = np.complex64 if allow_float32 else np.complex128
    else:
        minf = np.float32 if allow_float32 else np.float64
    if dtype.kind in "iub":
        return np.dtype(minf)
    return np.promote_types(dtype, minf)


def _coord_dtype(allow_float32):
    """Coordinate precision policy (core/config.py ``coord_precision``).

    The reference computes interpolation coordinates in C double
    regardless of image dtype (its _interp_kernels.py:312-317), which
    decides knife-edge cases (a coordinate landing exactly on a domain
    edge or half-integer) the same way SciPy does.  TPU f64 is emulated
    and slow, so 'auto' = f64 only where it is native and enabled (the
    CPU x64 parity tier); f32 on TPU is a documented deviation.
    """
    if not allow_float32:
        return np.float64
    from cupyimg_tpu.core.config import config

    cp = config.coord_precision
    if cp == "f64":
        return np.float64
    if cp == "f32":
        return np.float32
    if jax.config.jax_enable_x64 and jax.default_backend() == "cpu":
        return np.float64
    return np.float32


def _finalize(out, out_dtype):
    """Cast interpolation output; scipy rounds integer outputs half away
    from zero and SATURATES at the dtype bounds (spline overshoot on a
    uint8 image clamps to 0/255, it does not wrap)."""
    out_dtype = np.dtype(out_dtype)
    if np.dtype(out.dtype).kind == "c" and out_dtype.kind != "c":
        out = out.real
    if out_dtype.kind in "iu":
        out = jnp.where(
            out >= 0, jnp.floor(out + 0.5), jnp.ceil(out - 0.5)
        )
        info = np.iinfo(out_dtype)
        out = jnp.clip(out, float(info.min), float(info.max))
        out = out.astype(np.int64)
    return out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("order", "axis", "mode"))
def _spline1d_jit(x, order, axis, mode):
    y = iir.spline_filter_fir(x, order, (axis,), mode)
    if y is not None:
        return y
    return iir.spline_filter1d(x, order, axis, mode)


@functools.partial(jax.jit, static_argnames=("order", "mode", "axes"))
def _spline_axes_jit(x, order, mode, axes):
    """Spline prefilter along a subset of axes (rotate's per-plane path)."""
    y = iir.spline_filter_fir(x, order, axes, mode)
    if y is not None:
        return y
    for axis in axes:
        x = iir.spline_filter1d(x, order, axis, mode)
    return x


@functools.partial(jax.jit, static_argnames=("order", "mode"))
def _spline_all_axes_jit(x, order, mode):
    # TPU: all axes (and poles) as fused separable symmetric FIRs —
    # one Pallas pass per pole (ops/iir.spline_filter_fir)
    y = iir.spline_filter_fir(x, order, tuple(range(x.ndim)), mode)
    if y is not None:
        return y
    # CPU / fallback: exact sequential IIR scans (per-axis, per-pole);
    # jitted because eager dispatch costs seconds on a relayed backend
    for axis in range(x.ndim):
        x = iir.spline_filter1d(x, order, axis, mode)
    return x


def spline_filter1d(
    input, order=3, axis=-1, output=np.float64, mode="mirror", *,
    allow_float32=True,
):
    """Spline prefilter along one axis (scipy parity;
    reference interpolation.py:105-253)."""
    if order < 0 or order > 5:
        raise RuntimeError("spline order not supported")
    x = jnp.asarray(input)
    out_dtype = _resolve_out_dtype(output, x)
    if order < 2 or x.ndim == 0 or x.shape[util.check_axis(axis, max(x.ndim, 1))] == 1:
        return x.astype(out_dtype)
    work = np.promote_types(out_dtype, _float_work_dtype(x.dtype, allow_float32))
    y = _spline1d_jit(
        x.astype(work), order, util.check_axis(axis, x.ndim), mode
    )
    return y.astype(out_dtype)


def spline_filter(
    input, order=3, output=np.float64, mode="mirror", *, allow_float32=True
):
    """Multidimensional spline prefilter (scipy parity)."""
    if order < 2 or order > 5:
        raise RuntimeError("spline order not supported")
    x = jnp.asarray(input)
    out_dtype = _resolve_out_dtype(output, x)
    work = np.promote_types(out_dtype, _float_work_dtype(x.dtype, allow_float32))
    y = x.astype(work)
    if x.ndim > 0:
        y = _spline_all_axes_jit(y, order, mode)
    return y.astype(out_dtype)


def _prepad_for_spline_filter(x, mode, cval):
    """Pad 12 samples for modes without exact prefilter boundary conditions
    (reference interpolation.py:254-270)."""
    if mode in ("nearest", "grid-constant"):
        npad = 12
        if mode == "grid-constant":
            padded = _boundary.pad(x, [(npad, npad)] * x.ndim, "grid-constant",
                                   cval)
        else:
            padded = _boundary.pad(x, [(npad, npad)] * x.ndim, "nearest")
        return padded, npad
    return x, 0


def _prefiltered(x, order, mode, cval, prefilter, allow_float32):
    """Cast to the working float dtype and prefilter if needed.

    Returns (filtered, npad)."""
    work = _float_work_dtype(x.dtype, allow_float32)
    x = x.astype(work)
    if prefilter and order > 1:
        padded, npad = _prepad_for_spline_filter(x, mode, cval)
        y = _spline_all_axes_jit(padded, order, mode)
        return y, npad
    return x, 0


@functools.partial(jax.jit, static_argnames=("order", "mode"))
def _gather_separable_jit(x, coords_1d, cval, order, mode):
    return interp.gather_separable(x, list(coords_1d), order, mode, cval)


def _trace_state_clean():
    """True outside any jax trace (private API; safe fallback: the
    Tracer checks downstream still route correctly, just less cheaply)."""
    try:
        from jax._src.core import trace_state_clean

        return trace_state_clean()
    except Exception:
        return True


@functools.partial(jax.jit, static_argnames=("ndim",))
def _separable_probe_jit(coordinates, ndim):
    """(all-axes-separable?, per-axis 1-D reference vectors)."""
    checks = []
    refs = []
    for j in range(ndim):
        c = coordinates[j]
        sl = tuple(0 if k != j else slice(None) for k in range(ndim))
        ref = c[sl]
        shape = [1] * ndim
        shape[j] = -1
        checks.append(jnp.all(c == ref.reshape(shape)))
        refs.append(ref)
    return jnp.stack(checks).all(), refs


def _separable_coords(coordinates, ndim):
    """If every coords[j] varies only along output axis j, return the 1-D
    per-axis coordinate vectors (one host sync); else None.

    TPU-gated: XLA's dense n-D gather runs far below the separable
    per-axis engine there, so the one-sync test pays for itself; other
    backends skip it."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return None
    # ndim >= 3 only: 2-D dense coords go to the one-hot path, and the
    # probe's host sync would tax every non-separable 2-D call
    if coordinates.ndim != ndim + 1 or ndim < 3:
        return None
    if coordinates.size < (1 << 18):
        return None
    if isinstance(coordinates, jax.core.Tracer):
        # under jit the host can't inspect the volume: route to the
        # lax.cond dual path (_gather_cond_separable)
        return "traced"
    if not _trace_state_clean():
        # concrete coordinates closed over inside an outer trace: the
        # device probe below would return tracers, but numpy on the
        # concrete array is free at trace time (runs once per compile)
        # and routes statically — no dual-branch compile
        cnp = np.asarray(coordinates)
        refs = []
        for j in range(ndim):
            c = cnp[j]
            sl = tuple(0 if k != j else slice(None) for k in range(ndim))
            ref = c[sl]
            shape = [1] * ndim
            shape[j] = -1
            if not np.array_equal(
                c, np.broadcast_to(ref.reshape(shape), c.shape)
            ):
                return None
            refs.append(jnp.asarray(ref))
        return refs
    # device-side probe, ONE dispatch + a 1-byte scalar sync: the old
    # np.asarray probe shipped the whole coordinate volume down the
    # device tunnel (~25 MB for a 128^3 grid) and an eager per-axis
    # probe is ~7 round trips; jitted it is a single executable whose
    # refs stay on device
    ok, refs = _separable_probe_jit(coordinates, ndim)
    if isinstance(ok, jax.core.Tracer):
        # concrete coordinates closed over inside an outer trace still
        # yield traced probe results: same dual-path routing
        return "traced"
    if not bool(ok):
        return None
    return refs


def _gather_cond_separable(filtered, coords, order, mode, cval):
    """Traced-coordinates dual path: probe separability ON DEVICE and
    lax.cond into the per-axis separable engine or the dense gather.

    Under an outer jit the host can't inspect the coordinate volume, so
    instead of pessimising to the dense n-D gather (XLA dense gather on
    TPU is ~0.7 GB/s — a 750x slowdown for a separable 128^3 order-1
    grid) both branches are compiled and the ~1-elementwise-pass probe
    picks at run time."""
    ndim = filtered.ndim
    checks = []
    refs = []
    for j in range(ndim):
        c = coords[j]
        sl = tuple(0 if k != j else slice(None) for k in range(ndim))
        ref = c[sl]
        shape = [1] * ndim
        shape[j] = -1
        checks.append(jnp.all(c == ref.reshape(shape)))
        refs.append(ref)
    ok = jnp.stack(checks).all()
    return jax.lax.cond(
        ok,
        lambda: interp.gather_separable(filtered, refs, order, mode, cval),
        lambda: interp.gather_general(filtered, coords, order, mode, cval),
    )


def map_coordinates(
    input,
    coordinates,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    *,
    allow_float32=True,
):
    """Map the input to new coordinates by spline interpolation
    (scipy parity; reference interpolation.py:271-396)."""
    order = _check_parameter("map_coordinates", order, mode)
    x = jnp.asarray(input)
    coordinates = jnp.asarray(coordinates)
    if coordinates.shape[0] != x.ndim:
        raise RuntimeError("invalid shape for coordinate array")

    if mode in ("opencv", "_opencv_edge"):
        x = _boundary.pad(x, [(1, 1)] * x.ndim, "constant", cval)
        coordinates = coordinates + 1
        mode = "constant"

    out_dtype = _resolve_out_dtype(output, x)
    coord_work = np.float32 if allow_float32 else np.float64
    if coordinates.dtype.kind in "iu":
        coordinates = coordinates.astype(
            np.promote_types(coordinates.dtype, coord_work)
        )
    elif coordinates.dtype.kind != "f":
        raise ValueError("coordinates should have floating point dtype")
    else:
        coordinates = coordinates.astype(
            np.promote_types(coordinates.dtype, coord_work)
        )

    filtered, npad = _prefiltered(x, order, mode, cval, prefilter,
                                  allow_float32)
    coords = [coordinates[j] + npad for j in range(x.ndim)]
    sep = _separable_coords(coordinates, x.ndim)
    if isinstance(sep, str):
        # traced coordinates: both engines compile, device probe decides
        out = _gather_cond_separable(filtered, coords, order, mode, cval)
        return _finalize(out, out_dtype)
    if sep is not None:
        # coords[j] varies only along output axis j (mgrid-built zoom /
        # shift / per-axis resample grids): run the per-axis separable
        # engine — (order+1)*ndim 1-D takes instead of a dense gather
        out = _gather_separable_jit(
            filtered, tuple(c + npad for c in sep),
            jnp.asarray(cval), order, mode,
        )
        return _finalize(out, out_dtype)
    if (
        x.ndim == 2
        and coordinates.ndim == 3
        and _coord_dtype(allow_float32) == np.float32
    ):
        from cupyimg_tpu.ops import warp_gather

        # Routing-based Pallas gather: sync-free, jit-safe, and ~10x the
        # one-hot path for smooth coordinate fields; falls back to the
        # dense gather inside a lax.cond when per-tile locality fails.
        wout = warp_gather.map_gather_2d(filtered, coords, order, mode,
                                         cval)
        if wout is not None:
            return _finalize(wout, out_dtype)

        from cupyimg_tpu.ops import onehot_interp
        # Locality-adaptive one-hot MXU gather: XLA's dense 2-D gather is
        # ~0.7 GB/s on TPU; smooth coordinate fields (warps, optical flow)
        # instead go through per-block bbox dynamic slices + one-hot
        # contractions.  Returns None for non-local / unsupported cases.
        out = onehot_interp.map_onehot_2d(filtered, coords, order, mode,
                                          cval)
        if out is not None:
            if mode == "constant":
                mask = (
                    (coords[0] < 0) | (coords[0] > filtered.shape[0] - 1)
                    | (coords[1] < 0) | (coords[1] > filtered.shape[1] - 1)
                )
                out = jnp.where(mask, jnp.asarray(cval, dtype=out.dtype),
                                out)
            return _finalize(out, out_dtype)
    out = interp.gather_general(filtered, coords, order, mode, cval)
    return _finalize(out, out_dtype)


def affine_transform(
    input,
    matrix,
    offset=0.0,
    output_shape=None,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    *,
    allow_float32=True,
):
    """Affine transform: output[o] = input[matrix @ o + offset]
    (scipy parity; reference interpolation.py:397-563).

    Diagonal (1-d) matrices dispatch to the separable per-axis engine — the
    analog of the reference's specialized zoom_shift kernel
    (interpolation.py:526-541) but with per-axis factorized gathers.
    """
    order = _check_parameter("affine_transform", order, mode)
    x = jnp.asarray(input)
    matrix = np.asarray(matrix, dtype=np.float64)
    ndim = x.ndim

    if mode == "opencv":
        m = np.zeros((ndim + 1, ndim + 1))
        m[:-1, :-1] = matrix
        m[:-1, -1] = np.asarray(offset, dtype=float).reshape(-1)
        m[-1, -1] = 1.0
        m = np.linalg.inv(m)
        m[:2] = np.roll(m[:2], 1, axis=0)
        m[:2, :2] = np.roll(m[:2, :2], 1, axis=1)
        matrix = m[:-1, :-1]
        offset = m[:-1, -1]
        mode = "constant"

    if output_shape is None:
        output_shape = x.shape
    output_shape = tuple(int(s) for s in output_shape)

    if matrix.ndim not in (1, 2):
        raise RuntimeError("no proper affine matrix provided")
    if matrix.ndim == 2:
        if matrix.shape[0] == ndim + 1 and matrix.shape[1] == ndim + 1:
            offset = matrix[:-1, -1]
            matrix = matrix[:-1, :-1]
        elif matrix.shape[0] == ndim and matrix.shape[1] == ndim + 1:
            offset = matrix[:, -1]
            matrix = matrix[:, :-1]
        if matrix.shape != (ndim, ndim):
            raise RuntimeError("improper affine shape")
    offsets = np.asarray(offset, dtype=np.float64)
    if offsets.ndim == 0:
        offsets = np.full(ndim, float(offsets))

    out_dtype = _resolve_out_dtype(output, x)
    filtered, npad = _prefiltered(x, order, mode, cval, prefilter,
                                  allow_float32)
    coord_dtype = _coord_dtype(allow_float32)

    # diagonal 2-D matrix: same dispatch as the reference's zoom_shift
    # kernel specialization (interpolation.py:526-541) — per-axis
    # separable gathers instead of the dense path
    if (
        matrix.ndim == 2
        and matrix.shape == (ndim, ndim)
        and np.all(matrix == np.diag(np.diagonal(matrix)))
    ):
        matrix = np.diagonal(matrix).copy()

    if matrix.ndim == 1:
        if matrix.shape[0] != ndim:
            raise RuntimeError("improper affine shape")
        coords_1d = [
            (
                jnp.arange(output_shape[j], dtype=coord_dtype) * matrix[j]
                + offsets[j]
                + npad
            )
            for j in range(ndim)
        ]
        out = interp.gather_separable(filtered, coords_1d, order, mode, cval)
        if npad:
            out = _mask_outer_constant_separable(
                out, coords_1d, x.shape, npad, mode, cval
            )
        return _finalize(out, out_dtype)

    # general matrix: try the blocked one-hot MXU sampler first (XLA's
    # per-point gather is pathologically slow on TPU; ops/onehot_interp).
    # The samplers route coordinates in f32; on the f64 parity tier
    # (_coord_dtype) take the exact dense path instead so knife-edge
    # coordinates resolve the same way SciPy's C-double math does.
    from cupyimg_tpu.ops import onehot_interp

    oh = None
    if ndim == 2 and coord_dtype == np.float32:
        from cupyimg_tpu.ops import gtg_interp

        # gather-transpose-gather kernel first (rotation-like affines;
        # ~9x the one-hot MXU sampler's throughput), then the one-hot
        # fallback for transforms its plan gates reject
        oh = gtg_interp.affine_gtg_2d(
            filtered, matrix, offsets + npad, order, mode, cval,
            output_shape,
        )
        if oh is None:
            oh = onehot_interp.affine_onehot_2d(
                filtered, matrix, offsets + npad, order, mode, cval,
                output_shape,
            )
    elif ndim >= 3 and coord_dtype == np.float32:
        oh = _try_batched_plane_onehot(
            filtered, matrix, offsets, npad, order, mode, cval,
            output_shape, onehot_interp,
        )
    if oh is not None:
        if mode == "constant":
            grids_m = jnp.meshgrid(
                *[
                    jnp.arange(sdim, dtype=coord_dtype)
                    for sdim in output_shape
                ],
                indexing="ij",
                sparse=True,
            )
            oob = None
            for j in range(ndim):
                cj = sum(
                    np.asarray(matrix[j, k], coord_dtype) * grids_m[k]
                    for k in range(ndim)
                ) + np.asarray(offsets[j], coord_dtype)
                m = (cj < 0) | (cj > x.shape[j] - 1)
                oob = m if oob is None else oob | m
            oob = jnp.broadcast_to(oob, output_shape)
            oh = jnp.where(oob, jnp.asarray(cval, oh.dtype), oh)
        return _finalize(oh, out_dtype)

    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=coord_dtype) for s in output_shape],
        indexing="ij",
        sparse=True,
    )
    coords = []
    for j in range(ndim):
        # accumulate matrix terms first, offset last — scipy's summation
        # order (matters at exact domain-edge ties, e.g. rotate by 90)
        c = sum(
            np.asarray(matrix[j, k], dtype=coord_dtype) * grids[k]
            for k in range(ndim)
        )
        c = c + jnp.asarray(offsets[j] + npad, dtype=coord_dtype)
        coords.append(jnp.broadcast_to(c, output_shape))
    out = interp.gather_general(filtered, coords, order, mode, cval)
    if npad:
        out = _mask_outer_constant_general(out, coords, x.shape, npad, mode,
                                           cval)
    return _finalize(out, out_dtype)



def _try_batched_plane_onehot(
    filtered, matrix, offsets, npad, order, mode, cval, output_shape,
    onehot_interp,
):
    """nd affine whose matrix couples exactly two axes (identity rows,
    zero offsets elsewhere) — e.g. ``rotate`` on a volume: move the
    coupled plane last, batch the rest, and run the shared-weights
    one-hot MXU sampler.  Exact because tensor-product spline
    evaluation factorizes across independent coordinate axes: for
    order >= 2 the identity axes apply the B-spline reconstruction
    kernel at integer coordinates (e.g. [1/6, 4/6, 1/6] for cubic)
    as a plain 1-D correlation of the coefficient array."""
    ndim = filtered.ndim
    coupled = [
        j
        for j in range(ndim)
        if not (
            np.all(matrix[j] == np.eye(ndim)[j])
            and offsets[j] == 0.0
        )
    ]
    if len(coupled) != 2:
        return None
    p, q = coupled
    # no cross terms into/out of other axes
    for j in (p, q):
        for k in range(ndim):
            if k not in (p, q) and matrix[j, k] != 0:
                return None
    sub = matrix[np.ix_([p, q], [p, q])]
    sub_off = offsets[[p, q]]
    # output extents must match input on the uncoupled (identity) axes
    orig_shape = tuple(
        s - 2 * npad for s in filtered.shape
    )
    for k in range(ndim):
        if k not in (p, q) and output_shape[k] != orig_shape[k]:
            return None

    xs = filtered
    if order > 1:
        # spline reconstruction along identity axes: integer-coordinate
        # evaluation of the tensor-product spline is a fixed small
        # correlation of the prefiltered coefficients.  With prepadding
        # (npad > 0) every tap is in-bounds for the kept interior; with
        # exact-boundary prefilters (npad == 0) fold with the spline's
        # boundary family, as axis_taps would.
        from cupyimg_tpu.scipy.ndimage.filters import correlate1d

        # constant weights (spline kernel at integer coordinates):
        # force eager evaluation so an outer jit doesn't turn them
        # into tracers that float() rejects
        with jax.ensure_compile_time_eval():
            w = [
                float(v[0])
                for v in interp.spline_weights(jnp.zeros((1,)), order)
            ]
        tap_mode = iir.get_spline_mode(mode) if npad == 0 else "nearest"
        for ax in range(ndim):
            if ax in (p, q):
                continue
            xs = correlate1d(
                xs, w, axis=ax, mode=tap_mode, cval=cval,
                origin=-(order % 2),
            )

    # identity axes read at integer coords shifted by npad: slice the
    # prepad off them
    sl = [
        slice(None) if k in (p, q) else slice(npad, npad + orig_shape[k])
        for k in range(ndim)
    ]
    xs = xs[tuple(sl)]

    # lane-batch row-gather fast path (ops/interp.gather_plane_rows):
    # with a wide identity batch each of the (order+1)^2 taps is one
    # contiguous row DMA — no dynamic lane gathers at all — measured
    # ~4x the batched-GTG throughput for rotate() on 256^3 volumes.
    # Handles every order and mode axis_taps does.
    batch_elems = 1
    for k in range(ndim):
        if k not in (p, q):
            batch_elems *= orig_shape[k]
    if batch_elems >= 128:
        arranged = jnp.moveaxis(xs, (p, q), (0, 1))
        n0, n1 = arranged.shape[0], arranged.shape[1]
        batch_dims = arranged.shape[2:]
        xflat = arranged.reshape(n0 * n1, -1)
        cdt = np.float32
        gi = jnp.arange(output_shape[p], dtype=cdt)[:, None]
        gj = jnp.arange(output_shape[q], dtype=cdt)[None, :]
        # scipy's summation order: matrix terms first, offset last
        c0 = (
            np.asarray(sub[0, 0], cdt) * gi
            + np.asarray(sub[0, 1], cdt) * gj
            + np.asarray(sub_off[0] + npad, cdt)
        )
        c1 = (
            np.asarray(sub[1, 0], cdt) * gi
            + np.asarray(sub[1, 1], cdt) * gj
            + np.asarray(sub_off[1] + npad, cdt)
        )
        c0 = jnp.broadcast_to(c0, (output_shape[p], output_shape[q]))
        c1 = jnp.broadcast_to(c1, (output_shape[p], output_shape[q]))
        out2 = interp.gather_plane_rows(
            xflat, [c0, c1], (n0, n1), order, mode, cval
        )
        out = out2.reshape(
            (output_shape[p], output_shape[q]) + batch_dims
        )
        return jnp.moveaxis(out, (0, 1), (p, q))

    if order not in (0, 1, 3):
        return None  # the MXU samplers below gate these orders
    if order > 1 and mode == "wrap":
        return None  # legacy wrap premaps coords; sampler declines it

    moved = jnp.moveaxis(xs, (p, q), (ndim - 2, ndim - 1))
    batch_shape = moved.shape[:-2]
    flat = moved.reshape((-1,) + moved.shape[-2:])

    from cupyimg_tpu.ops import gtg_interp

    out2 = gtg_interp.affine_gtg_batched2d(
        flat, sub, sub_off + npad, order, mode, cval,
        (output_shape[p], output_shape[q]),
    )
    if out2 is None:
        out2 = onehot_interp.affine_onehot_batched2d(
            flat, sub, sub_off + npad, order, mode, cval,
            (output_shape[p], output_shape[q]),
        )
    if out2 is None:
        return None
    out = out2.reshape(batch_shape + out2.shape[1:])
    return jnp.moveaxis(out, (ndim - 2, ndim - 1), (p, q))


def _prefiltered_plane(x, order, mode, cval, prefilter, allow_float32):
    """Like ``_prefiltered`` but pads/filters only the last two axes of a
    (batch, H, W) stack — scipy's per-plane rotate semantics."""
    work = _float_work_dtype(x.dtype, allow_float32)
    x = x.astype(work)
    if prefilter and order > 1:
        npad = 0
        if mode in ("nearest", "grid-constant"):
            npad = 12
            pads = [(0, 0)] * (x.ndim - 2) + [(npad, npad), (npad, npad)]
            if mode == "grid-constant":
                x = _boundary.pad(x, pads, "grid-constant", cval)
            else:
                x = _boundary.pad(x, pads, "nearest")
        y = _spline_axes_jit(x, order, mode, (x.ndim - 2, x.ndim - 1))
        return y, npad
    return x, 0


def _affine_plane_batched(flat, sub, sub_off, npad, order, mode, cval,
                          out_plane, orig_plane, allow_float32=True):
    """Resample every (H, W) plane of ``flat`` (batch, H, W) with the SAME
    2-D affine: shared-routing GTG kernel, then the one-hot MXU sampler,
    then a vmapped general gather.  ``sub_off`` excludes the prepad."""
    from cupyimg_tpu.ops import gtg_interp, onehot_interp

    coord_dtype = _coord_dtype(allow_float32)
    out2 = None
    if coord_dtype == np.float32 and flat.shape[0] >= 128:
        # wide batch: put it on lanes and row-gather each tap
        # (ops/interp.gather_plane_rows) — no dynamic lane gathers
        n0, n1 = flat.shape[1], flat.shape[2]
        xflat = jnp.moveaxis(flat, 0, 2).reshape(n0 * n1, -1)
        ii = jnp.arange(out_plane[0], dtype=coord_dtype)[:, None]
        jj = jnp.arange(out_plane[1], dtype=coord_dtype)[None, :]
        coords2 = [
            jnp.broadcast_to(
                np.asarray(sub[j, 0], coord_dtype) * ii
                + np.asarray(sub[j, 1], coord_dtype) * jj
                + np.asarray(sub_off[j] + npad, coord_dtype),
                out_plane,
            )
            for j in range(2)
        ]
        outp = interp.gather_plane_rows(
            xflat, coords2, (n0, n1), order, mode, cval
        )
        out2 = jnp.moveaxis(outp, 2, 0)  # back to (batch, H, W)
    if out2 is None and coord_dtype == np.float32:
        out2 = gtg_interp.affine_gtg_batched2d(
            flat, sub, sub_off + npad, order, mode, cval, out_plane,
        )
        if out2 is None:
            out2 = onehot_interp.affine_onehot_batched2d(
                flat, sub, sub_off + npad, order, mode, cval, out_plane,
            )
    if out2 is not None:
        if mode == "constant":
            ii = jnp.arange(out_plane[0], dtype=coord_dtype)[:, None]
            jj = jnp.arange(out_plane[1], dtype=coord_dtype)[None, :]
            oob = None
            for j in range(2):
                cj = (
                    np.asarray(sub[j, 0], coord_dtype) * ii
                    + np.asarray(sub[j, 1], coord_dtype) * jj
                    + np.asarray(sub_off[j], coord_dtype)
                )
                m = (cj < 0) | (cj > orig_plane[j] - 1)
                oob = m if oob is None else oob | m
            out2 = jnp.where(oob[None], jnp.asarray(cval, out2.dtype), out2)
        return out2

    ii = jnp.arange(out_plane[0], dtype=coord_dtype)[:, None]
    jj = jnp.arange(out_plane[1], dtype=coord_dtype)[None, :]
    coords2 = [
        jnp.broadcast_to(
            np.asarray(sub[j, 0], coord_dtype) * ii
            + np.asarray(sub[j, 1], coord_dtype) * jj
            + np.asarray(sub_off[j] + npad, coord_dtype),
            out_plane,
        )
        for j in range(2)
    ]
    # mode='constant' implies npad == 0 (prepad only happens for
    # nearest/grid-constant), so gather_general's internal outer mask
    # already tests against the original domain
    return jax.vmap(
        lambda xp: interp.gather_general(xp, coords2, order, mode, cval)
    )(flat)


def _mask_outer_constant_general(out, coords, orig_shape, npad, mode, cval):
    """With prepadding the 'constant' outer-domain test used the padded
    domain inside the gather; re-apply it against the original domain."""
    if mode != "constant":
        return out
    mask = None
    for c, n in zip(coords, orig_shape):
        m = (c - npad < 0) | (c - npad > n - 1)
        mask = m if mask is None else mask | m
    return jnp.where(mask, jnp.asarray(cval, dtype=out.dtype), out)


def _mask_outer_constant_separable(out, coords_1d, orig_shape, npad, mode,
                                   cval):
    if mode != "constant":
        return out
    mask = None
    ndim = len(coords_1d)
    for axis, (c, n) in enumerate(zip(coords_1d, orig_shape)):
        m = (c - npad < 0) | (c - npad > n - 1)
        shape = [1] * ndim
        shape[axis] = m.shape[0]
        m = m.reshape(shape)
        mask = m if mask is None else mask | m
    return jnp.where(mask, jnp.asarray(cval, dtype=out.dtype), out)


def shift(
    input,
    shift,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    *,
    allow_float32=True,
):
    """Shift an array (scipy parity; separable engine)."""
    order = _check_parameter("shift", order, mode)
    x = jnp.asarray(input)
    shifts = util.fix_sequence_arg(shift, x.ndim, "shift", float)
    if mode == "opencv":
        mode = "_opencv_edge"
        return affine_transform(
            x, np.ones(x.ndim), [-s for s in shifts], None, output, order,
            mode, cval, prefilter, allow_float32=allow_float32,
        )
    out_dtype = _resolve_out_dtype(output, x)
    if (
        prefilter
        and order >= 2
        and mode in ("mirror", "reflect", "grid-mirror", "grid-wrap")
        and _float_work_dtype(x.dtype, allow_float32) == np.float32
    ):
        # TPU: spline prefilter composed into the shift-tap FIR — one
        # fused separable pass instead of per-pole prefilter passes plus
        # the tap FIR (ops/interp.shift_spline_fused)
        out = interp.shift_spline_fused(
            x.astype(np.float32), shifts, order, mode, cval
        )
        if out is not None:
            return _finalize(out, out_dtype)
    filtered, npad = _prefiltered(x, order, mode, cval, prefilter,
                                  allow_float32)
    out = interp.shift_fir(filtered, shifts, npad, order, mode, cval,
                           x.shape)
    if out is None:
        coord_dtype = _coord_dtype(allow_float32)
        coords_1d = [
            jnp.arange(x.shape[j], dtype=coord_dtype) - shifts[j] + npad
            for j in range(x.ndim)
        ]
        out = interp.gather_separable(filtered, coords_1d, order, mode, cval)
        if npad:
            out = _mask_outer_constant_separable(out, coords_1d, x.shape,
                                                 npad, mode, cval)
    return _finalize(out, out_dtype)


def zoom(
    input,
    zoom,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    *,
    grid_mode=False,
    allow_float32=True,
):
    """Zoom an array (scipy parity incl. grid_mode; separable engine)."""
    order = _check_parameter("zoom", order, mode)
    x = jnp.asarray(input)
    zooms = util.fix_sequence_arg(zoom, x.ndim, "zoom", float)
    output_shape = tuple(
        int(round(s * z)) for s, z in zip(x.shape, zooms)
    )

    if mode == "opencv":
        z = []
        off = []
        for in_size, out_size in zip(x.shape, output_shape):
            if out_size > 1:
                z.append(float(in_size) / out_size)
                off.append((z[-1] - 1) / 2.0)
            else:
                z.append(0.0)
                off.append(0.0)
        mode = "nearest"
        return affine_transform(
            x, np.asarray(z), off, output_shape, output, order, mode, cval,
            prefilter, allow_float32=allow_float32,
        )

    if grid_mode:
        suggest = {"constant": "grid-constant", "wrap": "grid-wrap"}.get(mode)
        if suggest is not None:
            warnings.warn(
                f"It is recommended to use mode = {suggest} instead of {mode} "
                "when grid_mode is True.", UserWarning,
            )

    factors = []
    for in_size, out_size in zip(x.shape, output_shape):
        if grid_mode:
            # scipy applies in/out unconditionally (a size-1 output axis
            # still samples at the scaled cell center, not at index 0)
            factors.append(in_size / out_size)
        elif out_size > 1:
            factors.append((in_size - 1) / (out_size - 1))
        else:
            factors.append(0.0)

    out_dtype = _resolve_out_dtype(output, x)
    filtered, npad = _prefiltered(x, order, mode, cval, prefilter,
                                  allow_float32)
    coord_dtype = _coord_dtype(allow_float32)
    coords_1d = []
    for j in range(x.ndim):
        o = jnp.arange(output_shape[j], dtype=coord_dtype)
        if grid_mode:
            c = (o + 0.5) * factors[j] - 0.5
        else:
            c = o * factors[j]
        coords_1d.append(c + npad)
    out = interp.gather_separable(filtered, coords_1d, order, mode, cval)
    if npad:
        out = _mask_outer_constant_separable(out, coords_1d, x.shape, npad,
                                             mode, cval)
    return _finalize(out, out_dtype)


def _sincosdg(angle):
    """Degree-exact sin/cos (scipy uses special.sindg/cosdg so that right
    angles produce exact 0/±1 matrix entries)."""
    a = float(angle) % 360.0
    if a % 90.0 == 0.0:
        k = int(a // 90.0) % 4
        return [0.0, 1.0, 0.0, -1.0][k], [1.0, 0.0, -1.0, 0.0][k]
    rad = math.radians(float(angle))
    return math.sin(rad), math.cos(rad)


def rotate(
    input,
    angle,
    axes=(1, 0),
    reshape=True,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    *,
    allow_float32=True,
):
    """Rotate an array in the plane of two axes (scipy parity;
    reference interpolation.py:576-700)."""
    order = _check_parameter("rotate", order, mode)
    if mode == "opencv":
        mode = "_opencv_edge"
    x = jnp.asarray(input)
    axes = list(axes)
    if axes[0] < 0:
        axes[0] += x.ndim
    if axes[1] < 0:
        axes[1] += x.ndim
    if axes[0] > axes[1]:
        axes = [axes[1], axes[0]]
    if axes[0] < 0 or x.ndim <= axes[1] or axes[0] == axes[1]:
        raise ValueError("invalid rotation plane specified")

    ndim = x.ndim
    sin, cos = _sincosdg(angle)
    rot_matrix = np.array([[cos, sin], [-sin, cos]])

    img_shape = np.asarray(x.shape)
    in_plane_shape = img_shape[axes]
    if reshape:
        iy, ix = in_plane_shape
        out_bounds = rot_matrix @ [[0, 0, iy, iy], [0, ix, 0, ix]]
        out_plane_shape = (np.ptp(out_bounds, axis=1) + 0.5).astype(int)
    else:
        out_plane_shape = img_shape[axes]

    out_center = rot_matrix @ ((out_plane_shape - 1) / 2)
    in_center = (in_plane_shape - 1) / 2

    output_shape = img_shape.copy()
    output_shape[axes] = out_plane_shape
    output_shape = tuple(output_shape)

    if ndim > 2 and mode != "_opencv_edge":
        # scipy >= 1.6 applies the 2-D affine to every plane parallel to
        # the rotation axes (a host loop there; one batched kernel here).
        # This differs from embedding the rotation in an ndim identity
        # matrix when prefilter=False and order >= 2: the nd form would
        # also apply the integer-coordinate spline kernel (e.g.
        # [1/6, 2/3, 1/6] for cubic) along the uncoupled axes.  It is
        # also cheaper: the prefilter runs over 2 axes instead of ndim.
        p, q = axes
        moved = jnp.moveaxis(x, (p, q), (ndim - 2, ndim - 1))
        batch_shape = moved.shape[:-2]
        flat = moved.reshape((-1,) + moved.shape[-2:])
        out_dtype = _resolve_out_dtype(output, x)
        filtered, npad = _prefiltered_plane(
            flat, order, mode, cval, prefilter, allow_float32,
        )
        out_plane = tuple(int(v) for v in out_plane_shape)
        sub_off = np.asarray(in_center - out_center, dtype=np.float64)
        out2 = _affine_plane_batched(
            filtered, rot_matrix, sub_off, npad, order, mode, cval,
            out_plane, in_plane_shape, allow_float32=allow_float32,
        )
        out = out2.reshape(batch_shape + out_plane)
        out = jnp.moveaxis(out, (ndim - 2, ndim - 1), (p, q))
        return _finalize(out, out_dtype)

    matrix = np.identity(ndim)
    matrix[axes[0], axes[0]] = cos
    matrix[axes[0], axes[1]] = sin
    matrix[axes[1], axes[0]] = -sin
    matrix[axes[1], axes[1]] = cos

    offset = np.zeros(ndim, dtype=float)
    offset[axes] = in_center - out_center

    return affine_transform(
        x, matrix, offset, output_shape, output, order, mode, cval, prefilter,
        allow_float32=allow_float32,
    )


def geometric_transform(
    input,
    mapping,
    output_shape=None,
    output=None,
    order=3,
    mode="constant",
    cval=0.0,
    prefilter=True,
    extra_arguments=(),
    extra_keywords=None,
    *,
    allow_float32=True,
):
    """Arbitrary coordinate transform via a Python callback (scipy
    parity; beyond the reference's surface).

    ``mapping(output_index, *extra_arguments, **extra_keywords)``
    returns the input coordinate for each output index.  Like scipy,
    the callback runs per output point on the host; the resulting
    coordinate field then feeds the device-side
    :func:`map_coordinates` gather, so the interpolation itself is
    still one fused device computation.
    """
    x = jnp.asarray(input)
    if output_shape is None:
        output_shape = x.shape
    output_shape = tuple(int(s) for s in output_shape)
    if extra_keywords is None:
        extra_keywords = {}
    coords = np.empty((x.ndim,) + output_shape, dtype=np.float64)
    for idx in np.ndindex(*output_shape):
        coords[(slice(None),) + idx] = mapping(
            idx, *extra_arguments, **extra_keywords
        )
    return map_coordinates(
        x, jnp.asarray(coords), output, order, mode, cval, prefilter,
        allow_float32=allow_float32,
    )
