"""N-d gradient with numpy-parity semantics.

Reference: cupyimg/numpy/lib/function_base.py (itself a port of
numpy.gradient).  ``jnp.gradient`` covers even/uneven spacing but rejects
``edge_order``; this module implements the full numpy contract — second-
order one-sided edge stencils (``edge_order=2``), per-axis scalar/1-d
spacing, axis tuples, and numpy's exact error classes — as pure jnp
slice arithmetic (XLA fuses the three-tap stencils into one pass).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["gradient"]


def _axis_slice(ndim, axis, sl):
    out = [slice(None)] * ndim
    out[axis] = sl
    return tuple(out)


def _gradient_along_axis(f, distances, axis, edge_order, otype):
    """One axis of the gradient: 3-tap interior stencil + edge stencils."""
    ndim = f.ndim
    n = f.shape[axis]
    sl = lambda s: _axis_slice(ndim, axis, s)  # noqa: E731

    uniform = distances is None or jnp.ndim(distances) == 0
    if uniform:
        dx = 1.0 if distances is None else distances
        out_interior = (f[sl(slice(2, None))] - f[sl(slice(None, -2))]) / (
            2.0 * dx
        )
    else:
        d = jnp.asarray(distances).astype(otype)
        shape = [1] * ndim
        shape[axis] = n - 1
        dxs = jnp.diff(d).reshape(shape)
        dx1 = dxs[sl(slice(None, -1))]
        dx2 = dxs[sl(slice(1, None))]
        a = -dx2 / (dx1 * (dx1 + dx2))
        b = (dx2 - dx1) / (dx1 * dx2)
        c = dx1 / (dx2 * (dx1 + dx2))
        out_interior = (
            a * f[sl(slice(None, -2))]
            + b * f[sl(slice(1, -1))]
            + c * f[sl(slice(2, None))]
        )

    if edge_order == 1:
        if uniform:
            first = (f[sl(slice(1, 2))] - f[sl(slice(0, 1))]) / dx
            last = (f[sl(slice(-1, None))] - f[sl(slice(-2, -1))]) / dx
        else:
            first = (f[sl(slice(1, 2))] - f[sl(slice(0, 1))]) / dxs[
                sl(slice(0, 1))
            ]
            last = (f[sl(slice(-1, None))] - f[sl(slice(-2, -1))]) / dxs[
                sl(slice(-1, None))
            ]
    else:
        # second-order one-sided stencils
        if uniform:
            dx1f = dx2f = dx1l = dx2l = dx
        else:
            dx1f = dxs[sl(slice(0, 1))]
            dx2f = dxs[sl(slice(1, 2))]
            dx1l = dxs[sl(slice(-2, -1))]
            dx2l = dxs[sl(slice(-1, None))]
        a = -(2.0 * dx1f + dx2f) / (dx1f * (dx1f + dx2f))
        b = (dx1f + dx2f) / (dx1f * dx2f)
        c = -dx1f / (dx2f * (dx1f + dx2f))
        first = (
            a * f[sl(slice(0, 1))]
            + b * f[sl(slice(1, 2))]
            + c * f[sl(slice(2, 3))]
        )
        a = dx2l / (dx1l * (dx1l + dx2l))
        b = -(dx2l + dx1l) / (dx1l * dx2l)
        c = (2.0 * dx2l + dx1l) / (dx2l * (dx1l + dx2l))
        last = (
            a * f[sl(slice(-3, -2))]
            + b * f[sl(slice(-2, -1))]
            + c * f[sl(slice(-1, None))]
        )

    return jnp.concatenate([first, out_interior, last], axis=axis)


def gradient(f, *varargs, axis=None, edge_order=1):
    """Gradient of an N-dimensional array (numpy.gradient parity).

    Reference: cupyimg/numpy/lib/function_base.py (numpy.gradient port).
    """
    f = jnp.asarray(f)
    ndim = f.ndim

    if axis is None:
        axes = tuple(range(ndim))
    else:
        if np.ndim(axis) == 0:
            axis = (axis,)
        axes = []
        for ax in axis:
            ax = int(ax)
            if not -ndim <= ax < ndim:
                raise np.exceptions.AxisError(ax, ndim)
            axes.append(ax % ndim)
        if len(set(axes)) != len(axes):
            raise ValueError("repeated axis")
        axes = tuple(axes)
    len_axes = len(axes)

    n = len(varargs)
    if n == 0:
        dx = [None] * len_axes
    elif n == 1 and np.ndim(varargs[0]) == 0:
        dx = list(varargs) * len_axes
    elif n == len_axes:
        dx = []
        for d in varargs:
            d_nd = np.ndim(d)
            if d_nd == 0:
                dx.append(d)
                continue
            if d_nd != 1:
                raise ValueError("distances must be either scalars or 1d")
            dx.append(jnp.asarray(d))
    else:
        raise TypeError("invalid number of arguments")

    if edge_order > 2:
        raise ValueError("'edge_order' greater than 2 not supported")

    # output dtype follows diff: inexact kept, integers promoted to float
    if jnp.issubdtype(f.dtype, jnp.inexact):
        otype = f.dtype
    else:
        otype = jnp.result_type(float)
        f = f.astype(otype)

    outvals = []
    for i, ax in enumerate(axes):
        if f.shape[ax] < edge_order + 1:
            raise ValueError(
                "Shape of array too small to calculate a numerical "
                "gradient, at least (edge_order + 1) elements are "
                "required."
            )
        d = dx[i]
        if d is not None and jnp.ndim(d) == 1 and d.shape[0] != f.shape[ax]:
            raise ValueError(
                "when 1d, distances must match the length of the "
                "corresponding dimension"
            )
        outvals.append(_gradient_along_axis(f, d, ax, edge_order, otype))

    if axis is None and len_axes == 1:
        return outvals[0]
    if len_axes == 1:
        return outvals[0]
    return outvals
