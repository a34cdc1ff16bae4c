"""view_as_blocks / view_as_windows (skimage.util.shape parity).

JAX arrays have no strided views, so these return materialized arrays:
blocks via reshape/transpose (zero-copy under XLA), windows via a gather.
(reference cupyimg/skimage/util/shape.py uses as_strided, SURVEY.md S13)
"""

from __future__ import annotations

import numbers

import numpy as np
import jax.numpy as jnp

__all__ = ["view_as_blocks", "view_as_windows"]


def view_as_blocks(arr_in, block_shape):
    """Non-overlapping block view (skimage parity)."""
    if not isinstance(block_shape, tuple):
        raise TypeError("block needs to be a tuple")
    block_shape = np.array(block_shape)
    if (block_shape <= 0).any():
        raise ValueError("'block_shape' elements must be strictly positive")
    arr_in = jnp.asarray(arr_in)
    if block_shape.size != arr_in.ndim:
        raise ValueError(
            "'block_shape' must have the same length as 'arr_in.shape'"
        )
    arr_shape = np.array(arr_in.shape)
    if (arr_shape % block_shape).sum() != 0:
        raise ValueError("'block_shape' is not compatible with 'arr_in'")
    n_blocks = arr_shape // block_shape
    # reshape to interleaved (n0, b0, n1, b1, ...) then move block axes last
    interleaved = []
    for n, b in zip(n_blocks, block_shape):
        interleaved += [int(n), int(b)]
    out = arr_in.reshape(interleaved)
    order = list(range(0, 2 * arr_in.ndim, 2)) + list(
        range(1, 2 * arr_in.ndim, 2)
    )
    return out.transpose(order)


def view_as_windows(arr_in, window_shape, step=1):
    """Overlapping rolling-window view (skimage parity; materialized)."""
    if not isinstance(arr_in, (np.ndarray, jnp.ndarray)):
        # upstream contract: lists/tuples raise, no silent conversion
        raise TypeError("`arr_in` must be a numpy or jax ndarray")
    arr_in = jnp.asarray(arr_in)
    ndim = arr_in.ndim
    if isinstance(window_shape, numbers.Number):
        window_shape = (window_shape,) * ndim
    if not (len(window_shape) == ndim):
        raise ValueError("`window_shape` is incompatible with `arr_in.shape`")
    if isinstance(step, numbers.Number):
        if step < 1:
            raise ValueError("`step` must be >= 1")
        step = (step,) * ndim
    if len(step) != ndim:
        raise ValueError("`step` is incompatible with `arr_in.shape`")
    arr_shape = np.array(arr_in.shape)
    window_shape = np.array(window_shape, dtype=arr_shape.dtype)
    if ((arr_shape - window_shape) < 0).any():
        raise ValueError("`window_shape` is too large")
    if ((window_shape - 1) < 0).any():
        raise ValueError("`window_shape` is too small")
    win_indices_shape = (arr_shape - window_shape) // np.array(step) + 1
    # gather: out[i..., k...] = arr[i*step + k]
    idx = [
        (np.arange(int(win_indices_shape[d])) * step[d])[:, None]
        + np.arange(int(window_shape[d]))[None, :]
        for d in range(ndim)
    ]
    out = arr_in
    # sequential take along each axis, building (out_d, win_d) pairs
    for d in range(ndim):
        ax = 2 * d  # current position of original axis d
        out = jnp.take(out, jnp.asarray(idx[d]), axis=ax)
    # now shape is (o0, w0, o1, w1, ...) -> (o..., w...)
    order = list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
    return out.transpose(order)
