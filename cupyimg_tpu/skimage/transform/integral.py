"""Integral images (skimage.transform parity; reference
cupyimg/skimage/transform/integral.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["integral_image", "integrate"]


def integral_image(image, *, dtype=None):
    """Cumulative-sum integral image over all axes (skimage parity)."""
    import jax

    image = jnp.asarray(image)
    kind = np.dtype(image.dtype).kind
    if dtype is None and kind == "f":
        dtype = jax.dtypes.canonicalize_dtype(np.float64)
    elif dtype is None and kind in "bui":
        # numpy's cumsum accumulates small integers in the platform int;
        # jnp.cumsum keeps the input dtype, which overflows uint8 images
        dtype = jax.dtypes.canonicalize_dtype(
            np.int64 if kind != "u" else np.uint64
        )
        if np.dtype(image.dtype).itemsize >= np.dtype(dtype).itemsize:
            dtype = None
    S = image
    for i in range(image.ndim):
        S = jnp.cumsum(S, axis=i, dtype=dtype)
    return S


def integrate(ii, start, end):
    """Sum over windows using an integral image (skimage parity).

    ``start``/``end`` are coordinate tuples (or lists thereof), inclusive.
    """
    start = np.atleast_2d(np.array(start))
    end = np.atleast_2d(np.array(end))
    rows = start.shape[0]
    total_shape = np.asarray(ii.shape)
    start_negatives = start < 0
    end_negatives = end < 0
    start = (start + total_shape * start_negatives)
    end = (end + total_shape * end_negatives)

    if np.any((end - start) < 0):
        raise IndexError("end coordinates must be greater or equal to start")
    bad = (np.any(end >= total_shape, axis=1) |
           np.any(start < 0, axis=1))
    if np.any(bad):
        raise IndexError("window coordinates are outside the image")

    S = jnp.zeros(rows, dtype=jnp.asarray(ii).dtype)
    ii = jnp.asarray(ii)
    ndim = ii.ndim
    # inclusion-exclusion over the 2^ndim window corners
    import itertools

    for bits in itertools.product((0, 1), repeat=ndim):
        corner = []
        sign = (-1) ** (ndim - sum(bits))
        valid = np.ones(rows, dtype=bool)
        for d, b in enumerate(bits):
            if b:
                corner.append(end[:, d])
            else:
                corner.append(start[:, d] - 1)
                valid &= start[:, d] > 0
        if not valid.any():
            continue
        idx = tuple(jnp.asarray(np.clip(c, 0, ii.shape[d] - 1))
                    for d, c in enumerate(corner))
        vals = ii[idx]
        S = S + sign * jnp.where(jnp.asarray(valid), vals, 0)
    return S
