"""skimage.util.invert (reference cupyimg/skimage/util/_invert.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.util.dtype import dtype_limits

__all__ = ["invert"]


def invert(image, signed_float=False):
    """Invert an image (skimage parity): max+min-x for ints, 1-x / -x for
    floats, logical not for bool."""
    image = jnp.asarray(image)
    kind = np.dtype(image.dtype).kind
    if kind == "b":
        return ~image
    if kind in "iu":
        imin, imax = dtype_limits(image, clip_negative=False)
        return (imax + imin - image.astype(np.int64)).astype(image.dtype) \
            if kind == "i" else imax - image
    if signed_float:
        return -image
    return 1.0 - image
