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
        # max+min-x is -1-x (= ~x) for signed and max-x (= ~x) for
        # unsigned, so integer inversion is exactly bitwise NOT — and
        # stays in-dtype even for uint64, whose max overflows int64
        return ~image
    if signed_float:
        return -image
    return 1.0 - image
