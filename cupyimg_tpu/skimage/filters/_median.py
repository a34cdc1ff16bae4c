"""Median filter (skimage.filters parity, ndimage mode; reference
cupyimg/skimage/filters/_median.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage._shared.utils import warn

__all__ = ["median"]


def median(
    image, selem=None, out=None, mode="nearest", cval=0.0, behavior="ndimage",
):
    """Local median (skimage parity; 'ndimage' behavior only — the 'rank'
    backend is a CPU-specific code path in upstream skimage)."""
    if behavior != "ndimage":
        warn(
            "behavior='rank' is not implemented; using 'ndimage'.",
            UserWarning,
        )
    image = jnp.asarray(image)
    if selem is None:
        selem = np.ones((3,) * image.ndim, dtype=bool)
    if out is not None:
        raise NotImplementedError(
            "preallocated output arrays are not supported"
        )
    return ndi.median_filter(
        image, footprint=np.asarray(selem) != 0, mode=mode, cval=cval
    )
