"""skimage.measure.label (reference cupyimg/skimage/measure/_label.py).

Wraps the atomics-free ndimage label (greyscale mode: equal-valued
neighbors connect) — SURVEY.md N6.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as cpu_ndi

from cupyimg_tpu.scipy import ndimage as ndi

__all__ = ["label"]


def _get_structure(ndim, connectivity):
    if connectivity is None:
        connectivity = ndim
    if not 1 <= connectivity <= ndim:
        raise ValueError(
            "Connectivity below 1 or above %d is illegal." % ndim
        )
    return cpu_ndi.generate_binary_structure(ndim, connectivity)


def label(input, background=None, return_num=False, connectivity=None):
    """Label connected regions of an integer array (skimage parity;
    reference _label.py:18-126).

    Two pixels are connected when they are neighbors and have the same
    value.  ``background`` pixels get label 0.
    """
    input = jnp.asarray(input)
    ndim = input.ndim
    structure = _get_structure(ndim, connectivity)
    if background is not None and background != 0:
        # offset so that background becomes 0 as expected by ndi.label
        input = input - background

    if np.dtype(input.dtype).kind not in "bui":
        # skimage copies the input into an intp array for non-integer
        # dtypes; do the same
        input = input.astype(jnp.int64 if jnp.asarray(0).dtype == jnp.int64
                             else jnp.int32)

    labels, num = ndi.label(input, structure, greyscale_mode=True)

    if return_num:
        return labels, int(num)
    return labels
