"""find_boundaries / mark_boundaries (reference
cupyimg/skimage/segmentation/boundaries.py).

``mode='subpixel'`` is redesigned: the reference runs a *host* Python loop
with a ``cp.unique`` per interstitial pixel (boundaries.py:9-47); here the
same criterion — at least two distinct non-sentinel values in the 3^ndim
neighborhood — is computed with two fused min/max window reductions over
the whole expanded grid at once.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from ..morphology import dilation, erosion, square
from ..util import img_as_float
from ..color import gray2rgb

__all__ = ["find_boundaries", "mark_boundaries"]


def _find_boundaries_subpixel(label_img):
    """Vectorized subpixel boundaries (see module docstring).

    An interstitial pixel is a boundary iff its 3^ndim window on the
    expanded grid contains >= 2 distinct values besides the interstitial
    sentinel — exactly the reference's ``len(unique) > 2`` test, since
    the window always contains the sentinel itself (and zero-padding
    counts as value 0, as in the reference).
    """
    ndim = label_img.ndim
    big = jnp.asarray(label_img, dtype=np.int32)
    sentinel = int(big.max()) + 1

    expanded_shape = tuple(2 * s - 1 for s in label_img.shape)
    expanded = jnp.full(expanded_shape, sentinel, dtype=np.int32)
    pixels = (slice(None, None, 2),) * ndim
    expanded = expanded.at[pixels].set(big)

    edges = jnp.ones(expanded_shape, dtype=bool)
    edges = edges.at[pixels].set(False)

    # window min: sentinel is the largest value, zero-pad contributes 0
    vmin = ndi.minimum_filter(
        expanded, size=3, mode="constant", cval=0
    )
    # window max over non-sentinel values: sentinel -> -1, pad -> 0... the
    # reference pads with 0 which also counts as a value, so use cval=0
    non_sent = jnp.where(expanded == sentinel, -1, expanded)
    vmax = ndi.maximum_filter(
        non_sent, size=3, mode="constant", cval=0
    )
    return edges & (vmin != vmax)


def find_boundaries(label_img, connectivity=1, mode="thick",
                    background=0):
    """Bool array marking boundaries between labeled regions (skimage
    parity; reference boundaries.py:50-183)."""
    label_img = jnp.asarray(label_img)
    if label_img.dtype == bool:
        label_img = label_img.astype(np.uint8)
    ndim = label_img.ndim
    selem = ndi.generate_binary_structure(ndim, connectivity)
    if mode != "subpixel":
        boundaries = dilation(label_img, selem) != erosion(
            label_img, selem
        )
        if mode == "inner":
            foreground_image = label_img != background
            boundaries = boundaries & foreground_image
        elif mode == "outer":
            max_label = np.iinfo(np.dtype(label_img.dtype)).max
            background_image = label_img == background
            selem = ndi.generate_binary_structure(ndim, ndim)
            inverted_background = jnp.where(
                background_image, max_label, label_img
            ).astype(label_img.dtype)
            adjacent_objects = (
                dilation(label_img, selem)
                != erosion(inverted_background, selem)
            ) & ~background_image
            boundaries = boundaries & (
                background_image | adjacent_objects
            )
        return boundaries
    else:
        return _find_boundaries_subpixel(label_img)


def mark_boundaries(
    image,
    label_img,
    color=(1, 1, 0),
    outline_color=None,
    mode="outer",
    background_label=0,
    *,
    order=3,
):
    """Overlay label-region boundaries on an image (skimage parity;
    reference boundaries.py:186-253)."""
    marked = img_as_float(image, force_copy=True)
    if marked.ndim == 2:
        marked = gray2rgb(marked)
    if mode == "subpixel":
        marked = ndi.zoom(
            marked,
            [2 - 1 / s for s in marked.shape[:-1]] + [1],
            mode="reflect",
            order=order,
        )
    boundaries = find_boundaries(
        label_img, mode=mode, background=background_label
    )
    color = jnp.asarray(color, dtype=marked.dtype)
    if outline_color is not None:
        outlines = dilation(boundaries, np.asarray(square(3)))
        marked = jnp.where(
            jnp.asarray(outlines, bool)[..., None],
            jnp.asarray(outline_color, dtype=marked.dtype),
            marked,
        )
    marked = jnp.where(
        jnp.asarray(boundaries, bool)[..., None], color, marked
    )
    return marked
