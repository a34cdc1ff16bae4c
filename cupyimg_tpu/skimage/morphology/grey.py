"""Grayscale morphological operations (reference
cupyimg/skimage/morphology/grey.py)."""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from ..util import crop
from .misc import default_selem

__all__ = [
    "erosion",
    "dilation",
    "opening",
    "closing",
    "white_tophat",
    "black_tophat",
]


def _check_out(out):
    if out is not None:
        raise NotImplementedError(
            "cupyimg_tpu is functional: `out` is not supported"
        )


def _shift_selem(selem, shift_x, shift_y):
    """Pad even-sided 2-D selems by one zero row/column so the centre pixel
    lands where skimage expects it (reference grey.py:21-56)."""
    if selem.ndim != 2:
        return selem
    selem = np.asarray(selem)
    m, n = selem.shape
    if m % 2 == 0:
        extra_row = np.zeros((1, n), selem.dtype)
        if shift_x:
            selem = np.vstack((selem, extra_row))
        else:
            selem = np.vstack((extra_row, selem))
        m += 1
    if n % 2 == 0:
        extra_col = np.zeros((m, 1), selem.dtype)
        if shift_y:
            selem = np.hstack((selem, extra_col))
        else:
            selem = np.hstack((extra_col, selem))
    return selem


def _invert_selem(selem):
    """Reverse the selem to cancel scipy's footprint mirroring in
    grey_dilation (reference grey.py:59-89)."""
    return selem[(slice(None, None, -1),) * selem.ndim]


def pad_for_eccentric_selems(func):
    """Edge-pad the image for opening/closing with even-sided selems so the
    intermediate result is not clipped (reference grey.py:92-137)."""

    @functools.wraps(func)
    def func_out(image, selem, out=None, *args, **kwargs):
        _check_out(out)
        image = jnp.asarray(image)
        pad_widths = []
        padding = False
        for axis_len in np.shape(selem):
            if axis_len % 2 == 0:
                axis_pad_width = axis_len - 1
                padding = True
            else:
                axis_pad_width = 0
            pad_widths.append((axis_pad_width,) * 2)
        if padding:
            image = jnp.pad(image, pad_widths, mode="edge")
        result = func(image, selem, out=None, *args, **kwargs)
        if padding:
            result = crop(result, pad_widths)
        return result

    return func_out


@default_selem
def erosion(image, selem=None, out=None, shift_x=False, shift_y=False):
    """Greyscale erosion: min over the selem neighborhood
    (reference grey.py:140-196)."""
    _check_out(out)
    selem = np.asarray(selem)
    selem = _shift_selem(selem, shift_x, shift_y)
    return ndi.grey_erosion(image, footprint=selem)


@default_selem
def dilation(image, selem=None, out=None, shift_x=False, shift_y=False):
    """Greyscale dilation: max over the selem neighborhood.

    Pre-inverts the selem to cancel scipy's internal footprint mirroring
    (reference grey.py:199-263)."""
    _check_out(out)
    selem = np.asarray(selem)
    selem = _shift_selem(selem, shift_x, shift_y)
    selem = _invert_selem(selem)
    return ndi.grey_dilation(image, footprint=selem)


def _odd_flat_rect(image, selem):
    """True when the selem is an all-ones, all-odd-sided rectangle on a
    float image: the shift/mirror conventions for eccentric selems are
    the identity there, so opening/closing can delegate to the fused
    one-pass ndi path."""
    selem = np.asarray(selem)
    return (
        np.dtype(jnp.asarray(image).dtype).kind == "f"
        and selem.ndim == jnp.ndim(image)
        and all(s % 2 == 1 for s in selem.shape)
        and bool((selem != 0).all())
    )


@default_selem
@pad_for_eccentric_selems
def opening(image, selem=None, out=None):
    """Greyscale opening: erosion then dilation (reference grey.py:266-313)."""
    if _odd_flat_rect(image, selem):
        return ndi.grey_opening(image, footprint=np.asarray(selem) != 0)
    eroded = erosion(image, selem)
    return dilation(eroded, selem, shift_x=True, shift_y=True)


@default_selem
@pad_for_eccentric_selems
def closing(image, selem=None, out=None):
    """Greyscale closing: dilation then erosion (reference grey.py:316-365)."""
    if _odd_flat_rect(image, selem):
        return ndi.grey_closing(image, footprint=np.asarray(selem) != 0)
    dilated = dilation(image, selem)
    return erosion(dilated, selem, shift_x=True, shift_y=True)


@default_selem
def white_tophat(image, selem=None, out=None):
    """White top hat: image minus its opening.

    Delegates to ``ndi.white_tophat`` like the reference (grey.py:368-434);
    bool images are computed via uint8 to match the reference's view-based
    work-around."""
    _check_out(out)
    image = jnp.asarray(image)
    selem = np.asarray(selem)
    if image.dtype == bool:
        result = ndi.white_tophat(image.astype(np.uint8), footprint=selem)
        return result.astype(bool)
    return ndi.white_tophat(image, footprint=selem)


@default_selem
def black_tophat(image, selem=None, out=None):
    """Black top hat: closing minus the image (reference grey.py:437-499)."""
    _check_out(out)
    image = jnp.asarray(image)
    closed = closing(image, selem)
    if image.dtype == bool:
        return closed ^ image
    return closed - image
