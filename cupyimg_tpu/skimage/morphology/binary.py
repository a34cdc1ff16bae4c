"""Binary morphological operations (reference
cupyimg/skimage/morphology/binary.py)."""

from __future__ import annotations

import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from .misc import default_selem

__all__ = [
    "binary_erosion",
    "binary_dilation",
    "binary_opening",
    "binary_closing",
]


def _check_out(out):
    if out is not None:
        raise NotImplementedError(
            "cupyimg_tpu is functional: `out` is not supported"
        )


@default_selem
def binary_erosion(image, selem=None, out=None):
    """Fast binary morphological erosion (reference binary.py:12-43:
    ndi.binary_erosion with border_value=True)."""
    _check_out(out)
    return ndi.binary_erosion(image, structure=selem, border_value=True)


@default_selem
def binary_dilation(image, selem=None, out=None):
    """Fast binary morphological dilation (reference binary.py:46-79)."""
    _check_out(out)
    return ndi.binary_dilation(image, structure=selem)


@default_selem
def binary_opening(image, selem=None, out=None):
    """Binary opening: erosion then dilation (reference binary.py:82-111)."""
    _check_out(out)
    eroded = binary_erosion(image, selem)
    return binary_dilation(eroded, selem)


@default_selem
def binary_closing(image, selem=None, out=None):
    """Binary closing: dilation then erosion (reference binary.py:114-146)."""
    _check_out(out)
    dilated = binary_dilation(image, selem)
    return binary_erosion(dilated, selem)
