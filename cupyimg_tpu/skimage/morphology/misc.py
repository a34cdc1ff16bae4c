"""Miscellaneous morphology functions (reference
cupyimg/skimage/morphology/misc.py)."""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage._shared.utils import warn
from .selem import _default_selem

__all__ = ["remove_small_objects", "remove_small_holes", "default_selem"]


def default_selem(func):
    """Decorator adding a connectivity-1 default structuring element
    (reference misc.py:26-49)."""

    @functools.wraps(func)
    def func_out(image, selem=None, *args, **kwargs):
        if selem is None:
            selem = _default_selem(jnp.ndim(image))
        return func(image, selem=selem, *args, **kwargs)

    return func_out


def _check_dtype_supported(ar):
    if not (
        ar.dtype == bool or np.issubdtype(np.dtype(ar.dtype), np.integer)
    ):
        raise TypeError(
            "Only bool or integer image types are supported. "
            "Got %s." % ar.dtype
        )


def remove_small_objects(ar, min_size=64, connectivity=1, in_place=False):
    """Remove connected components smaller than ``min_size``
    (reference misc.py:61-155: label → bincount → mask)."""
    ar = jnp.asarray(ar)
    _check_dtype_supported(ar)
    if in_place:
        raise NotImplementedError(
            "cupyimg_tpu is functional: in_place is not supported"
        )
    if min_size == 0:  # shortcut for efficiency
        return ar

    if ar.dtype == bool:
        selem = ndi.generate_binary_structure(ar.ndim, connectivity)
        ccs, _ = ndi.label(ar, selem)
    else:
        ccs = ar

    if bool(jnp.any(ccs < 0)):
        raise ValueError(
            "Negative value labels are not supported. Try "
            "relabeling the input with `scipy.ndimage.label` or "
            "`skimage.morphology.label`."
        )
    nlab = int(jnp.max(ccs)) + 1
    component_sizes = jnp.bincount(ccs.ravel(), length=nlab)

    if nlab == 2 and ar.dtype != bool:
        warn(
            "Only one label was provided to `remove_small_objects`. "
            "Did you mean to use a boolean array?"
        )

    too_small = component_sizes < min_size
    too_small_mask = too_small[ccs]
    zero = jnp.zeros((), dtype=ar.dtype)
    return jnp.where(too_small_mask, zero, ar)


def remove_small_holes(ar, area_threshold=64, connectivity=1, in_place=False):
    """Fill contiguous holes smaller than ``area_threshold``
    (reference misc.py:158-245: invert → remove_small_objects → invert)."""
    ar = jnp.asarray(ar)
    _check_dtype_supported(ar)
    if in_place:
        raise NotImplementedError(
            "cupyimg_tpu is functional: in_place is not supported"
        )
    if ar.dtype != bool:
        warn(
            "Any labeled images will be returned as a boolean array. "
            "Did you mean to use a boolean array?",
            UserWarning,
        )

    out = jnp.logical_not(ar)
    out = remove_small_objects(out, area_threshold, connectivity)
    return jnp.logical_not(out)
