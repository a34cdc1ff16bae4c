"""join_segmentations / relabel_sequential (reference
cupyimg/skimage/segmentation/_join.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..util._map_array import map_array, ArrayMap

__all__ = ["join_segmentations", "relabel_sequential", "clear_border"]


def join_segmentations(s1, s2):
    """Join of two segmentations: same segment iff same segment in both
    (reference _join.py:5-46)."""
    s1 = jnp.asarray(s1)
    s2 = jnp.asarray(s2)
    if s1.shape != s2.shape:
        raise ValueError(
            "Cannot join segmentations of different shape. "
            + "s1.shape: %s, s2.shape: %s" % (s1.shape, s2.shape)
        )
    s1 = relabel_sequential(s1)[0]
    s2 = relabel_sequential(s2)[0]
    j = (s2.max() + 1) * s1 + s2
    j = relabel_sequential(j)[0]
    return j


def relabel_sequential(label_field, offset=1):
    """Relabel arbitrary non-negative labels to
    {offset, ..., offset + number_of_labels - 1} (reference
    _join.py:49-174).

    Returns ``(relabeled, forward_map, inverse_map)`` with the maps as
    :class:`~cupyimg_tpu.skimage.util.ArrayMap` objects.
    """
    label_field = jnp.asarray(label_field)
    if offset <= 0:
        raise ValueError("Offset must be strictly positive.")
    if int(label_field.min()) < 0:
        raise ValueError(
            "Cannot relabel array that contains negative values."
        )
    offset = int(offset)
    in_vals = jnp.unique(label_field)
    if in_vals.shape[0] > np.iinfo(np.int32).max:
        raise ValueError(
            "Too many unique values in label_field (current "
            "implementation uses 32-bit indexing)."
        )

    out_val_dtype = np.min_scalar_type(offset + in_vals.shape[0])
    if int(in_vals[0]) == 0:
        # always map 0 to 0
        out_vals = jnp.concatenate(
            [
                jnp.asarray([0], dtype=out_val_dtype),
                jnp.arange(
                    offset,
                    offset + in_vals.shape[0] - 1,
                    dtype=out_val_dtype,
                ),
            ]
        )
    else:
        out_vals = jnp.arange(
            offset, offset + in_vals.shape[0], dtype=out_val_dtype
        )
    input_type = np.dtype(label_field.dtype)
    if input_type.kind not in "iu":
        raise TypeError("label_field must have an integer dtype")

    # output type: never smaller than the input type, but widen when the
    # new maximum would overflow it (reference _join.py:148-167)
    out_max = int(out_vals[-1])
    required_type = np.min_scalar_type(out_max)
    if input_type.itemsize < required_type.itemsize:
        output_type = required_type
    else:
        if out_max <= np.iinfo(input_type).max:
            output_type = input_type
        else:
            output_type = required_type
    out_vals = out_vals.astype(output_type)
    out_array = map_array(label_field, in_vals, out_vals)
    fw_map = ArrayMap(in_vals, out_vals)
    inv_map = ArrayMap(out_vals, in_vals)
    return out_array, fw_map, inv_map


def clear_border(labels, buffer_size=0, bgval=0, mask=None):
    """Clear objects connected to the label image border.

    The reference lists this in its API but does not implement it; here
    border-touching components are found with the atomics-free label +
    a unique over the border shell, then removed with ``map_array``-style
    selects.

    Parameters
    ----------
    labels : (M[, N[, ..., P]]) array of int or bool
        Imaging data labels.
    buffer_size : int, optional
        The width of the border examined; objects reaching into the
        border are removed.
    bgval : float or int, optional
        Cleared objects are set to this value.
    mask : ndarray of bool, same shape as `labels`, optional
        Objects touching the False region of the mask are removed.

    Returns
    -------
    out : (M[, N[, ..., P]]) array
        Cleared version of the input.
    """
    from cupyimg_tpu.scipy import ndimage as ndi

    labels = jnp.asarray(labels)
    if any(buffer_size >= s for s in labels.shape) and mask is None:
        # ignore buffer_size if mask
        raise ValueError("buffer size may not be greater than labels size")

    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.shape != labels.shape:
            raise ValueError(
                "labels and mask should have the same shape but "
                "are {} and {}".format(labels.shape, mask.shape)
            )
        if np.dtype(mask.dtype) != bool:
            raise TypeError("mask should be of type bool.")
        borders = ~mask
    else:
        borders = np.zeros(labels.shape, dtype=bool)
        ext = buffer_size + 1
        for ax in range(labels.ndim):
            sl = [slice(None)] * labels.ndim
            sl[ax] = slice(0, ext)
            borders[tuple(sl)] = True
            sl[ax] = slice(labels.shape[ax] - ext, labels.shape[ax])
            borders[tuple(sl)] = True
        borders = jnp.asarray(borders)

    # reuse or create the connected-components labeling
    if np.dtype(labels.dtype).kind == "b" or bool(
        jnp.all((labels == 0) | (labels == 1))
    ):
        ccs, _ = ndi.label(labels)
    else:
        ccs = labels.astype(np.int32)

    nlab = int(jnp.max(ccs)) + 1
    touch = jnp.zeros((nlab,), bool).at[
        jnp.where(borders, ccs, 0).ravel()
    ].set(True)
    touch = touch.at[0].set(False)
    cleared = jnp.where(touch[ccs], jnp.asarray(bgval, labels.dtype),
                        labels)
    return cleared
