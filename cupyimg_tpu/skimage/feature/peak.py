"""peak_local_max (skimage.feature parity; reference
cupyimg/skimage/feature/peak.py): maximum-filter mask on device, host
compaction of the variable-length coordinate list at the API boundary."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi

__all__ = ["peak_local_max"]


def _get_excluded_border_width(image, min_distance, exclude_border):
    if isinstance(exclude_border, bool):
        return (min_distance if exclude_border else 0,) * image.ndim
    if isinstance(exclude_border, int):
        if exclude_border < 0:
            raise ValueError("`exclude_border` cannot be a negative value")
        return (exclude_border,) * image.ndim
    if isinstance(exclude_border, tuple):
        if len(exclude_border) != image.ndim:
            raise ValueError(
                "`exclude_border` should have the same length as the "
                "dimensionality of the image."
            )
        for ex in exclude_border:
            if not isinstance(ex, int) or ex < 0:
                raise ValueError(
                    "`exclude_border`, when expressed as a tuple, must only "
                    "contain ints."
                )
        return exclude_border
    raise TypeError(
        "`exclude_border` must be bool, int, or tuple with the same "
        "length as the dimensionality of the image."
    )


def _exclude_border(mask, border_width):
    for i, width in enumerate(border_width):
        if width == 0:
            continue
        mask = mask.at[(slice(None),) * i + (slice(None, width),)].set(False)
        mask = mask.at[(slice(None),) * i + (slice(-width, None),)].set(False)
    return mask


def peak_local_max(
    image,
    min_distance=1,
    threshold_abs=None,
    threshold_rel=None,
    exclude_border=True,
    indices=True,
    num_peaks=np.inf,
    footprint=None,
    labels=None,
    num_peaks_per_label=np.inf,
    p_norm=np.inf,
):
    """Coordinates of local maxima (skimage parity)."""
    image = jnp.asarray(image)
    out = jnp.zeros_like(image, dtype=bool)

    threshold_abs = (
        float(image.min()) if threshold_abs is None else threshold_abs
    )
    if isinstance(exclude_border, bool):
        border_width = _get_excluded_border_width(
            image, min_distance, exclude_border
        )
    else:
        border_width = _get_excluded_border_width(
            image, min_distance, exclude_border
        )

    if footprint is None:
        size = 2 * min_distance + 1
        max_img = ndi.maximum_filter(image, size=size, mode="constant")
    else:
        footprint = np.asarray(footprint, dtype=bool)
        max_img = ndi.maximum_filter(
            image, footprint=footprint, mode="constant"
        )
    mask = image == max_img
    thresholds = [threshold_abs]
    if threshold_rel is not None:
        thresholds.append(threshold_rel * float(image.max()))
    for t in thresholds:
        mask = mask & (image > t)
    mask = _exclude_border(mask, border_width)

    if labels is not None:
        labels = jnp.asarray(labels)
        mask = mask & (labels > 0)
        # per-label peak limiting
        if np.isfinite(num_peaks_per_label):
            mask_np = np.asarray(mask)
            labels_np = np.asarray(labels)
            img_np = np.asarray(image)
            keep = np.zeros_like(mask_np)
            for lab in np.unique(labels_np[mask_np]):
                coords_l = np.argwhere(mask_np & (labels_np == lab))
                vals = img_np[tuple(coords_l.T)]
                order = np.argsort(-vals)[: int(num_peaks_per_label)]
                keep[tuple(coords_l[order].T)] = True
            mask = jnp.asarray(keep)

    # host compaction: sort peaks by intensity descending
    mask_np = np.asarray(mask)
    coords = np.argwhere(mask_np)
    if coords.shape[0] > 0:
        vals = np.asarray(image)[tuple(coords.T)]
        order = np.argsort(-vals, kind="stable")
        coords = coords[order]
    if np.isfinite(num_peaks) and coords.shape[0] > num_peaks:
        coords = coords[: int(num_peaks)]
    if indices:
        return jnp.asarray(coords)
    peaks = np.zeros(image.shape, dtype=bool)
    if coords.shape[0]:
        peaks[tuple(coords.T)] = True
    return jnp.asarray(peaks)
