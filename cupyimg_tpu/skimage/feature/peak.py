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
    import warnings

    image = jnp.asarray(image)
    if indices is False:
        # reference peak.py:120 (@remove_arg): removed in skimage 0.20
        warnings.warn(
            "indices argument is deprecated and will be removed in "
            "version 0.20. To avoid this warning, please do not use the "
            "indices argument. Please see peak_local_max documentation "
            "for more details.",
            FutureWarning,
            stacklevel=2,
        )
    if (
        footprint is None or np.asarray(footprint).size == 1
    ) and min_distance < 1:
        # reference peak.py:253-259
        warnings.warn(
            "When min_distance < 1, peak_local_max acts as finding "
            "image > max(threshold_abs, threshold_rel * max(image)).",
            RuntimeWarning,
            stacklevel=2,
        )
    border_width = _get_excluded_border_width(
        image, min_distance, exclude_border
    )
    threshold = float(image.min()) if threshold_abs is None else threshold_abs
    if threshold_rel is not None:
        threshold = max(threshold, threshold_rel * float(image.max()))

    if footprint is None:
        size = 2 * min_distance + 1
        footprint = jnp.ones((size,) * image.ndim, dtype=bool)
    else:
        footprint = jnp.asarray(footprint, dtype=bool)

    if labels is None:
        mask = _get_peak_mask(image, footprint, threshold)
        mask = _exclude_border(mask, border_width)
        coordinates = _get_high_intensity_peaks(
            image, mask, num_peaks, min_distance, p_norm
        )
    else:
        # per-label processing: within each object's bounding box, peaks
        # compete only against same-label pixels (reference
        # peak.py:283-330); the box loop runs on host, the filters on
        # device
        labels_np = np.asarray(labels).astype(np.int64)
        _labels = np.asarray(
            _exclude_border(jnp.asarray(labels_np), border_width)
        )
        if np.issubdtype(np.asarray(image).dtype, np.floating):
            bg_val = float(np.finfo(np.asarray(image).dtype).min)
        else:
            bg_val = int(np.iinfo(np.asarray(image).dtype).min)

        from scipy import ndimage as _cpu_ndi

        objects = _cpu_ndi.find_objects(_labels)
        labels_peak_coord = []
        for label_idx, roi in enumerate(objects):
            if roi is None:
                continue
            label_mask = jnp.asarray(labels_np[roi] == label_idx + 1)
            img_object = jnp.where(label_mask, image[roi], bg_val)
            mask = _get_peak_mask(img_object, footprint, threshold,
                                  label_mask)
            coordinates = np.array(
                _get_high_intensity_peaks(
                    img_object, mask, num_peaks_per_label, min_distance,
                    p_norm,
                )
            )
            if coordinates.size:
                for idx, s in enumerate(roi):
                    coordinates[:, idx] += s.start
            labels_peak_coord.append(
                coordinates.reshape(-1, image.ndim)
            )
        if labels_peak_coord:
            coordinates = np.vstack(labels_peak_coord)
        else:
            coordinates = np.empty((0, image.ndim), dtype=int)

        if len(coordinates) > num_peaks:
            out = np.zeros(image.shape, dtype=bool)
            out[tuple(coordinates.T)] = True
            coordinates = _get_high_intensity_peaks(
                image, jnp.asarray(out), num_peaks, min_distance, p_norm
            )

    coordinates = np.asarray(coordinates).reshape(-1, image.ndim)
    if indices:
        return jnp.asarray(coordinates)
    peaks = np.zeros(image.shape, dtype=bool)
    if coordinates.shape[0]:
        peaks[tuple(coordinates.T)] = True
    return jnp.asarray(peaks)


def _get_peak_mask(image, footprint, threshold, mask=None):
    """Candidate-peak mask (reference peak.py:37-60): footprint maximum
    equality, trivial-plateau rejection, threshold."""
    if footprint.size == 1 or image.size == 1:
        return image > threshold
    image_max = ndi.maximum_filter(image, footprint=footprint,
                                   mode="constant")
    out = image == image_max
    image_is_trivial = (
        bool(jnp.all(out)) if mask is None else bool(jnp.all(out[mask]))
    )
    if image_is_trivial:
        out = jnp.zeros_like(out)
        if mask is not None:
            # isolated pixels in the masked area still count as peaks
            isolated_px = jnp.logical_xor(
                mask, ndi.binary_opening(mask)
            )
            out = jnp.where(isolated_px, True, out)
    return out & (image > threshold)


def _get_high_intensity_peaks(image, mask, num_peaks, min_distance,
                              p_norm):
    """Peak coordinates sorted by intensity with min-distance spacing
    (reference peak.py:20-34)."""
    from cupyimg_tpu.skimage._shared.coord import ensure_spacing

    mask_np = np.asarray(mask)
    coord = np.argwhere(mask_np)
    if coord.shape[0]:
        intensities = np.asarray(image)[tuple(coord.T)]
        idx_maxsort = np.argsort(-intensities, kind="stable")
        coord = coord[idx_maxsort]
    coord = np.asarray(
        ensure_spacing(jnp.asarray(coord), spacing=min_distance,
                       p_norm=p_norm)
    ).reshape(-1, mask_np.ndim)
    if len(coord) > num_peaks:
        coord = coord[: int(num_peaks)]
    return jnp.asarray(coord)


def _prominent_peaks(
    image, min_xdistance=1, min_ydistance=1, threshold=None,
    num_peaks=np.inf,
):
    """Peaks with axis-wise non-maximum suppression (reference
    feature/peak.py:348-452; consumed by Hough-style accumulators).

    TPU split: the two 1-d maximum filters and the candidate mask run
    on device; the sequential neighbourhood suppression loop runs on the
    host over the (few) candidate coordinates, exactly like the
    reference's per-peak loop.
    """
    from cupyimg_tpu.skimage import measure

    img = jnp.asarray(image)
    rows, cols = img.shape

    if threshold is None:
        threshold = float(0.5 * jnp.max(img))

    ycoords_size = 2 * min_ydistance + 1
    xcoords_size = 2 * min_xdistance + 1
    img_max = ndi.maximum_filter1d(
        img, size=ycoords_size, axis=0, mode="constant", cval=0
    )
    img_max = ndi.maximum_filter1d(
        img_max, size=xcoords_size, axis=1, mode="constant", cval=0
    )
    mask = img == img_max
    img = img * mask
    img_t = img > threshold

    label_img = measure.label(img_t)
    props = measure.regionprops(label_img, img_max)
    # sort by intensity, not position: strong peaks must not be
    # suppressed by weaker neighbours
    props = sorted(props, key=lambda x: float(x.max_intensity))[::-1]
    coords = np.asarray(
        [np.round(np.asarray(p.centroid)) for p in props], dtype=int
    )

    img_max_np = np.asarray(img_max).copy()
    img_peaks = []
    ycoords_peaks = []
    xcoords_peaks = []

    ycoords_ext, xcoords_ext = np.mgrid[
        -min_ydistance: min_ydistance + 1,
        -min_xdistance: min_xdistance + 1,
    ]
    for ycoords_idx, xcoords_idx in coords:
        accum = img_max_np[ycoords_idx, xcoords_idx]
        if accum > threshold:
            ycoords_nh = ycoords_idx + ycoords_ext
            xcoords_nh = xcoords_idx + xcoords_ext

            # no reflection for the row neighbourhood
            ycoords_in = np.logical_and(ycoords_nh > 0, ycoords_nh < rows)
            ycoords_nh = ycoords_nh[ycoords_in]
            xcoords_nh = xcoords_nh[ycoords_in]

            # wrap columns (continuous axes, e.g. Hough angles)
            xcoords_low = xcoords_nh < 0
            ycoords_nh[xcoords_low] = rows - ycoords_nh[xcoords_low]
            xcoords_nh[xcoords_low] += cols
            xcoords_high = xcoords_nh >= cols
            ycoords_nh[xcoords_high] = rows - ycoords_nh[xcoords_high]
            xcoords_nh[xcoords_high] -= cols

            img_max_np[ycoords_nh, xcoords_nh] = 0
            img_peaks.append(accum)
            ycoords_peaks.append(ycoords_idx)
            xcoords_peaks.append(xcoords_idx)

    img_peaks = np.asarray(img_peaks)
    ycoords_peaks = np.asarray(ycoords_peaks)
    xcoords_peaks = np.asarray(xcoords_peaks)

    if num_peaks < len(img_peaks):
        idx_maxsort = np.argsort(img_peaks)[::-1][: int(num_peaks)]
        img_peaks = img_peaks[idx_maxsort]
        ycoords_peaks = ycoords_peaks[idx_maxsort]
        xcoords_peaks = xcoords_peaks[idx_maxsort]

    return (
        jnp.asarray(img_peaks),
        jnp.asarray(xcoords_peaks),
        jnp.asarray(ycoords_peaks),
    )
