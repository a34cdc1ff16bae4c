"""Canny edge detector (reference cupyimg/skimage/feature/_canny.py).

TPU-native redesign of the non-maximum suppression: the reference's
boolean fancy-indexing per direction sector (dynamic-shape gathers,
_canny.py:215-280) becomes dense shifted-neighbor interpolation with
``jnp.where`` selects — one fused static-shape pass over the image.
Hysteresis linking uses the atomics-free ``ndi.label`` + per-label sums.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndi
from cupyimg_tpu.scipy.ndimage import (
    generate_binary_structure,
    binary_erosion,
)
from ..filters import gaussian
from ..util.dtype import dtype_limits, img_as_float
from .._shared.utils import check_nD

__all__ = ["canny"]


def smooth_with_function_and_mask(image, function, mask):
    """Smooth, renormalizing by the mask's smoothed bleed-over
    (reference _canny.py:24-51)."""
    image = jnp.asarray(image)
    mask = jnp.asarray(mask, dtype=bool)
    bleed_over = function(mask.astype(float))
    masked_image = jnp.where(mask, image, 0)
    smoothed_image = function(masked_image)
    return smoothed_image / (bleed_over + np.finfo(np.float64).eps)


def _shift(a, di, dj):
    """a shifted so out(i, j) = a(i + di, j + dj), zero fill."""
    pads = [
        (max(-di, 0), max(di, 0)),
        (max(-dj, 0), max(dj, 0)),
    ]
    sl = (
        slice(max(di, 0), a.shape[0] + max(di, 0)),
        slice(max(dj, 0), a.shape[1] + max(dj, 0)),
    )
    return jnp.pad(a, pads)[sl]


def canny(
    image,
    sigma=1.0,
    low_threshold=None,
    high_threshold=None,
    mask=None,
    use_quantiles=False,
):
    """Canny edge map of a 2-D image (skimage parity; reference
    _canny.py:54-330: gaussian smooth -> sobel -> sector-wise
    interpolated non-max suppression -> hysteresis via labeling)."""
    image = jnp.asarray(image)
    check_nD(image, 2)
    dtype_max = dtype_limits(image, clip_negative=False)[1]

    if low_threshold is None:
        low_threshold = 0.1
    elif use_quantiles:
        if not (0.0 <= low_threshold <= 1.0):
            raise ValueError(
                "Quantile thresholds must be between 0 and 1."
            )
    else:
        low_threshold = low_threshold / dtype_max

    if high_threshold is None:
        high_threshold = 0.2
    elif use_quantiles:
        if not (0.0 <= high_threshold <= 1.0):
            raise ValueError(
                "Quantile thresholds must be between 0 and 1."
            )
    else:
        high_threshold = high_threshold / dtype_max

    if mask is None:
        mask = jnp.ones(image.shape, dtype=bool)
    else:
        mask = jnp.asarray(mask, dtype=bool)

    def fsmooth(x):
        return img_as_float(gaussian(x, sigma, mode="constant"))

    smoothed = smooth_with_function_and_mask(image, fsmooth, mask)
    jsobel = ndi.sobel(smoothed, axis=1)
    isobel = ndi.sobel(smoothed, axis=0)
    abs_isobel = jnp.abs(isobel)
    abs_jsobel = jnp.abs(jsobel)
    magnitude = jnp.hypot(isobel, jsobel)

    # Erode the mask: border gradients are "infected" by the unknown
    s = generate_binary_structure(2, 2)
    eroded_mask = binary_erosion(mask, s, border_value=0)
    eroded_mask = eroded_mask & (magnitude > 0)

    # ---- non-maximum suppression, dense over all four sectors ----
    # interpolation weights (denominator is never zero inside
    # eroded_mask because magnitude > 0 there, but guard anyway)
    w_ij = jnp.where(
        abs_isobel == 0, 0.0, abs_jsobel / jnp.where(
            abs_isobel == 0, 1.0, abs_isobel)
    )
    w_ji = jnp.where(
        abs_jsobel == 0, 0.0, abs_isobel / jnp.where(
            abs_jsobel == 0, 1.0, abs_jsobel)
    )

    def interp_le(c2, c1, w):
        return c2 * w + c1 * (1 - w) <= magnitude

    m = {}
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            m[(di, dj)] = _shift(magnitude, di, dj)

    same_sign = (isobel >= 0) & (jsobel >= 0) | (
        (isobel <= 0) & (jsobel <= 0)
    )
    opp_sign = (isobel <= 0) & (jsobel >= 0) | (
        (isobel >= 0) & (jsobel <= 0)
    )

    # sectors are applied in the reference's order with overwrite
    # semantics (overlapping boundary points take the *last* matching
    # sector's verdict, as `local_maxima[pts] = ...` does)
    sectors = [
        # 0-45 deg: horizontal + diagonal (reference _canny.py:215-231)
        (
            eroded_mask & same_sign & (abs_isobel >= abs_jsobel),
            interp_le(m[(1, 1)], m[(1, 0)], w_ij)
            & interp_le(m[(-1, -1)], m[(-1, 0)], w_ij),
        ),
        # 45-90 deg: diagonal + vertical (232-246)
        (
            eroded_mask & same_sign & (abs_isobel <= abs_jsobel),
            interp_le(m[(1, 1)], m[(0, 1)], w_ji)
            & interp_le(m[(-1, -1)], m[(0, -1)], w_ji),
        ),
        # 90-135 deg: anti-diagonal + vertical (247-263)
        (
            eroded_mask & opp_sign & (abs_isobel <= abs_jsobel),
            interp_le(m[(-1, 1)], m[(0, 1)], w_ji)
            & interp_le(m[(1, -1)], m[(0, -1)], w_ji),
        ),
        # 135-180 deg: anti-diagonal + anti-horizontal (264-280)
        (
            eroded_mask & opp_sign & (abs_isobel >= abs_jsobel),
            interp_le(m[(-1, 1)], m[(-1, 0)], w_ij)
            & interp_le(m[(1, -1)], m[(1, 0)], w_ij),
        ),
    ]
    local_maxima = jnp.zeros(image.shape, bool)
    for pts, val in sectors:
        local_maxima = jnp.where(pts, val, local_maxima)

    if use_quantiles:
        high_threshold = jnp.percentile(
            magnitude, 100.0 * high_threshold
        )
        low_threshold = jnp.percentile(
            magnitude, 100.0 * low_threshold
        )

    high_mask = local_maxima & (magnitude >= high_threshold)
    low_mask = local_maxima & (magnitude >= low_threshold)

    # hysteresis: keep low-threshold components containing a
    # high-threshold pixel
    labels, count = ndi.label(low_mask, np.ones((3, 3), bool))
    count = int(count)
    if count == 0:
        return low_mask

    sums = jnp.atleast_1d(
        jnp.asarray(
            ndi.sum(
                high_mask, labels, jnp.arange(count, dtype=np.int32) + 1
            )
        )
    )
    good_label = jnp.zeros((count + 1,), bool).at[1:].set(sums > 0)
    return good_label[labels]
