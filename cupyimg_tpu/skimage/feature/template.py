"""match_template (reference cupyimg/skimage/feature/template.py).

Fast normalized cross-correlation: FFT correlation for the numerator and
cumulative-sum integral images for the windowed statistics — both
bandwidth-bound fused pipelines on TPU.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy.signal import fftconvolve
from .._shared.utils import check_nD

__all__ = ["match_template"]


def _window_sum_2d(image, window_shape):
    window_sum = jnp.cumsum(image, axis=0)
    window_sum = (
        window_sum[window_shape[0] : -1]
        - window_sum[: -window_shape[0] - 1]
    )
    window_sum = jnp.cumsum(window_sum, axis=1)
    window_sum = (
        window_sum[:, window_shape[1] : -1]
        - window_sum[:, : -window_shape[1] - 1]
    )
    return window_sum


def _window_sum_3d(image, window_shape):
    window_sum = _window_sum_2d(image, window_shape)
    window_sum = jnp.cumsum(window_sum, axis=2)
    window_sum = (
        window_sum[:, :, window_shape[2] : -1]
        - window_sum[:, :, : -window_shape[2] - 1]
    )
    return window_sum


def match_template(
    image, template, pad_input=False, mode="constant",
    constant_values=0,
):
    """Normalized cross-correlation template matching (skimage parity;
    reference template.py:38-205)."""
    image = jnp.asarray(image)
    template = jnp.asarray(template)
    check_nD(image, (2, 3))

    if image.ndim < template.ndim:
        raise ValueError(
            "Dimensionality of template must be less than or "
            "equal to the dimensionality of image."
        )
    if any(si < st for si, st in zip(image.shape, template.shape)):
        raise ValueError("Image must be larger than template.")

    image_shape = image.shape

    float_dtype = jnp.promote_types(image.dtype, np.float32)
    image = image.astype(float_dtype)
    template = template.astype(float_dtype)

    pad_width = tuple((width, width) for width in template.shape)
    if mode == "constant":
        image = jnp.pad(
            image,
            pad_width=pad_width,
            mode=mode,
            constant_values=constant_values,
        )
    else:
        image = jnp.pad(image, pad_width=pad_width, mode=mode)

    if image.ndim == 2:
        image_window_sum = _window_sum_2d(image, template.shape)
        image_window_sum2 = _window_sum_2d(
            image * image, template.shape
        )
    elif image.ndim == 3:
        image_window_sum = _window_sum_3d(image, template.shape)
        image_window_sum2 = _window_sum_3d(
            image * image, template.shape
        )

    template_mean = template.mean()
    template_volume = math.prod(template.shape)
    template_ssd = jnp.sum((template - template_mean) ** 2)

    flip = (slice(None, None, -1),) * template.ndim
    trim = (slice(1, -1),) * image.ndim
    xcorr = fftconvolve(image, template[flip], mode="valid")[trim]

    numerator = xcorr - image_window_sum * template_mean

    denominator = (
        image_window_sum2
        - image_window_sum * image_window_sum / template_volume
    ) * template_ssd
    denominator = jnp.sqrt(jnp.maximum(denominator, 0))

    # avoid zero-division
    valid = denominator > np.finfo(np.float64).eps
    response = jnp.where(
        valid, numerator / jnp.where(valid, denominator, 1.0), 0.0
    )

    slices = []
    for i in range(template.ndim):
        if pad_input:
            d0 = (template.shape[i] - 1) // 2
            d1 = d0 + image_shape[i]
        else:
            d0 = template.shape[i] - 1
            d1 = d0 + image_shape[i] - template.shape[i] + 1
        slices.append(slice(d0, d1))

    return response[tuple(slices)]
