"""Intensity/histogram operations (skimage.exposure parity; reference
cupyimg/skimage/exposure/exposure.py, SURVEY.md S3)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.util.dtype import (
    dtype_limits,
    dtype_range,
    img_as_float,
)

__all__ = [
    "histogram",
    "equalize_hist",
    "rescale_intensity",
    "cumulative_distribution",
    "adjust_gamma",
    "adjust_log",
    "adjust_sigmoid",
    "is_low_contrast",
]


def _offset_array(arr, low_boundary, high_boundary):
    """Offset the array so the lowest value is 0 (for int bincount)."""
    if low_boundary < 0:
        offset = low_boundary
        arr = arr - offset
    else:
        offset = 0
    return arr, offset


def _bincount_histogram(image, source_range):
    """Integer-image histogram with one bin per integer (skimage parity)."""
    image_np_min = int(image.min())
    image_np_max = int(image.max())
    if source_range == "image":
        image_min = image_np_min
        image_max = image_np_max
    elif source_range == "dtype":
        image_min, image_max = dtype_limits(image, clip_negative=False)
    else:
        raise ValueError("Incorrect value for `source_range` argument")
    # widen BEFORE offsetting: offsetting int8 by +128 in its own dtype
    # wraps around
    image, offset = _offset_array(
        image.ravel().astype(jnp.int64), image_min, image_max
    )
    length = image_max - image_min + 1
    hist = jnp.bincount(
        jnp.clip(image - (image_min - offset), 0, length - 1),
        length=length,
    )
    bin_centers = jnp.arange(image_min, image_max + 1)
    if source_range == "image":
        idx = max(image_min, 0)
        # skimage trims leading bins below 0 only for source_range='image'
        return hist, bin_centers
    return hist, bin_centers


def histogram(image, nbins=256, source_range="image", normalize=False):
    """Histogram of an image (skimage parity: integer dtypes get one bin
    per integer value; channel dim is NOT treated specially)."""
    image = jnp.asarray(image)
    sh = image.shape
    if len(sh) == 3 and sh[-1] < 4:
        import warnings

        warnings.warn(
            "This might be a color image. The histogram will be "
            "computed on the flattened image. You can instead "
            "apply this function to each color channel."
        )
    if np.dtype(image.dtype).kind in "iu":
        hist, bin_centers = _bincount_histogram(image, source_range)
    else:
        flat = image.ravel()
        if source_range == "image":
            hist_range = (float(flat.min()), float(flat.max()))
        elif source_range == "dtype":
            hist_range = dtype_limits(image, clip_negative=False)
        else:
            raise ValueError("Incorrect value for `source_range` argument")
        hist, bin_edges = jnp.histogram(flat, bins=nbins, range=hist_range)
        bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    if normalize:
        hist = hist / jnp.sum(hist)
    return hist, bin_centers


def cumulative_distribution(image, nbins=256):
    """CDF of an image (skimage parity)."""
    hist, bin_centers = histogram(image, nbins)
    img_cdf = jnp.cumsum(hist)
    img_cdf = img_cdf / img_cdf[-1]
    return img_cdf, bin_centers


def equalize_hist(image, nbins=256, mask=None):
    """Histogram equalization (skimage parity)."""
    image = jnp.asarray(image)
    if mask is not None:
        mask = jnp.asarray(mask, dtype=bool)
        flat = image.ravel()
        sel = np.asarray(flat)[np.asarray(mask.ravel())]
        cdf, bin_centers = cumulative_distribution(jnp.asarray(sel), nbins)
    else:
        cdf, bin_centers = cumulative_distribution(image, nbins)
    out = jnp.interp(image.ravel(), bin_centers.astype(np.float64), cdf)
    return out.reshape(image.shape)


DTYPE_RANGE = {np.dtype(k).name: v for k, v in dtype_range.items()}
DTYPE_RANGE.update({"uint10": (0, 2 ** 10 - 1), "uint12": (0, 2 ** 12 - 1),
                    "uint14": (0, 2 ** 14 - 1), "bool": dtype_range[np.bool_],
                    "float": dtype_range[np.float64]})


def intensity_range(image, range_values="image", clip_negative=False):
    """(min, max) intensity range for various specifiers (skimage parity)."""
    if range_values == "dtype":
        range_values = np.dtype(image.dtype).type
    if range_values == "image":
        i_min = float(image.min())
        i_max = float(image.max())
    elif isinstance(range_values, str) and range_values in DTYPE_RANGE:
        i_min, i_max = DTYPE_RANGE[range_values]
        if clip_negative:
            i_min = 0
    elif range_values in dtype_range:
        i_min, i_max = dtype_range[range_values]
        if clip_negative:
            i_min = 0
    else:
        i_min, i_max = range_values
    return i_min, i_max


def _output_dtype(dtype_or_range):
    """Resolve ``out_range`` to an output dtype (skimage parity: value
    pairs give float; named non-canonical ranges uint10/12/14 give
    uint16; bad strings raise)."""
    if isinstance(dtype_or_range, (list, tuple, np.ndarray)):
        return np.float64
    if isinstance(dtype_or_range, type):
        return dtype_or_range
    if dtype_or_range in DTYPE_RANGE:
        try:
            return np.dtype(dtype_or_range).type
        except TypeError:  # uint10 / uint12 / uint14
            return np.uint16
    raise ValueError(
        "Incorrect value for out_range, should be a valid image data type "
        f"or a pair of values, got {dtype_or_range}."
    )


def rescale_intensity(image, in_range="image", out_range="dtype"):
    """Stretch/shrink the intensity range (skimage parity)."""
    image = jnp.asarray(image)
    if out_range in ("dtype", "image"):
        out_dtype = _output_dtype(np.dtype(image.dtype).type)
    else:
        out_dtype = _output_dtype(out_range)
    imin, imax = (float(v) for v in intensity_range(image, in_range))
    omin, omax = (
        float(v)
        for v in intensity_range(
            image, out_range, clip_negative=(imin >= 0)
        )
    )
    if np.any(np.isnan([imin, imax, omin, omax])):
        import warnings

        warnings.warn(
            "One or more intensity levels are NaN. Rescaling will "
            "broadcast NaN to the full image. Provide intensity levels "
            "yourself to avoid this. E.g. with np.nanmin(image), "
            "np.nanmax(image).",
            stacklevel=2,
        )
    image = jnp.clip(image.astype(np.float64), imin, imax)
    if imin != imax:
        image = (image - imin) / (imax - imin)
        out = image * (omax - omin) + omin
    else:
        out = jnp.clip(image, omin, omax)
    # skimage casts with np.asarray(..., dtype=out_dtype): truncation,
    # not rounding
    return out.astype(out_dtype)


def _assert_non_negative(image):
    if bool(jnp.any(image < 0)):
        raise ValueError(
            "Image Correction methods work correctly only on images with "
            "non-negative values. Use skimage.exposure.rescale_intensity."
        )


def adjust_gamma(image, gamma=1, gain=1):
    """Gamma correction (skimage parity)."""
    image = jnp.asarray(image)
    _assert_non_negative(image)
    if gamma < 0:
        raise ValueError("Gamma should be a non-negative real number.")
    dtype = np.dtype(image.dtype)
    if dtype.kind in "iu":
        scale = float(
            dtype_limits(image, True)[1] - dtype_limits(image, True)[0]
        )
        out = ((image / scale) ** gamma) * scale * gain
        return out.astype(dtype)
    return ((image ** gamma) * gain).astype(dtype)


def adjust_log(image, gain=1, inv=False):
    """Logarithmic correction (skimage parity)."""
    image = jnp.asarray(image)
    _assert_non_negative(image)
    dtype = np.dtype(image.dtype)
    scale = float(
        dtype_limits(image, True)[1] - dtype_limits(image, True)[0]
    )
    norm = image / scale
    if inv:
        out = (2 ** norm - 1) * scale * gain
    else:
        out = jnp.log2(1 + norm) * scale * gain
    return out.astype(dtype)


def adjust_sigmoid(image, cutoff=0.5, gain=10, inv=False):
    """Sigmoid correction (skimage parity)."""
    image = jnp.asarray(image)
    dtype = np.dtype(image.dtype)
    scale = float(
        dtype_limits(image, True)[1] - dtype_limits(image, True)[0]
    )
    norm = image / scale
    sig = 1 / (1 + jnp.exp(gain * (cutoff - norm)))
    if inv:
        sig = 1 - sig
    return (sig * scale).astype(dtype)


def is_low_contrast(
    image, fraction_threshold=0.05, lower_percentile=1, upper_percentile=99,
    method="linear",
):
    """True if the image's intensity span is small (skimage parity)."""
    image = jnp.asarray(image)
    if image.ndim == 3 and image.shape[2] in (3, 4):
        from cupyimg_tpu.skimage.color.colorconv import rgb2gray, rgba2rgb

        if image.shape[2] == 4:
            image = rgba2rgb(image)
        image = rgb2gray(image)
    dlimits = dtype_limits(image, clip_negative=False)
    limits = np.percentile(
        np.asarray(image), [lower_percentile, upper_percentile]
    )
    ratio = (limits[1] - limits[0]) / (dlimits[1] - dlimits[0])
    return bool(ratio < fraction_threshold)
