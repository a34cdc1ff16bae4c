"""Shared validation/conversion helpers (reference
cupyimg/skimage/_shared/utils.py, SURVEY.md S1)."""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = [
    "check_shape_equality",
    "safe_as_int",
    "convert_to_float",
    "warn",
    "_validate_interpolation_order",
    "_supported_float_type",
]


def warn(message, category=UserWarning, stacklevel=2):
    warnings.warn(message, category=category, stacklevel=stacklevel)


def check_shape_equality(im1, im2):
    if not im1.shape == im2.shape:
        raise ValueError("Input images must have the same dimensions.")


def safe_as_int(val, atol=1e-3):
    """Coerce near-integer values to int, raising if they aren't integral
    (skimage parity)."""
    mod = np.asarray(val) % 1
    try:
        np.testing.assert_allclose(mod, 0, atol=atol)
    except AssertionError:
        raise ValueError(
            f"Integer argument required but received {val}, "
            f"check inputs."
        )
    return np.round(np.asarray(val)).astype(np.int64)


def convert_to_float(image, preserve_range):
    """Convert to float, optionally preserving the intensity range
    (skimage parity)."""
    image = jnp.asarray(image)
    if preserve_range:
        if np.dtype(image.dtype).kind == "f":
            return image
        return image.astype(np.float64)
    return img_as_float(image)


def _validate_interpolation_order(image_dtype, order):
    """Validate and default the spline interpolation order (skimage
    parity)."""
    if order is None:
        return 0 if np.dtype(image_dtype) == bool else 1
    if order < 0 or order > 5:
        raise ValueError(
            "Spline interpolation order has to be in the range 0-5."
        )
    if np.dtype(image_dtype) == bool and order != 0:
        raise ValueError(
            "Input image dtype is bool. Interpolation is not defined "
            "with bool data type. Please set order to 0 or explicitly "
            "cast input image to another data type."
        )
    return order


def _supported_float_type(input_dtype, allow_complex=False):
    """float32 stays float32; everything else promotes to float64."""
    input_dtype = np.dtype(input_dtype)
    if not allow_complex and input_dtype.kind == "c":
        raise ValueError("complex valued input is not supported")
    if input_dtype in (np.float16, np.float32):
        return np.float32
    if input_dtype == np.complex64:
        return np.complex64
    if input_dtype.kind == "c":
        return np.complex128
    return np.float64


def check_nD(array, ndim, arg_name="image"):
    """Verify an array has one of the expected dimensionalities
    (skimage parity)."""
    array = np.asarray(array) if not hasattr(array, "ndim") else array
    msg_incorrect_dim = (
        "The parameter `%s` must be a %s-dimensional array"
    )
    msg_empty_array = "The parameter `%s` cannot be an empty array"
    if isinstance(ndim, int):
        ndim = [ndim]
    if array.size == 0:
        raise ValueError(msg_empty_array % (arg_name))
    if array.ndim not in ndim:
        raise ValueError(
            msg_incorrect_dim
            % (arg_name, "-or-".join([str(n) for n in ndim]))
        )
