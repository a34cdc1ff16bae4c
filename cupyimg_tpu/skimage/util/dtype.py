"""Image dtype conversions (skimage.util.dtype parity).

Semantics follow skimage's documented conversion rules (reference
cupyimg/skimage/util/dtype.py, SURVEY.md S13): floats live in [0,1] or
[-1,1]; integer rescaling uses exact bit-replication upscales and
floor-divide downscales.  Implemented functionally on jnp arrays.
"""

from __future__ import annotations

import math

import warnings

import numpy as np
import jax.numpy as jnp

__all__ = [
    "img_as_float32",
    "img_as_float64",
    "img_as_float",
    "img_as_int",
    "img_as_uint",
    "img_as_ubyte",
    "img_as_bool",
    "dtype_limits",
    "dtype_range",
]

_integer_types = (
    np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
    np.int64, np.uint64,
)
dtype_range = {
    np.bool_: (False, True),
    np.float16: (-1, 1),
    np.float32: (-1, 1),
    np.float64: (-1, 1),
}
dtype_range.update({t: (np.iinfo(t).min, np.iinfo(t).max)
                    for t in _integer_types})
_supported_types = list(dtype_range.keys())


def dtype_limits(image, clip_negative=False):
    """(min, max) intensity limits of the image's dtype (skimage parity)."""
    imin, imax = dtype_range[np.dtype(image.dtype).type]
    if clip_negative:
        imin = 0
    return imin, imax


def _dtype_itemsize(itemsize, *dtypes):
    return next(dt for dt in dtypes if np.dtype(dt).itemsize >= itemsize)


def _dtype_bits(kind, bits, itemsize=1):
    s = next(
        i for i in (itemsize, 2, 4, 8)
        if bits < (i * 8) or (bits == (i * 8) and kind == "u")
    )
    return np.dtype(kind + str(s))


def _scale(a, n, m):
    """Scale positive integers from n to m bits (exact upscale via bit
    replication, floor-divide downscale)."""
    import jax

    kind = np.dtype(a.dtype).kind
    if n == m:
        return a
    if n > m:
        # upstream: when every value already fits in m bits, plain-cast
        # without scaling and warn (reference dtype.py:148-161).  The
        # check is data-dependent, so traced values take the scaling
        # path instead.
        if not isinstance(a, jax.core.Tracer):
            amax = int(jnp.max(a)) if jnp.size(a) else 0
            if amax < 2 ** m:
                mnew = math.ceil(m / 2) * 2
                # reference dtype.py:148-153: odd m rounds up to a
                # signed name, even m keeps the unsigned name
                name = "{}{}".format(
                    "int" if mnew > m else "uint", mnew
                )
                warnings.warn(
                    f"Downcasting {np.dtype(a.dtype)} to {name} "
                    f"without scaling because max value {amax} "
                    f"fits in {name}",
                    stacklevel=3,
                )
                return a.astype(_dtype_bits(kind, m))
        # downscale with precision loss
        return (a // (2 ** (n - m))).astype(_dtype_bits(kind, m))
    if m % n == 0:
        # exact upscale to a multiple of n bits
        b = a.astype(_dtype_bits(kind, m))
        return b * ((2 ** m - 1) // (2 ** n - 1))
    # upscale to a multiple of n bits, then downscale with precision loss
    o = (m // n + 1) * n
    b = a.astype(_dtype_bits(kind, o))
    b = b * ((2 ** o - 1) // (2 ** n - 1))
    return (b // (2 ** (o - m))).astype(_dtype_bits(kind, m))


def _convert(image, dtype, force_copy=False, uniform=False):
    """Convert an image to the requested dtype with skimage scaling rules."""
    image = jnp.asarray(image)
    dtypeobj_in = np.dtype(image.dtype)
    dtypeobj_out = np.dtype(dtype)
    dtype_in = dtypeobj_in.type
    dtype_out = dtypeobj_out.type
    kind_in = dtypeobj_in.kind
    kind_out = dtypeobj_out.kind
    itemsize_in = dtypeobj_in.itemsize
    itemsize_out = dtypeobj_out.itemsize

    if dtype_in == dtype_out:
        return image

    if not (dtype_in in _supported_types and dtype_out in _supported_types):
        raise ValueError(
            f"Can not convert from {dtypeobj_in} to {dtypeobj_out}."
        )

    if kind_in in "ui":
        imin_in = np.iinfo(dtype_in).min
        imax_in = np.iinfo(dtype_in).max
    if kind_out in "ui":
        imin_out = np.iinfo(dtype_out).min
        imax_out = np.iinfo(dtype_out).max

    # any -> binary
    if kind_out == "b":
        return image > dtype_in(dtype_range[dtype_in][1] / 2)

    # binary -> any
    if kind_in == "b":
        result = image.astype(dtype_out)
        if kind_out != "f":
            result = result * dtype_out(dtype_range[dtype_out][1])
        return result

    # float -> any
    if kind_in == "f":
        if kind_out == "f":
            return image.astype(dtype_out)
        # upstream: float images must lie in [-1, 1] before integer
        # conversion (reference dtype.py:305-306); data-dependent, so
        # traced values skip the eager check
        import jax

        if not isinstance(image, jax.core.Tracer) and jnp.size(image):
            if (
                float(jnp.min(image)) < -1.0
                or float(jnp.max(image)) > 1.0
            ):
                raise ValueError(
                    "Images of type float must be between -1 and 1."
                )
        computation_type = _dtype_itemsize(
            itemsize_out, dtype_in, np.float32, np.float64
        )
        if not uniform:
            if kind_out == "u":
                image_out = jnp.multiply(
                    image.astype(computation_type), imax_out
                )
            else:
                image_out = jnp.multiply(
                    image.astype(computation_type), (imax_out - imin_out) / 2
                ) - 0.5
            image_out = jnp.rint(image_out)
            image_out = jnp.clip(image_out, imin_out, imax_out)
        elif kind_out == "u":
            image_out = jnp.multiply(
                image.astype(computation_type), imax_out + 1
            )
            image_out = jnp.clip(image_out, 0, imax_out)
        else:
            image_out = jnp.multiply(
                image.astype(computation_type),
                (imax_out - imin_out + 1.0) / 2.0,
            )
            image_out = jnp.floor(image_out)
            image_out = jnp.clip(image_out, imin_out, imax_out)
        return image_out.astype(dtype_out)

    # signed/unsigned int -> float
    if kind_out == "f":
        computation_type = _dtype_itemsize(
            itemsize_in, dtype_out, np.float32, np.float64
        )
        if kind_in == "u":
            image = jnp.multiply(
                image.astype(computation_type), 1.0 / imax_in
            )
        else:
            image = jnp.add(image.astype(computation_type), 0.5)
            image = image * (2 / (imax_in - imin_in))
        return image.astype(dtype_out)

    # unsigned int -> signed/unsigned int
    if kind_in == "u":
        if kind_out == "i":
            image = _scale(image, 8 * itemsize_in, 8 * itemsize_out - 1)
            # reinterpret the unsigned bits as signed of the same width
            return image.astype(dtype_out)
        return _scale(image, 8 * itemsize_in, 8 * itemsize_out)

    # signed int -> unsigned int
    if kind_out == "u":
        image = _scale(image, 8 * itemsize_in - 1, 8 * itemsize_out)
        return jnp.maximum(image, 0).astype(dtype_out)

    # signed int -> signed int
    if itemsize_in > itemsize_out:
        return _scale(image, 8 * itemsize_in - 1, 8 * itemsize_out - 1)

    image = image.astype(_dtype_bits("i", itemsize_out * 8))
    image = image - imin_in
    image = _scale(image, 8 * itemsize_in, 8 * itemsize_out)
    image = image.astype(np.int64) + imin_out
    return image.astype(dtype_out)


def img_as_float32(image, force_copy=False):
    """Convert to float32 (skimage parity)."""
    return _convert(image, np.float32, force_copy)


def img_as_float64(image, force_copy=False):
    """Convert to float64 (skimage parity)."""
    return _convert(image, np.float64, force_copy)


def img_as_float(image, force_copy=False):
    """Convert to floating point, preserving float inputs (skimage parity)."""
    if np.dtype(jnp.asarray(image).dtype).kind == "f":
        return jnp.asarray(image)
    return _convert(image, np.float64, force_copy)


def img_as_uint(image, force_copy=False):
    """Convert to uint16 (skimage parity)."""
    return _convert(image, np.uint16, force_copy)


def img_as_int(image, force_copy=False):
    """Convert to int16 (skimage parity)."""
    return _convert(image, np.int16, force_copy)


def img_as_ubyte(image, force_copy=False):
    """Convert to uint8 (skimage parity)."""
    return _convert(image, np.uint8, force_copy)


def img_as_bool(image, force_copy=False):
    """Convert to bool (skimage parity)."""
    return _convert(image, np.bool_, force_copy)


def convert(image, dtype, force_copy=False, uniform=False):
    """Deprecated public alias of the internal range converter
    (skimage parity)."""
    warnings.warn(
        "The use of this function is discouraged as its behavior may "
        "change dramatically in scikit-image 1.0. This function will be "
        "removed in scikit-image 1.0.",
        FutureWarning,
        stacklevel=2,
    )
    return _convert(image=image, dtype=dtype, force_copy=force_copy,
                    uniform=uniform)
