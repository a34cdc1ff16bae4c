"""Shared validation/conversion helpers (reference
cupyimg/skimage/_shared/utils.py, SURVEY.md S1)."""

from __future__ import annotations

import functools
import sys
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
    # measure distance to the NEAREST integer (19.9999 -> 0.0001)
    mod = np.where(mod > 0.5, 1 - mod, mod)
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
        # reference _shared/utils.py:453-461: a FutureWarning (0.19 turns
        # it into a ValueError)
        import warnings

        warnings.warn(
            "Input image dtype is bool. Interpolation is not defined "
            "with bool data type. Please set order to 0 or explicitly "
            "cast input image to another data type. Starting from "
            "version 0.19 a ValueError will be raised instead of this "
            "warning.",
            FutureWarning,
            stacklevel=2,
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


class skimage_deprecation(Warning):
    """Create our own deprecation class, since Python >= 2.7 silences
    deprecations by default."""


class change_default_value:
    """Decorator to warn when a parameter's default value will change
    (reference _shared/utils.py change_default_value)."""

    def __init__(self, arg_name, *, new_value, changed_version,
                 warning_msg=None):
        self.arg_name = arg_name
        self.new_value = new_value
        self.warning_msg = warning_msg
        self.changed_version = changed_version

    def __call__(self, func):
        import inspect

        parameters = inspect.signature(func).parameters
        arg_idx = list(parameters.keys()).index(self.arg_name)
        old_value = parameters[self.arg_name].default

        if self.warning_msg is None:
            self.warning_msg = (
                f"The new recommended value for {self.arg_name} is "
                f"{self.new_value}. Until version {self.changed_version}, "
                f"the default {self.arg_name} value is {old_value}. "
                f"From version {self.changed_version}, the {self.arg_name} "
                f"default value will be {self.new_value}. To avoid "
                f"this warning, please explicitly set {self.arg_name} value."
            )

        @functools.wraps(func)
        def fixed_func(*args, **kwargs):
            if len(args) < arg_idx + 1 and self.arg_name not in kwargs:
                warnings.warn(
                    self.warning_msg, FutureWarning, stacklevel=2
                )
            return func(*args, **kwargs)

        return fixed_func


class remove_arg:
    """Decorator to warn that an argument is deprecated and will be
    removed (reference _shared/utils.py remove_arg)."""

    def __init__(self, arg_name, *, changed_version, help_msg=None):
        self.arg_name = arg_name
        self.help_msg = help_msg
        self.changed_version = changed_version

    def __call__(self, func):
        import inspect

        parameters = inspect.signature(func).parameters
        arg_idx = list(parameters.keys()).index(self.arg_name)
        warning_msg = (
            f"{self.arg_name} argument is deprecated and will be removed "
            f"in version {self.changed_version}. To avoid this warning, "
            f"please do not use the {self.arg_name} argument. Please "
            f"see {func.__name__} documentation for more details."
        )
        if self.help_msg is not None:
            warning_msg += f" {self.help_msg}"

        @functools.wraps(func)
        def fixed_func(*args, **kwargs):
            if len(args) > arg_idx or self.arg_name in kwargs:
                warnings.warn(warning_msg, FutureWarning, stacklevel=2)
            return func(*args, **kwargs)

        return fixed_func


class deprecate_kwarg:
    """Decorator ensuring backward compatibility when a kwarg is
    renamed (reference _shared/utils.py deprecate_kwarg)."""

    def __init__(self, kwarg_mapping, warning_msg=None,
                 removed_version=None):
        self.kwarg_mapping = kwarg_mapping
        if warning_msg is None:
            self.warning_msg = (
                "'{old_arg}' is a deprecated argument name "
                "for `{func_name}`. "
            )
            if removed_version is not None:
                self.warning_msg += (
                    f"It will be removed in version {removed_version}. "
                )
            self.warning_msg += "Please use '{new_arg}' instead."
        else:
            self.warning_msg = warning_msg

    def __call__(self, func):
        @functools.wraps(func)
        def fixed_func(*args, **kwargs):
            for old_arg, new_arg in self.kwarg_mapping.items():
                if old_arg in kwargs:
                    warnings.warn(
                        self.warning_msg.format(
                            old_arg=old_arg,
                            func_name=func.__name__,
                            new_arg=new_arg,
                        ),
                        FutureWarning,
                        stacklevel=2,
                    )
                    kwargs[new_arg] = kwargs.pop(old_arg)
            return func(*args, **kwargs)

        return fixed_func


class deprecated(object):
    """Decorator to mark deprecated functions with a warning
    (reference _shared/utils.py deprecated)."""

    def __init__(self, alt_func=None, behavior="warn",
                 removed_version=None):
        self.alt_func = alt_func
        self.behavior = behavior
        self.removed_version = removed_version

    def __call__(self, func):
        alt_msg = ""
        if self.alt_func is not None:
            alt_msg = f" Use ``{self.alt_func}`` instead."
        rmv_msg = ""
        if self.removed_version is not None:
            rmv_msg = (
                f" and will be removed in version {self.removed_version}"
            )
        msg = f"Function ``{func.__name__}`` is deprecated{rmv_msg}.{alt_msg}"

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            if self.behavior == "warn":
                func_code = func.__code__
                warnings.simplefilter("always", skimage_deprecation)
                warnings.warn_explicit(
                    msg,
                    category=skimage_deprecation,
                    filename=func_code.co_filename,
                    lineno=func_code.co_firstlineno + 1,
                )
            elif self.behavior == "raise":
                raise skimage_deprecation(msg)
            return func(*args, **kwargs)

        doc = "**Deprecated function**." + alt_msg
        if wrapped.__doc__ is None:
            wrapped.__doc__ = doc
        else:
            wrapped.__doc__ = doc + "\n\n    " + wrapped.__doc__
        return wrapped


def get_bound_method_class(m):
    """Return the class for a bound method."""
    return m.im_class if sys.version < "3" else m.__self__.__class__


def check_random_state(seed):
    """Turn seed into a np.random.RandomState instance (reference
    _shared/utils.py check_random_state)."""
    if seed is None or seed is np.random:
        return np.random.mtrand._rand
    if isinstance(seed, (int, np.integer)):
        return np.random.RandomState(seed)
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(
        "%r cannot be used to seed a numpy.random.RandomState "
        "instance" % seed
    )
