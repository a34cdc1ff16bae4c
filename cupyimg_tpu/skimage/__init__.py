"""scikit-image-compatible layer on the TPU-native op suite
(reference cupyimg/skimage, SURVEY.md §2.2)."""

from .util.dtype import (  # noqa: F401,E402
    img_as_float32,
    img_as_float64,
    img_as_float,
    img_as_int,
    img_as_uint,
    img_as_ubyte,
    img_as_bool,
    dtype_limits,
)
