from cupyimg_tpu.skimage.util.dtype import (  # noqa: F401
    img_as_float32,
    img_as_float64,
    img_as_float,
    img_as_int,
    img_as_uint,
    img_as_ubyte,
    img_as_bool,
    dtype_limits,
)
from cupyimg_tpu.skimage.util.shape import (  # noqa: F401
    view_as_blocks,
    view_as_windows,
)
from cupyimg_tpu.skimage.util.arraycrop import crop  # noqa: F401
from cupyimg_tpu.skimage.util._invert import invert  # noqa: F401
from cupyimg_tpu.skimage.util.noise import random_noise  # noqa: F401
from cupyimg_tpu.skimage.util._map_array import map_array, ArrayMap  # noqa: F401
