from cupyimg_tpu.scipy.interpolate.interpolate import (  # noqa: F401
    RegularGridInterpolator,
    interpn,
)
