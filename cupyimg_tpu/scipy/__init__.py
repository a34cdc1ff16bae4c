"""SciPy-compatible op layer (reference cupyimg/scipy)."""

from cupyimg_tpu.scipy import ndimage  # noqa: F401
from cupyimg_tpu.scipy import signal  # noqa: F401
from cupyimg_tpu.scipy import special  # noqa: F401
from cupyimg_tpu.scipy import stats  # noqa: F401
from cupyimg_tpu.scipy import interpolate  # noqa: F401
