"""SciPy-compatible op layer (reference cupyimg/scipy)."""

from cupyimg_tpu.scipy import ndimage  # noqa: F401
