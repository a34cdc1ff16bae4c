"""apply_along_axis (reference cupyimg/numpy/lib/shape_base.py)."""
from cupyimg_tpu.numpy import apply_along_axis  # noqa: F401

__all__ = ["apply_along_axis"]
