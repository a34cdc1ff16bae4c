"""ravel_multi_index (reference cupyimg/numpy/core/multiarray.py)."""
from cupyimg_tpu.numpy import ravel_multi_index  # noqa: F401

__all__ = ["ravel_multi_index"]
