"""ndim (reference cupyimg/numpy/core/fromnumeric.py)."""
from cupyimg_tpu.numpy import ndim  # noqa: F401

__all__ = ["ndim"]
