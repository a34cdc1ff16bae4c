"""gradient (reference cupyimg/numpy/lib/function_base.py)."""
from cupyimg_tpu.numpy import gradient  # noqa: F401

__all__ = ["gradient"]
