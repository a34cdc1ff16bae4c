"""1-d convolve/correlate with numpy semantics (reference
cupyimg/numpy/core/numeric.py)."""
from cupyimg_tpu.numpy import convolve, correlate  # noqa: F401

__all__ = ["convolve", "correlate"]
