"""histogram family (reference cupyimg/numpy/lib/histograms.py; the
custom bin-search kernels become jnp.histogram* — SURVEY.md N8)."""
from cupyimg_tpu.numpy import histogram, histogram2d, histogramdd  # noqa: F401

__all__ = ["histogram", "histogram2d", "histogramdd"]
