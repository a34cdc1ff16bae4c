"""skimage.restoration-compatible subpackage (reference
cupyimg/skimage/restoration/__init__.py)."""

from .deconvolution import wiener, unsupervised_wiener, richardson_lucy
from ._denoise import denoise_tv_chambolle
from .j_invariant import calibrate_denoiser

__all__ = [
    "wiener",
    "unsupervised_wiener",
    "richardson_lucy",
    "denoise_tv_chambolle",
    "calibrate_denoiser",
]
