"""Gabor filters (skimage.filters parity; reference
cupyimg/skimage/filters/_gabor.py)."""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.core.complexutil import make_complex

from cupyimg_tpu.scipy import ndimage as ndi

__all__ = ["gabor_kernel", "gabor"]


def _sigma_prefactor(bandwidth):
    b = bandwidth
    return (
        1.0 / np.pi * math.sqrt(math.log(2) / 2.0)
        * (2.0 ** b + 1) / (2.0 ** b - 1)
    )


def gabor_kernel(
    frequency, theta=0, bandwidth=1, sigma_x=None, sigma_y=None,
    n_stds=3, offset=0,
):
    """Complex 2D Gabor kernel (skimage parity)."""
    if sigma_x is None:
        sigma_x = _sigma_prefactor(bandwidth) / frequency
    if sigma_y is None:
        sigma_y = _sigma_prefactor(bandwidth) / frequency

    x0 = math.ceil(
        max(abs(n_stds * sigma_x * math.cos(theta)),
            abs(n_stds * sigma_y * math.sin(theta)), 1)
    )
    y0 = math.ceil(
        max(abs(n_stds * sigma_y * math.cos(theta)),
            abs(n_stds * sigma_x * math.sin(theta)), 1)
    )
    y, x = np.mgrid[-y0: y0 + 1, -x0: x0 + 1]
    rotx = x * math.cos(theta) + y * math.sin(theta)
    roty = -x * math.sin(theta) + y * math.cos(theta)

    g = np.exp(
        -0.5 * (rotx ** 2 / sigma_x ** 2 + roty ** 2 / sigma_y ** 2)
    )
    g /= 2 * np.pi * sigma_x * sigma_y
    phase = 2 * np.pi * frequency * rotx + offset
    # transfer real/imag planes separately; combine on device (complex
    # host->device transfers are unavailable on some TPU runtimes)
    return make_complex(g * np.cos(phase), g * np.sin(phase))


def gabor(
    image, frequency, theta=0, bandwidth=1, sigma_x=None, sigma_y=None,
    n_stds=3, offset=0, mode="reflect", cval=0,
):
    """Gabor response: (real, imag) filtered images (skimage parity)."""
    image = jnp.asarray(image)
    g = gabor_kernel(
        frequency, theta, bandwidth, sigma_x, sigma_y, n_stds, offset
    )
    filtered_real = ndi.convolve(
        image.astype(np.float64), jnp.real(g), mode=mode, cval=cval
    )
    filtered_imag = ndi.convolve(
        image.astype(np.float64), jnp.imag(g), mode=mode, cval=cval
    )
    return filtered_real, filtered_imag
