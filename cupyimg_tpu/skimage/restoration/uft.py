r"""Unitary Fourier transform utilities (reference
cupyimg/skimage/restoration/uft.py).

Orthonormal FFT helpers used by the Wiener-Hunt deconvolution family;
``jnp.fft`` with ``norm="ortho"`` provides the unitary property directly.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .._shared.fft import fftmodule as fft

__keywords__ = "fft, Fourier Transform, orthonormal, unitary"


def _unitary_scale(shape, axes):
    """1/sqrt(N) over the transformed axes, computed on the host.

    jnp's ``norm="ortho"`` path reduces the axis sizes on device (an
    integer reduce that is unavailable on some TPU runtimes); a host
    Python float multiplies in as a plain scalar instead.
    """
    n = 1
    for ax in axes:
        n *= shape[ax]
    return 1.0 / math.sqrt(n)


def ufftn(inarray, dim=None):
    """N-dimensional unitary Fourier transform."""
    inarray = jnp.asarray(inarray)
    if dim is None:
        dim = inarray.ndim
    axes = tuple(range(-dim, 0))
    return fft.fftn(inarray, axes=axes) * _unitary_scale(
        inarray.shape, axes
    )


def uifftn(inarray, dim=None):
    """N-dimensional unitary inverse Fourier transform."""
    inarray = jnp.asarray(inarray)
    if dim is None:
        dim = inarray.ndim
    axes = tuple(range(-dim, 0))
    return fft.ifftn(inarray, axes=axes) / _unitary_scale(
        inarray.shape, axes
    )


def urfftn(inarray, dim=None):
    """N-dimensional real unitary Fourier transform (Hermitian half)."""
    inarray = jnp.asarray(inarray)
    if dim is None:
        dim = inarray.ndim
    axes = tuple(range(-dim, 0))
    return fft.rfftn(inarray, axes=axes) * _unitary_scale(
        inarray.shape, axes
    )


def uirfftn(inarray, dim=None, shape=None):
    """N-dimensional inverse real unitary Fourier transform."""
    inarray = jnp.asarray(inarray)
    if dim is None:
        dim = inarray.ndim
    axes = tuple(range(-dim, 0))
    out = fft.irfftn(inarray, shape, axes=axes)
    return out * (1.0 / _unitary_scale(out.shape, axes))


def ufft2(inarray):
    """2-dimensional unitary Fourier transform (last two axes)."""
    return ufftn(inarray, 2)


def uifft2(inarray):
    """2-dimensional inverse unitary Fourier transform."""
    return uifftn(inarray, 2)


def urfft2(inarray):
    """2-dimensional real unitary Fourier transform."""
    return urfftn(inarray, 2)


def uirfft2(inarray, shape=None):
    """2-dimensional inverse real unitary Fourier transform."""
    return uirfftn(inarray, 2, shape=shape)


def image_quad_norm(inarray):
    """Quadratic norm of images in (possibly Hermitian-half) Fourier
    space (reference uft.py:321-355)."""
    inarray = jnp.asarray(inarray)
    abs_sq = jnp.abs(inarray)
    abs_sq = abs_sq * abs_sq
    if inarray.shape[-1] != inarray.shape[-2]:
        return 2 * jnp.sum(jnp.sum(abs_sq, axis=-1), axis=-1) - jnp.sum(
            jnp.abs(inarray[..., 0]) ** 2, axis=-1
        )
    else:
        return jnp.sum(jnp.sum(abs_sq, axis=-1), axis=-1)


def ir2tf(imp_resp, shape, dim=None, is_real=True):
    """Transfer function of an impulse response: zero-pad, center-roll,
    FFT (reference uft.py:358-421)."""
    imp_resp = jnp.asarray(imp_resp)
    if not dim:
        dim = imp_resp.ndim
    irpadded = jnp.zeros(shape, dtype=imp_resp.dtype)
    irpadded = irpadded.at[
        tuple([slice(0, s) for s in imp_resp.shape])
    ].set(imp_resp)
    for axis, axis_size in enumerate(imp_resp.shape):
        if axis >= imp_resp.ndim - dim:
            irpadded = jnp.roll(
                irpadded, shift=-math.floor(axis_size / 2), axis=axis
            )
    if is_real:
        return fft.rfftn(irpadded, axes=range(-dim, 0))
    else:
        return fft.fftn(irpadded, axes=range(-dim, 0))


def laplacian(ndim, shape, is_real=True):
    """Transfer function + impulse response of the Laplacian
    (reference uft.py:424-467)."""
    impr = np.zeros([3] * ndim)
    for dim in range(ndim):
        idx = tuple(
            [slice(1, 2)] * dim
            + [slice(None)]
            + [slice(1, 2)] * (ndim - dim - 1)
        )
        impr[idx] = np.array([-1.0, 0.0, -1.0]).reshape(
            [-1 if i == dim else 1 for i in range(ndim)]
        )
    impr[(slice(1, 2),) * ndim] = 2.0 * ndim
    impr = jnp.asarray(impr)
    return ir2tf(impr, shape, is_real=is_real), impr
