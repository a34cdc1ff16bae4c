"""scipy.ndimage Fourier-domain filters (reference cupyimg/scipy/ndimage/
fourier.py, SURVEY.md C11): multiply an FFT-domain array by a separable
frequency response — pure jnp, rides XLA FFT-domain math (no kernels)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.core import util

__all__ = [
    "fourier_gaussian",
    "fourier_uniform",
    "fourier_shift",
    "fourier_ellipsoid",
]


def _get_fft_axes(x, n, axis):
    """Per-axis frequency grids honoring scipy's real-transform convention:
    if n >= 0, the ``axis`` dimension holds an rfft of length n."""
    ndim = x.ndim
    axis = util.check_axis(axis, ndim)
    freqs = []
    for ax in range(ndim):
        size = x.shape[ax]
        if ax == axis and n > 0:
            f = jnp.arange(size, dtype=np.float64) / n
        else:
            f = jnp.fft.fftfreq(size)
        shape = [1] * ndim
        shape[ax] = size
        freqs.append(f.reshape(shape))
    return freqs


def _output_dtype(x):
    """scipy's _get_output_fourier: single precision is preserved,
    everything else promotes to double (complex or real)."""
    dt = np.dtype(x.dtype)
    if dt == np.complex64 or dt == np.float32:
        return dt
    if dt.kind == "c":
        return np.dtype(np.complex128)
    return np.dtype(np.float64)


def fourier_gaussian(input, sigma, n=-1, axis=-1, output=None):
    """Multiply by a Gaussian frequency response (scipy parity)."""
    x = jnp.asarray(input)
    sigmas = util.fix_sequence_arg(sigma, x.ndim, "sigma", float)
    dt = _output_dtype(x)
    out = x
    for f, s in zip(_get_fft_axes(x, n, axis), sigmas):
        # response math in f64 (scipy's C loop does the same), one cast at
        # the end so single-precision inputs stay single precision
        out = out * jnp.exp(-2.0 * (np.pi * s) ** 2 * f * f)
    return out.astype(dt)


def fourier_uniform(input, size, n=-1, axis=-1, output=None):
    """Multiply by a box-filter frequency response (scipy parity)."""
    x = jnp.asarray(input)
    sizes = util.fix_sequence_arg(size, x.ndim, "size", float)
    dt = _output_dtype(x)
    out = x
    for f, s in zip(_get_fft_axes(x, n, axis), sizes):
        out = out * jnp.sinc(f * s)
    return out.astype(dt)


def fourier_shift(input, shift, n=-1, axis=-1, output=None):
    """Multiply by a shift phase ramp (scipy parity)."""
    x = jnp.asarray(input)
    shifts = util.fix_sequence_arg(shift, x.ndim, "shift", float)
    # scipy's complex-output variant: complex64 is preserved, everything
    # else promotes to complex128
    cplx = (np.dtype(np.complex64) if np.dtype(x.dtype) == np.complex64
            else np.dtype(np.complex128))
    out = x
    for f, s in zip(_get_fft_axes(x, n, axis), shifts):
        out = out * jnp.exp(-2j * np.pi * s * f)
    return out.astype(cplx)


def fourier_ellipsoid(input, size, n=-1, axis=-1, output=None):
    """Multiply by an ellipsoid frequency response (scipy parity; 1-3 dims).

    Uses the radial sinc/jinc forms of the ellipsoid FT as scipy does.
    """
    x = jnp.asarray(input)
    if x.ndim > 3:
        raise NotImplementedError("only 1-3 dimensions are supported")
    if x.size == 0:
        return x.astype(_output_dtype(x))
    sizes = util.fix_sequence_arg(size, x.ndim, "size", float)
    freqs = _get_fft_axes(x, n, axis)
    dt = _output_dtype(x)
    out = x
    # radial coordinate of the scaled frequency vector
    r2 = None
    for f, s in zip(freqs, sizes):
        term = (f * s) ** 2
        r2 = term if r2 is None else r2 + term
    r = jnp.sqrt(r2) * np.pi
    if x.ndim == 1:
        resp = jnp.sinc(r / np.pi)
    elif x.ndim == 2:
        # jinc: 2*J1(z)/z with J1 via series/asymptotic — use jax.scipy
        from jax.scipy.special import bessel_jn

        z = jnp.where(r == 0, 1e-20, r)
        j1 = bessel_jn(z.ravel(), v=1, n_iter=50)[1].reshape(z.shape)
        resp = jnp.where(r == 0, 1.0, 2.0 * j1 / z)
    else:
        z = jnp.where(r == 0, 1e-20, r)
        resp = jnp.where(
            r == 0, 1.0, 3.0 * (jnp.sin(z) - z * jnp.cos(z)) / (z ** 3)
        )
    return (out * resp).astype(dt)
