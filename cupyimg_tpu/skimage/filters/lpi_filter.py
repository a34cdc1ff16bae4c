"""Linear position-invariant FFT filtering (skimage.filters parity;
reference cupyimg/skimage/filters/lpi_filter.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage._shared.utils import check_shape_equality
from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = ["LPIFilter2D", "inverse", "wiener", "filter_forward", "forward"]

eps = np.finfo(float).eps


def _min_limit(x, val=eps):
    return jnp.where(jnp.abs(x) < val, jnp.sign(x) * val + (x == 0) * val, x)


def _center(x, oshape):
    """Return the center ``oshape`` portion of ``x``."""
    start = (np.array(x.shape) - np.array(oshape)) // 2 + 1
    out = x[tuple(slice(s, s + o) for s, o in zip(start, oshape))]
    return out


def _pad(data, shape):
    """Zero-pad ``data`` to ``shape`` (top-left anchored)."""
    out = jnp.zeros(shape, dtype=data.dtype)
    out = out.at[tuple(slice(0, s) for s in data.shape)].set(data)
    return out


class LPIFilter2D:
    """Linear position-invariant filter defined by an impulse-response
    function of (row, column) offsets (skimage parity)."""

    def __init__(self, impulse_response, **filter_params):
        if impulse_response is None:
            raise ValueError("Impulse response must be a callable.")
        self.impulse_response = impulse_response
        self.filter_params = filter_params
        self._cache = None

    def _prepare(self, data):
        dshape = np.array(data.shape)
        dshape += dshape % 2 == 0  # odd
        oshape = np.array(data.shape) * 2 - 1
        if self._cache is None or np.any(self._cache.shape != oshape):
            coords = np.mgrid[
                [slice(0, float(n)) for n in dshape]
            ]
            for k, coord in enumerate(coords):
                coord -= (dshape[k] - 1) / 2.0
            coords = coords.reshape(2, -1).T  # (row, col)
            f = self.impulse_response(
                jnp.asarray(coords[:, 0]), jnp.asarray(coords[:, 1]),
                **self.filter_params
            ).reshape(tuple(dshape))
            f = _pad(f, tuple(oshape))
            F = jnp.fft.fftn(f)
            self._cache = F
        else:
            F = self._cache
        data = _pad(data, tuple(oshape))
        G = jnp.fft.fftn(data)
        return F, G

    def __call__(self, data):
        F, G = self._prepare(jnp.asarray(data))
        out = jnp.fft.ifftn(F * G).real
        out = _center(out, data.shape)
        return out


def filter_forward(data, impulse_response=None, filter_params=None,
                   predefined_filter=None):
    """Apply an LPI filter (skimage's forward; parity)."""
    if filter_params is None:
        filter_params = {}
    if predefined_filter is None:
        predefined_filter = LPIFilter2D(impulse_response, **filter_params)
    return predefined_filter(data)


# reference-era name (reference lpi_filter.py:126); newer skimage calls
# this filter_forward
forward = filter_forward


def inverse(data, impulse_response=None, filter_params=None, max_gain=2,
            predefined_filter=None):
    """Inverse filtering with gain limiting (skimage parity)."""
    if filter_params is None:
        filter_params = {}
    if predefined_filter is None:
        filt = LPIFilter2D(impulse_response, **filter_params)
    else:
        filt = predefined_filter
    F, G = filt._prepare(jnp.asarray(data))
    F = _min_limit(F)
    F = jnp.conj(F) / (jnp.abs(F) ** 2)
    mask = jnp.abs(F) > max_gain
    F = jnp.where(mask, jnp.sign(F) * max_gain, F)
    return _center(jnp.fft.ifftn(G * F).real, data.shape)


def wiener(data, impulse_response=None, filter_params=None, K=0.25,
           predefined_filter=None):
    """Minimum-MSE (Wiener) inverse filtering (skimage parity)."""
    if filter_params is None:
        filter_params = {}
    if not isinstance(K, float):
        raise ValueError("K must be a float")
    if predefined_filter is None:
        filt = LPIFilter2D(impulse_response, **filter_params)
    else:
        filt = predefined_filter
    F, G = filt._prepare(jnp.asarray(data))
    F = _min_limit(F)
    H_mag_sqr = jnp.abs(F) ** 2
    F = 1 / F * H_mag_sqr / (H_mag_sqr + K)
    return _center(jnp.fft.ifftn(G * F).real, data.shape)


# `forward` is the reference's name for filter_forward
# (reference lpi_filter.py:126-161)
forward = filter_forward


def constrained_least_squares(data, lam, impulse_response=None,
                              filter_params=None):
    raise NotImplementedError
