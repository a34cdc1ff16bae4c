"""N-d windows via rotational warping of 1-d windows (skimage.filters
window parity; reference cupyimg/skimage/filters/_window.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import map_coordinates

__all__ = ["window"]


def window(window_type, shape, warp_kwargs=None):
    """Return an n-d window by rotating a 1-d ``scipy.signal.get_window``
    profile (skimage parity)."""
    from scipy.signal import get_window

    if np.isscalar(shape):
        shape = (int(shape),)
    shape = tuple(int(s) for s in shape)
    if any(s < 0 for s in shape):
        raise ValueError("invalid shape")
    ndim = len(shape)
    max_size = max(shape)
    w = jnp.asarray(get_window(window_type, max_size, fftbins=False))

    if ndim == 1:
        if shape[0] == max_size:
            return w
        # resample to requested length via linear interpolation
        coords = jnp.linspace(0, max_size - 1, shape[0])[None]
        return map_coordinates(w, coords, order=1)

    # distance of each pixel from the center in units of the window radius
    L = [jnp.linspace(-(max_size - 1) / 2, (max_size - 1) / 2, s)
         for s in shape]
    grids = jnp.meshgrid(*L, indexing="ij", sparse=True)
    dist2 = None
    for g in grids:
        d = g * g
        dist2 = d if dist2 is None else dist2 + d
    dist = jnp.sqrt(dist2)
    coords = dist + (max_size - 1) / 2
    out = map_coordinates(w, coords[None], order=1, mode="constant", cval=0.0)
    return out
