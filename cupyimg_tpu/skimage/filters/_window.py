"""N-d windows via rotational warping of 1-d windows (skimage.filters
window parity; reference cupyimg/skimage/filters/_window.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import map_coordinates

__all__ = ["window"]


def window(window_type, shape, warp_kwargs=None):
    """Return an n-d window by rotating a 1-d ``scipy.signal.get_window``
    profile (skimage parity).

    Follows the reference construction exactly (_window.py:100-131):
    per-axis coordinates ``arange(s) * (max_size / s)`` about the center
    ``max_size/2 - 0.5`` — the interval-ratio stretch keeps anisotropic
    axes at matching amplitude profiles — then the Euclidean distance
    samples the 1-d window with interpolation."""
    from scipy.signal import get_window

    from cupyimg_tpu.skimage._shared.utils import safe_as_int

    if np.isscalar(shape):
        shape = (int(safe_as_int(shape)),)
    else:
        shape = tuple(int(v) for v in np.atleast_1d(safe_as_int(shape)))
    if any(s < 0 for s in shape):
        raise ValueError("invalid shape")
    ndim = len(shape)
    if ndim <= 0:
        raise ValueError("Number of dimensions must be greater than zero")

    max_size = max(shape)
    w = jnp.asarray(get_window(window_type, max_size, fftbins=False))

    center = max_size / 2 - 0.5
    L = [
        jnp.arange(s, dtype=jnp.float32) * (max_size / s) - center
        for s in shape
    ]
    grids = jnp.meshgrid(*L, indexing="ij", sparse=True)
    dist2 = None
    for g in grids:
        d = g * g
        dist2 = d if dist2 is None else dist2 + d
    coords = jnp.sqrt(dist2) + center
    if warp_kwargs is None:
        warp_kwargs = {}
    # the reference forwards **warp_kwargs to transform.warp and lets it
    # raise on unknown keys; mirror that fail-loud contract for the
    # interpolation kwargs our map_coordinates sampling understands
    unknown = set(warp_kwargs) - {"order", "mode", "cval", "prefilter"}
    if unknown:
        raise TypeError(
            "window() got unsupported warp_kwargs keys: "
            + ", ".join(sorted(unknown))
        )
    order = int(warp_kwargs.get("order", 1))
    return map_coordinates(
        w,
        coords[None],
        order=order,
        mode=warp_kwargs.get("mode", "constant"),
        cval=warp_kwargs.get("cval", 0.0),
        prefilter=warp_kwargs.get("prefilter", True),
    )
