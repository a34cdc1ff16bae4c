"""profile_line (reference cupyimg/skimage/measure/profile.py).

The scan-line sample grid is built in closed form and evaluated with one
fused ``map_coordinates`` gather (SURVEY.md N4).
"""

from __future__ import annotations

import math
from warnings import warn

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
import cupyimg_tpu.numpy as cnp
from .._shared.utils import _validate_interpolation_order

__all__ = ["profile_line"]


def profile_line(
    image,
    src,
    dst,
    linewidth=1,
    order=None,
    mode=None,
    cval=0.0,
    *,
    reduce_func=jnp.mean,
):
    """Intensity profile of an image along a scan line (skimage parity;
    reference profile.py:11-155).  The destination point is included."""
    image = jnp.asarray(image)
    order = _validate_interpolation_order(image.dtype, order)

    if mode is None:
        warn(
            "Default out of bounds interpolation mode 'constant' is "
            "deprecated. In version 0.19 it will be set to 'reflect'. "
            "To avoid this warning, set `mode=` explicitly.",
            FutureWarning,
            stacklevel=2,
        )
        mode = "constant"

    perp_lines = _line_profile_coordinates(src, dst, linewidth=linewidth)
    if image.ndim == 3:
        pixels = [
            ndi.map_coordinates(
                image[..., i],
                perp_lines,
                prefilter=order > 1,
                order=order,
                mode=mode,
                cval=cval,
            )
            for i in range(image.shape[2])
        ]
        pixels = jnp.transpose(jnp.asarray(pixels), (1, 2, 0))
    else:
        pixels = ndi.map_coordinates(
            image,
            perp_lines,
            prefilter=order > 1,
            order=order,
            mode=mode,
            cval=cval,
        )
    # flip row values (axis=1) for consistency (reference profile.py:142-145)
    pixels = jnp.flip(pixels, axis=1)

    if reduce_func is None:
        intensities = pixels
    else:
        try:
            intensities = reduce_func(pixels, axis=1)
        except TypeError:  # function doesn't allow axis kwarg
            intensities = cnp.apply_along_axis(
                reduce_func, arr=pixels, axis=1
            )

    return intensities


def _line_profile_coordinates(src, dst, linewidth=1):
    """Coordinates of the scan-line sample grid, shape (2, N, linewidth)
    (reference profile.py:157-209)."""
    src_row, src_col = (float(v) for v in src)
    dst_row, dst_col = (float(v) for v in dst)
    d_row = dst_row - src_row
    d_col = dst_col - src_col
    theta = math.atan2(d_row, d_col)

    length = int(math.ceil(math.hypot(d_row, d_col) + 1))
    # add one above to include the last point in the profile
    line_col = jnp.linspace(src_col, dst_col, length)
    line_row = jnp.linspace(src_row, dst_row, length)

    # subtract 1 from linewidth to change from pixel-counting to
    # point-center distances
    col_width = (linewidth - 1) * math.sin(-theta) / 2
    row_width = (linewidth - 1) * math.cos(theta) / 2
    # vectorized equivalent of the reference's per-point linspace stacks
    frac = (
        jnp.linspace(-1.0, 1.0, linewidth)
        if linewidth > 1
        else jnp.zeros(1)
    )
    perp_rows = line_row[:, None] + frac[None, :] * row_width
    perp_cols = line_col[:, None] + frac[None, :] * col_width
    return jnp.stack([perp_rows, perp_cols])
