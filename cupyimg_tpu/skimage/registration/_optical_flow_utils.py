"""Common tools for optical flow (reference
cupyimg/skimage/registration/_optical_flow_utils.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.transform import pyramid_reduce
from cupyimg_tpu.skimage.util.dtype import _convert
from cupyimg_tpu.scipy import ndimage as ndi


def get_warp_points(grid, flow):
    """Warp point coordinates: grid + flow."""
    return jnp.stack(
        [flow[i] + g for i, g in enumerate(grid)], axis=0
    )


def resize_flow(flow, shape):
    """Rescale a vector field to a new shape, scaling the vector values
    accordingly (reference _optical_flow_utils.py:37-68)."""
    scale = [n / o for n, o in zip(shape, flow.shape[1:])]
    scale_factor = jnp.asarray(scale, dtype=flow.dtype)

    for _ in shape:
        scale_factor = scale_factor[..., jnp.newaxis]

    rflow = scale_factor * ndi.zoom(
        flow, [1] + scale, order=0, mode="nearest", prefilter=False
    )
    return rflow


def get_pyramid(I, downscale=2.0, nlevel=10, min_size=16):
    """Coarse-to-fine image pyramid (reference
    _optical_flow_utils.py:70-101)."""
    pyramid = [I]
    size = min(I.shape)
    count = 1

    while (count < nlevel) and (size > downscale * min_size):
        J = pyramid_reduce(pyramid[-1], downscale, multichannel=False)
        pyramid.append(J)
        size = min(J.shape)
        count += 1

    return pyramid[::-1]


def coarse_to_fine(
    I0, I1, solver, downscale=2, nlevel=10, min_size=16,
    dtype=np.float32,
):
    """Generic coarse-to-fine solver driver (reference
    _optical_flow_utils.py:104-156)."""
    I0 = jnp.asarray(I0)
    I1 = jnp.asarray(I1)
    if I0.shape != I1.shape:
        raise ValueError("Input images should have the same shape")

    if np.dtype(dtype).char not in "efdg":
        raise ValueError(
            "Only floating point data type are valid for optical flow"
        )

    pyramid = list(
        zip(
            get_pyramid(_convert(I0, dtype), downscale, nlevel, min_size),
            get_pyramid(_convert(I1, dtype), downscale, nlevel, min_size),
        )
    )

    # Initialization to 0 at coarsest level.
    flow = jnp.zeros(
        (pyramid[0][0].ndim,) + pyramid[0][0].shape, dtype=dtype
    )

    flow = solver(pyramid[0][0], pyramid[0][1], flow)

    for J0, J1 in pyramid[1:]:
        flow = solver(J0, J1, resize_flow(flow, J0.shape))

    return flow
