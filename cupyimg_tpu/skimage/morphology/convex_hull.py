"""Convex hull of a binary image.

The reference has no own implementation — its regionprops round-trips
through CPU ``skimage.morphology.convex_hull_image``
(cupyimg/skimage/measure/_regionprops.py:329-338).  Here the hull *facets*
are found on the host from the tiny set of boundary-pixel corner points
(scipy.spatial.ConvexHull), and the rasterization — the expensive part —
is a fused half-plane test over the pixel grid on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["convex_hull_image"]


def _offsets_diamond(ndim):
    """+-0.5 offsets along each axis (pixel corner extent)."""
    offsets = np.zeros((2 * ndim, ndim))
    for vertex, (axis, offset) in enumerate(
        ((a, o) for a in range(ndim) for o in (-0.5, 0.5))
    ):
        offsets[vertex, axis] = offset
    return offsets


def convex_hull_image(image, offset_coordinates=True, tolerance=1e-10):
    """Binary convex hull image: smallest convex set containing all
    foreground pixels (skimage parity)."""
    image = np.asarray(image) != 0
    if image.ndim < 2:
        raise ValueError("Input must be at least 2-D")
    coords = np.argwhere(image).astype(float)
    if coords.shape[0] == 0:
        return jnp.zeros(image.shape, dtype=bool)

    if offset_coordinates:
        offsets = _offsets_diamond(image.ndim)
        coords = (coords[:, None, :] + offsets).reshape(-1, image.ndim)

    try:
        from scipy.spatial import ConvexHull, QhullError
    except ImportError:  # pragma: no cover
        from scipy.spatial import ConvexHull
        from scipy.spatial.qhull import QhullError

    try:
        hull = ConvexHull(coords)
    except QhullError:
        # degenerate (e.g. collinear points): hull is the points
        out = np.zeros(image.shape, dtype=bool)
        pts = np.argwhere(image)
        out[tuple(pts.T)] = True
        return jnp.asarray(out)

    # facet equations A @ x + b <= 0 for interior points
    equations = hull.equations  # (n_facets, ndim + 1)
    A = jnp.asarray(equations[:, :-1])
    b = jnp.asarray(equations[:, -1])

    # fused half-plane test over the pixel-center grid
    dots = jnp.zeros((1,) * image.ndim + (A.shape[0],))
    for ax in range(image.ndim):
        shape = [1] * image.ndim + [1]
        shape[ax] = image.shape[ax]
        coord = jnp.arange(image.shape[ax], dtype=float).reshape(shape)
        dots = dots + coord * A[:, ax]
    mask = jnp.all(dots + b < tolerance, axis=-1)
    return mask
