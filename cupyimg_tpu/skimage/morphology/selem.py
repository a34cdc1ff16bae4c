"""Structuring-element generators (reference
cupyimg/skimage/morphology/selem.py).

Selems are tiny; they are generated with closed-form NumPy index math on the
host (the reference does the same, selem.py:93 "faster to generate it in
NumPy") and returned as device arrays.  The reference's ``ellipse``,
``octagon`` and ``star`` rely on CPU skimage ``draw``/``convex_hull_image``
(selem.py:166-180, 280-305, 330-360); here the same point sets are produced
directly from their half-plane descriptions, so there is no CPU-skimage
dependency.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "square",
    "rectangle",
    "diamond",
    "disk",
    "ellipse",
    "cube",
    "octahedron",
    "ball",
    "octagon",
    "star",
]


def square(width, dtype=np.uint8):
    """Flat, square-shaped structuring element (all ones)."""
    return jnp.ones((width, width), dtype=dtype)


def rectangle(nrows, ncols, dtype=np.uint8):
    """Flat, rectangular-shaped structuring element (all ones)."""
    return jnp.ones((nrows, ncols), dtype=dtype)


def diamond(radius, dtype=np.uint8):
    """Flat, diamond-shaped selem: city-block distance <= radius."""
    L = np.arange(0, radius * 2 + 1)
    I, J = np.meshgrid(L, L, sparse=True, indexing="ij")
    return jnp.asarray(
        np.abs(I - radius) + np.abs(J - radius) <= radius, dtype=dtype
    )


def disk(radius, dtype=np.uint8):
    """Flat, disk-shaped selem: Euclidean distance <= radius."""
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L, sparse=True, indexing="ij")
    return jnp.asarray((X * X + Y * Y) <= radius * radius, dtype=dtype)


def ellipse(width, height, dtype=np.uint8):
    """Flat, ellipse-shaped selem of shape (2*height+1, 2*width+1).

    Matches skimage ``draw.ellipse(height, width, height + 1, width + 1)``
    (reference selem.py:166-173): interior points of the ellipse centred at
    (height, width) with radii (height+1, width+1), strict inequality.
    """
    r = np.arange(2 * height + 1)[:, None]
    c = np.arange(2 * width + 1)[None, :]
    inside = ((r - height) / (height + 1.0)) ** 2 + (
        (c - width) / (width + 1.0)
    ) ** 2 < 1.0
    return jnp.asarray(inside, dtype=dtype)


def cube(width, dtype=np.uint8):
    """Cube-shaped (3-D) structuring element (all ones)."""
    return jnp.ones((width, width, width), dtype=dtype)


def octahedron(radius, dtype=np.uint8):
    """Octahedron-shaped (3-D) selem: city-block distance <= radius."""
    n = 2 * radius + 1
    Z, Y, X = np.ogrid[
        -radius : radius : n * 1j,
        -radius : radius : n * 1j,
        -radius : radius : n * 1j,
    ]
    s = np.abs(X) + np.abs(Y) + np.abs(Z)
    return jnp.asarray(s <= radius, dtype=dtype)


def ball(radius, dtype=np.uint8):
    """Ball-shaped (3-D) selem: Euclidean distance <= radius."""
    n = 2 * radius + 1
    Z, Y, X = np.ogrid[
        -radius : radius : n * 1j,
        -radius : radius : n * 1j,
        -radius : radius : n * 1j,
    ]
    s = X * X + Y * Y + Z * Z
    return jnp.asarray(s <= radius * radius, dtype=dtype)


def octagon(m, n, dtype=np.uint8):
    """Octagon-shaped selem: m-long axis sides, n-long 45-degree sides.

    The reference builds this as the convex hull of the 8 octagon vertices
    (selem.py:280-305); that hull is exactly the square grid minus the four
    n-deep corner triangles, i.e. the four half-planes
    ``i + j >= n`` (and symmetric counterparts).
    """
    s = m + 2 * n
    i = np.arange(s)[:, None]
    j = np.arange(s)[None, :]
    inside = (
        (i + j >= n)
        & ((s - 1 - i) + j >= n)
        & (i + (s - 1 - j) >= n)
        & ((s - 1 - i) + (s - 1 - j) >= n)
    )
    return jnp.asarray(inside, dtype=dtype)


def star(a, dtype=np.uint8):
    """Star-shaped selem: union of a square with its 45-degree rotation.

    The rotated square in the reference (selem.py:330-360) is the convex
    hull of the 4 edge midpoints, i.e. the diamond
    ``|i - c| + |j - c| <= c`` with ``c = (m + 2n - 1) // 2``.
    """
    if a == 1:
        return jnp.ones((3, 3), dtype=dtype)
    m = 2 * a + 1
    n = a // 2
    s = m + 2 * n
    c = (s - 1) // 2
    i = np.arange(s)[:, None]
    j = np.arange(s)[None, :]
    axis_square = (i >= n) & (i < m + n) & (j >= n) & (j < m + n)
    diamond_sq = np.abs(i - c) + np.abs(j - c) <= c
    return jnp.asarray(axis_square | diamond_sq, dtype=dtype)


def _default_selem(ndim):
    """Cross-shaped selem (connectivity=1), the default for morphology."""
    from cupyimg_tpu.scipy import ndimage as ndi

    return ndi.generate_binary_structure(ndim, 1)
