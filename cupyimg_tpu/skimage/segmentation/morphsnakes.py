"""Morphological snakes: MorphACWE and MorphGAC (reference
cupyimg/skimage/segmentation/morphsnakes.py).

Per-iteration updates are functional jnp expressions (masked in-place
assignments become selects); the curvature operator alternates
sup_inf/inf_sup exactly as in the reference.
"""

from __future__ import annotations

import functools
from itertools import cycle

import numpy as np
import jax
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
import cupyimg_tpu.numpy as cnp
from .._shared.utils import check_nD

__all__ = [
    "morphological_chan_vese",
    "morphological_geodesic_active_contour",
    "inverse_gaussian_gradient",
    "circle_level_set",
    "disk_level_set",
    "checkerboard_level_set",
]


class _fcycle(object):
    def __init__(self, iterable):
        """Call functions from the iterable each time it is called."""
        self.funcs = cycle(iterable)

    def __call__(self, *args, **kwargs):
        f = next(self.funcs)
        return f(*args, **kwargs)


# SI and IS structuring lines for 2D and 3D (reference
# morphsnakes.py:32-49)
_P2 = [
    np.eye(3),
    np.array([[0, 1, 0]] * 3),
    np.flipud(np.eye(3)),
    np.rot90([[0, 1, 0]] * 3),
]
_P3 = [np.zeros((3, 3, 3)) for i in range(9)]

_P3[0][:, :, 1] = 1
_P3[1][:, 1, :] = 1
_P3[2][1, :, :] = 1
_P3[3][:, [0, 1, 2], [0, 1, 2]] = 1
_P3[4][:, [0, 1, 2], [2, 1, 0]] = 1
_P3[5][[0, 1, 2], :, [0, 1, 2]] = 1
_P3[6][[0, 1, 2], :, [2, 1, 0]] = 1
_P3[7][[0, 1, 2], [0, 1, 2], :] = 1
_P3[8][[0, 1, 2], [2, 1, 0], :] = 1


def _get_P(u):
    if u.ndim == 2:
        return _P2
    elif u.ndim == 3:
        return _P3
    raise ValueError(
        "u has an invalid number of dimensions (should be 2 or 3)"
    )


def sup_inf(u):
    """SI operator: max over line-erosions."""
    P = _get_P(u)
    erosions = [
        ndi.binary_erosion(u, P_i).astype(np.int8) for P_i in P
    ]
    return jnp.stack(erosions, axis=0).max(0)


def inf_sup(u):
    """IS operator: min over line-dilations."""
    P = _get_P(u)
    dilations = [
        ndi.binary_dilation(u, P_i).astype(np.int8) for P_i in P
    ]
    return jnp.stack(dilations, axis=0).min(0)


_curvop = _fcycle(
    [lambda u: sup_inf(inf_sup(u)), lambda u: inf_sup(sup_inf(u))]
)


def _curvop_parity(u, parity):
    """Alternating SIoIS / ISoSI keyed by an explicit (traced) parity,
    so the smoothing schedule stays jittable."""
    from jax import lax as _lax

    return _lax.cond(
        parity == 0,
        lambda v: sup_inf(inf_sup(v)),
        lambda v: inf_sup(sup_inf(v)),
        u,
    )


def _is_noop_callback(cb):
    try:
        return (
            getattr(cb, "__name__", "") == "<lambda>"
            and cb.__code__.co_code == (lambda x: None).__code__.co_code
        )
    except Exception:
        return False


def _check_input(image, init_level_set):
    """Check that shapes of `image` and `init_level_set` match."""
    check_nD(image, [2, 3])
    if len(image.shape) != len(init_level_set.shape):
        raise ValueError(
            "The dimensions of the initial level set do not "
            "match the dimensions of the image."
        )


def _init_level_set(init_level_set, image_shape):
    """Initialize a level set from a string name or pass through."""
    if isinstance(init_level_set, str):
        if init_level_set == "checkerboard":
            res = checkerboard_level_set(image_shape)
        elif init_level_set in ("circle", "disk"):
            res = disk_level_set(image_shape)
        else:
            raise ValueError(
                "`init_level_set` not in "
                "['checkerboard', 'circle', 'disk']"
            )
    else:
        res = init_level_set
    return res


def circle_level_set(image_shape, center=None, radius=None):
    """Deprecated alias of :func:`disk_level_set`."""
    import warnings

    warnings.warn(
        "circle_level_set is deprecated in favor of disk_level_set."
        "circle_level_set will be removed in version 0.19",
        FutureWarning,
        stacklevel=2,
    )
    return disk_level_set(image_shape, center=center, radius=radius)


def disk_level_set(image_shape, center=None, radius=None):
    """Binary disk level set (reference morphsnakes.py:166-199)."""
    if center is None:
        center = tuple(i // 2 for i in image_shape)
    if radius is None:
        radius = min(image_shape) * 3.0 / 8.0

    grid = jnp.mgrid[[slice(i) for i in image_shape]]
    grid = (grid.T - jnp.asarray(center)).T
    phi = radius - jnp.sqrt(jnp.sum(grid**2, 0))
    return (phi > 0).astype(np.int8)


def checkerboard_level_set(image_shape, square_size=5):
    """Binary checkerboard level set (reference
    morphsnakes.py:202-230)."""
    grid = jnp.mgrid[[slice(i) for i in image_shape]]
    grid = grid // square_size
    grid = grid & 1
    checkerboard = functools.reduce(jnp.bitwise_xor, [g for g in grid])
    return checkerboard.astype(np.int8)


def inverse_gaussian_gradient(image, alpha=100.0, sigma=5.0):
    """1 / sqrt(1 + alpha * |grad(gaussian(image))|) border indicator
    (reference morphsnakes.py:233-261)."""
    gradnorm = ndi.gaussian_gradient_magnitude(
        image, sigma, mode="nearest"
    )
    return 1.0 / jnp.sqrt(1.0 + alpha * gradnorm)


def morphological_chan_vese(
    image,
    iterations,
    init_level_set="checkerboard",
    smoothing=1,
    lambda1=1,
    lambda2=1,
    iter_callback=lambda x: None,
):
    """Morphological Active Contours without Edges (MorphACWE),
    skimage parity (reference morphsnakes.py:264-356)."""
    image = jnp.asarray(image)
    init_level_set = _init_level_set(init_level_set, image.shape)
    _check_input(image, init_level_set)

    u = (jnp.asarray(init_level_set) > 0).astype(np.int8)
    iter_callback(u)

    def step(u, parity):
        uf = u.astype(image.dtype)
        c0 = (image * (1 - uf)).sum() / ((1 - uf).sum() + 1e-8)
        c1 = (image * uf).sum() / (uf.sum() + 1e-8)

        # Image attachment
        du = cnp.gradient(uf)
        abs_du = jnp.abs(jnp.stack(du, axis=0)).sum(0)
        aux = abs_du * (
            lambda1 * (image - c1) ** 2 - lambda2 * (image - c0) ** 2
        )

        u = jnp.where(aux < 0, np.int8(1), u)
        u = jnp.where(aux > 0, np.int8(0), u)

        for _ in range(smoothing):
            u = _curvop_parity(u, parity)
            parity = (parity + 1) % 2
        return u, parity

    # default callback (a no-op lambda): run every iteration inside one
    # jitted fori_loop — a single dispatch instead of dozens per step
    is_noop = _is_noop_callback(iter_callback)
    if is_noop and iterations > 0:
        from jax import lax as _lax

        def body(_, carry):
            return step(*carry)

        u, _ = jax.jit(
            lambda u0: _lax.fori_loop(
                0, iterations, body, (u0, jnp.int32(0))
            )
        )(u)
        return u

    parity = jnp.int32(0)
    for _ in range(iterations):
        u, parity = step(u, parity)
        iter_callback(u)

    return u


def morphological_geodesic_active_contour(
    gimage,
    iterations,
    init_level_set="circle",
    smoothing=1,
    threshold="auto",
    balloon=0,
    iter_callback=lambda x: None,
):
    """Morphological Geodesic Active Contours (MorphGAC), skimage
    parity (reference morphsnakes.py:359-487)."""
    image = jnp.asarray(gimage)
    init_level_set = _init_level_set(init_level_set, image.shape)
    _check_input(image, init_level_set)

    if threshold == "auto":
        threshold = float(jnp.percentile(image, 40))

    structure = np.ones((3,) * image.ndim, dtype=np.int8)
    dimage = cnp.gradient(image)
    if balloon != 0:
        threshold_mask_balloon = image > threshold / np.abs(balloon)

    u = (jnp.asarray(init_level_set) > 0).astype(np.int8)
    iter_callback(u)

    def step(u, parity):
        # Balloon
        if balloon > 0:
            aux_b = ndi.binary_dilation(u, structure)
        elif balloon < 0:
            aux_b = ndi.binary_erosion(u, structure)
        if balloon != 0:
            u = jnp.where(
                threshold_mask_balloon, aux_b.astype(np.int8), u
            )

        # Image attachment
        du = cnp.gradient(u.astype(image.dtype))
        aux = sum(el1 * el2 for el1, el2 in zip(dimage, du))
        u = jnp.where(aux > 0, np.int8(1), u)
        u = jnp.where(aux < 0, np.int8(0), u)

        for _ in range(smoothing):
            u = _curvop_parity(u, parity)
            parity = (parity + 1) % 2
        return u, parity

    if _is_noop_callback(iter_callback) and iterations > 0:
        from jax import lax as _lax

        def body(_, carry):
            return step(*carry)

        u, _ = jax.jit(
            lambda u0: _lax.fori_loop(
                0, iterations, body, (u0, jnp.int32(0))
            )
        )(u)
        return u

    parity = jnp.int32(0)
    for _ in range(iterations):
        u, parity = step(u, parity)
        iter_callback(u)

    return u
