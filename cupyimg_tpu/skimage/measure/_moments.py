"""Image moments (reference cupyimg/skimage/measure/_moments.py).

``moments_central`` contracts the image against per-axis Vandermonde
matrices (``calc @ powers_of_delta``), which XLA maps straight onto the MXU;
this is the same factorization the reference uses (its _moments.py:246-256).
Hu moments are computed with the closed-form invariants instead of the
reference's CPU-skimage round-trip (_moments.py:385-390).
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from .._shared.utils import check_shape_equality  # noqa: F401  (API parity)

__all__ = [
    "moments",
    "moments_central",
    "moments_coords",
    "moments_coords_central",
    "moments_normalized",
    "moments_hu",
    "centroid",
    "inertia_tensor",
    "inertia_tensor_eigvals",
]


def _check_2d(coords):
    if coords.ndim != 2:
        raise ValueError("coords must be a (N, D) array of points")


def moments_coords(coords, order=3):
    """Raw image moments of a point cloud, up to ``order``."""
    return moments_coords_central(coords, 0, order=order)


def moments_coords_central(coords, center=None, order=3):
    """Central image moments of a point cloud, up to ``order``
    (reference _moments.py:49-152)."""
    if isinstance(coords, tuple):
        coords = jnp.column_stack(coords)
    coords = jnp.asarray(coords)
    _check_2d(coords)
    ndim = coords.shape[1]
    if center is None:
        center = jnp.mean(coords, axis=0)
    else:
        center = jnp.asarray(center)

    coords = coords.astype(float) - center

    # (order+1, D, N) tensor of per-axis coordinate powers
    coords = coords.T
    powers = jnp.arange(order + 1)[:, None, None]
    coords = coords[None, ...] ** powers

    coords = coords.reshape((1,) * (ndim - 1) + coords.shape)
    calc = jnp.moveaxis(coords[..., 0, :], -2, 0)
    for axis in range(1, ndim):
        isolated_axis = coords[..., axis, :]
        isolated_axis = jnp.moveaxis(isolated_axis, -2, axis)
        calc = calc * isolated_axis
    return jnp.sum(calc, axis=-1)


def moments(image, order=3):
    """Raw image moments up to ``order`` (reference _moments.py:155-199)."""
    image = jnp.asarray(image)
    return moments_central(image, (0,) * image.ndim, order=order)


def moments_central(image, center=None, order=3, **kwargs):
    """Central image moments up to ``order`` via per-axis Vandermonde
    contractions (reference _moments.py:202-256)."""
    image = jnp.asarray(image)
    if center is None:
        center = centroid(image)
    center = jnp.asarray(center)
    calc = image.astype(float)
    for dim, dim_length in enumerate(image.shape):
        delta = jnp.arange(dim_length, dtype=float) - center[dim]
        powers_of_delta = delta[:, None] ** jnp.arange(order + 1)
        calc = jnp.moveaxis(calc, source=dim, destination=-1)
        calc = jnp.dot(calc, powers_of_delta)
        calc = jnp.moveaxis(calc, source=-1, destination=dim)
    return calc


def moments_normalized(mu, order=3):
    """Normalized central moments nu_ij = mu_ij / mu00^((i+j)/ndim + 1)
    (reference _moments.py:259-317)."""
    mu = jnp.asarray(mu)
    if any(s <= order for s in mu.shape):
        raise ValueError("Shape of image moments must be >= `order`")
    mu0 = mu.ravel()[0]
    ndim = mu.ndim
    # total power per moment entry over the full table
    grids = jnp.meshgrid(
        *[jnp.arange(s) for s in mu.shape], indexing="ij"
    )
    total = sum(grids)
    in_domain = sum(g <= order for g in grids) == ndim
    nu = mu / mu0 ** (total / ndim + 1)
    nu = jnp.where(total < 2, jnp.nan, nu)
    # the reference loop only fills the (order+1)^ndim hypercube; entries
    # beyond it stay zero (_moments.py:311-317)
    return jnp.where(in_domain, nu, 0.0)


def moments_hu(nu):
    """Hu's seven invariant moments (2-D only).

    Closed-form evaluation of the invariants (standard formulas, e.g.
    Hu 1962); the reference instead transfers to CPU skimage
    (_moments.py:385-390).
    """
    nu = jnp.asarray(nu)
    if nu.ndim != 2:
        raise ValueError("moments_hu only implemented for 2D images")
    t0 = nu[3, 0] + nu[1, 2]
    t1 = nu[2, 1] + nu[0, 3]
    q0 = t0 * t0
    q1 = t1 * t1
    n4 = 4 * nu[1, 1]
    s = nu[2, 0] + nu[0, 2]
    d = nu[2, 0] - nu[0, 2]
    hu0 = s
    hu1 = d * d + n4 * nu[1, 1]
    hu3 = q0 + q1
    hu5 = d * (q0 - q1) + n4 * t0 * t1
    t0 = t0 * (q0 - 3 * q1)
    t1 = t1 * (3 * q0 - q1)
    q0 = nu[3, 0] - 3 * nu[1, 2]
    q1 = 3 * nu[2, 1] - nu[0, 3]
    hu2 = q0 * q0 + q1 * q1
    hu4 = q0 * t0 + q1 * t1
    hu6 = q1 * t0 - q0 * t1
    return jnp.stack([hu0, hu1, hu2, hu3, hu4, hu5, hu6])


def centroid(image):
    """(Weighted) centroid of an image (reference _moments.py:393-419)."""
    image = jnp.asarray(image)
    M = moments_central(image, center=(0,) * image.ndim, order=1)
    center = (
        M[tuple(np.eye(image.ndim, dtype=int))] / M[(0,) * image.ndim]
    )
    return center


def inertia_tensor(image, mu=None):
    """Inertia tensor of the image (reference _moments.py:422-470).

    The tensor itself is ndim x ndim; it is assembled on the host from the
    (tiny) central-moment table, like the reference does.
    """
    image = jnp.asarray(image)
    if mu is None:
        mu = moments_central(image, order=2)
    mu = np.asarray(mu)
    mu0 = mu[(0,) * image.ndim]
    corners2 = tuple(2 * np.eye(image.ndim, dtype=int))
    result = np.diag((np.sum(mu[corners2]) - mu[corners2]) / mu0)
    for dims in itertools.combinations(range(image.ndim), 2):
        mu_index = np.zeros(image.ndim, dtype=int)
        mu_index[list(dims)] = 1
        result[dims] = -mu[tuple(mu_index)] / mu0
        result.T[dims] = -mu[tuple(mu_index)] / mu0
    return jnp.asarray(result)


def inertia_tensor_eigvals(image, mu=None, T=None):
    """Eigenvalues of the inertia tensor, descending
    (reference _moments.py:473-511)."""
    if T is None:
        T = inertia_tensor(image, mu)
    T = np.asarray(T)
    eigvals = np.linalg.eigvalsh(T)
    eigvals = np.clip(eigvals, 0, None)
    return jnp.asarray(sorted(eigvals, reverse=True))
