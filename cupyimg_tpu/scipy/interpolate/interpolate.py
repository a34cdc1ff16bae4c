"""RegularGridInterpolator / interpn.

API parity with reference cupyimg/scipy/interpolate/interpolate.py
(SURVEY.md C16): pure-jnp searchsorted + gather linear/nearest nd
interpolation on rectilinear grids.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

__all__ = ["RegularGridInterpolator", "interpn"]


class RegularGridInterpolator:
    """Interpolation on a regular (rectilinear) grid (scipy parity)."""

    def __init__(self, points, values, method="linear", bounds_error=True,
                 fill_value=np.nan):
        if method not in ("linear", "nearest"):
            raise ValueError(f"Method '{method}' is not defined")
        self.method = method
        self.bounds_error = bounds_error
        values = jnp.asarray(values)
        if len(points) > values.ndim:
            raise ValueError(
                f"There are {len(points)} point arrays, but values has "
                f"{values.ndim} dimensions"
            )
        if hasattr(values, "dtype") and np.dtype(values.dtype).kind in "iub":
            values = values.astype(np.float64)
        self.fill_value = fill_value
        if fill_value is not None:
            fill_value_dtype = np.asarray(fill_value).dtype
            if not np.can_cast(fill_value_dtype, values.dtype,
                               casting="same_kind"):
                raise ValueError(
                    "fill_value must be either 'None' or of a type "
                    "compatible with values"
                )
        for i, p in enumerate(points):
            p = np.asarray(p)
            if not np.all(np.diff(p) > 0.0):
                raise ValueError(
                    f"The points in dimension {i} must be strictly ascending"
                )
            if not p.ndim == 1:
                raise ValueError(
                    f"The points in dimension {i} must be 1-dimensional"
                )
            if not values.shape[i] == len(p):
                raise ValueError(
                    f"There are {len(p)} points and {values.shape[i]} "
                    f"values in dimension {i}"
                )
        self.grid = tuple(jnp.asarray(p) for p in points)
        self.values = values

    def __call__(self, xi, method=None):
        method = self.method if method is None else method
        if method not in ("linear", "nearest"):
            raise ValueError(f"Method '{method}' is not defined")
        ndim = len(self.grid)
        xi = jnp.asarray(xi)
        if xi.ndim == 1 and ndim > 1 and xi.shape[0] == ndim:
            xi = xi[None]
        xi_shape = xi.shape
        xi = xi.reshape(-1, xi_shape[-1])
        if xi.shape[-1] != ndim:
            raise ValueError(
                f"The requested sample points xi have dimension "
                f"{xi.shape[1]}, but this RegularGridInterpolator has "
                f"dimension {ndim}"
            )
        if self.bounds_error:
            for i in range(ndim):
                p = np.asarray(self.grid[i])
                col = np.asarray(xi[:, i])
                if not np.logical_and(
                    np.all(col >= p[0]), np.all(col <= p[-1])
                ):
                    raise ValueError(
                        f"One of the requested xi is out of bounds in "
                        f"dimension {i}"
                    )
        indices, norm_dist, out_of_bounds = self._find_indices(xi.T)
        if method == "linear":
            result = self._evaluate_linear(indices, norm_dist)
        else:
            result = self._evaluate_nearest(indices, norm_dist)
        if not self.bounds_error and self.fill_value is not None:
            result = jnp.where(
                out_of_bounds.reshape(
                    (-1,) + (1,) * (result.ndim - 1)
                ),
                jnp.asarray(self.fill_value, result.dtype),
                result,
            )
        return result.reshape(
            xi_shape[:-1] + self.values.shape[len(self.grid):]
        )

    def _find_indices(self, xi):
        indices = []
        norm_distances = []
        out_of_bounds = jnp.zeros(xi.shape[1], dtype=bool)
        for x, grid in zip(xi, self.grid):
            i = jnp.searchsorted(grid, x) - 1
            i = jnp.clip(i, 0, grid.shape[0] - 2)
            denom = grid[i + 1] - grid[i]
            norm_distances.append((x - grid[i]) / denom)
            indices.append(i)
            if not self.bounds_error:
                out_of_bounds = out_of_bounds | (x < grid[0]) | (x > grid[-1])
        return indices, norm_distances, out_of_bounds

    def _evaluate_linear(self, indices, norm_distances):
        # broadcast over trailing dims of values
        vslice = (slice(None),) + (None,) * (
            self.values.ndim - len(indices)
        )
        values = None
        for edge_indices in itertools.product(
            *[[i, i + 1] for i in indices]
        ):
            weight = jnp.ones_like(norm_distances[0])
            for ei, i, yi in zip(edge_indices, indices, norm_distances):
                weight = weight * jnp.where(ei == i, 1 - yi, yi)
            term = self.values[tuple(edge_indices)] * weight[vslice]
            values = term if values is None else values + term
        return values

    def _evaluate_nearest(self, indices, norm_distances):
        idx_res = tuple(
            jnp.where(yi <= 0.5, i, i + 1)
            for i, yi in zip(indices, norm_distances)
        )
        return self.values[idx_res]


def interpn(points, values, xi, method="linear", bounds_error=True,
            fill_value=np.nan):
    """Multidimensional interpolation on regular grids (scipy parity)."""
    if method not in ("linear", "nearest"):
        raise ValueError(f"interpn only understands the methods 'linear' "
                         f"and 'nearest'. You provided {method}.")
    values = jnp.asarray(values)
    if len(points) > values.ndim:
        raise ValueError(
            f"There are {len(points)} point arrays, but values has "
            f"{values.ndim} dimensions"
        )
    # scipy's _ndim_coords_from_arrays: a tuple of coordinate arrays is
    # broadcast together and stacked on a new trailing axis
    if isinstance(xi, tuple) and len(xi) > 1:
        parts = [jnp.asarray(x) for x in xi]
        shape = np.broadcast_shapes(*[p.shape for p in parts])
        xi = jnp.stack(
            [jnp.broadcast_to(p, shape) for p in parts], axis=-1
        )
    interp = RegularGridInterpolator(
        points, values, method=method, bounds_error=bounds_error,
        fill_value=fill_value,
    )
    return interp(xi)
