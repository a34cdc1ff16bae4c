"""regionprops / regionprops_table (reference
cupyimg/skimage/measure/_regionprops.py).

Architecture: instead of a class with ~45 hand-written ``@property``
methods, each measurement is a plain function registered in a module
table (:data:`_REGION_PROPS`) keyed by its public name; the lazy
``RegionProperties`` object resolves attribute access through that
table (with per-region memoization) and the column schema for
``regionprops_table`` is derived from the same registry.  The legacy
MATLAB-style aliases are generated from the snake_case names by the
regular camel-case rule plus an irregular-pairs table.

TPU-native deltas vs the reference:
- the reference calls host ``scipy.ndimage.find_objects`` on the whole
  label image (_regionprops.py:1235); here bounding boxes come from a
  device-side segment-reduction ``ndi.find_objects`` (SURVEY.md N14);
- ``convex_image`` / ``feret_diameter_max`` use the in-package
  device-rasterized convex hull instead of CPU skimage
  (_regionprops.py:329-338, 372-394);
- per-region property math runs on jnp arrays; tiny results (centroids,
  tensors) come back as host floats at the API boundary, which is where
  the reference synchronizes too.
"""

from __future__ import annotations

import inspect
from math import atan2, pi as PI, sqrt
from warnings import warn

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from . import _moments
from ._regionprops_utils import euler_number, perimeter, perimeter_crofton

__all__ = [
    "regionprops",
    "regionprops_table",
    "euler_number",
    "perimeter",
    "perimeter_crofton",
]


# --------------------------------------------------------------------------
# measurement registry
# --------------------------------------------------------------------------

# name -> (func(region) -> value, memoize?, 2-D only?)
_REGION_PROPS = {}

# measurements that need an intensity image (hidden from iteration when
# none was supplied; reference _regionprops.py:614-627)
_NEEDS_INTENSITY = frozenset(
    {
        "intensity_image",
        "max_intensity",
        "mean_intensity",
        "min_intensity",
        "weighted_moments",
        "weighted_moments_central",
        "weighted_centroid",
        "weighted_local_centroid",
        "weighted_moments_hu",
        "weighted_moments_normalized",
    }
)


def _measurement(cache=False, two_d_only=False):
    """Register a per-region measurement function under its own name."""

    def register(fn):
        _REGION_PROPS[fn.__name__] = (fn, cache, two_d_only)
        return fn

    return register


# --------------------------------------------------------------------------
# public name schema (values identical to the reference tables,
# _regionprops.py:18-139; generated rather than spelled out)
# --------------------------------------------------------------------------

_SNAKE_NAMES = (
    "area", "bbox", "bbox_area", "moments_central", "centroid",
    "convex_area", "convex_image", "coords", "eccentricity",
    "equivalent_diameter", "euler_number", "extent",
    "feret_diameter_max", "filled_area", "filled_image", "moments_hu",
    "image", "inertia_tensor", "inertia_tensor_eigvals",
    "intensity_image", "label", "local_centroid", "major_axis_length",
    "max_intensity", "mean_intensity", "min_intensity",
    "minor_axis_length", "moments", "moments_normalized", "orientation",
    "perimeter", "perimeter_crofton", "slice", "solidity",
    "weighted_moments_central", "weighted_centroid",
    "weighted_moments_hu", "weighted_local_centroid",
    "weighted_moments", "weighted_moments_normalized",
)

# legacy aliases that do NOT follow the snake->Camel rule
_IRREGULAR_ALIASES = {
    "BoundingBox": "bbox",
    "BoundingBoxArea": "bbox_area",
    "CentralMoments": "moments_central",
    "Coordinates": "coords",
    "CroftonPerimeter": "perimeter_crofton",
    "EquivDiameter": "equivalent_diameter",
    "HuMoments": "moments_hu",
    "NormalizedMoments": "moments_normalized",
    "WeightedCentralMoments": "weighted_moments_central",
    "WeightedHuMoments": "weighted_moments_hu",
    "WeightedNormalizedMoments": "weighted_moments_normalized",
}


def _snake_to_camel(name):
    return "".join(part.capitalize() for part in name.split("_"))


PROPS = {
    _snake_to_camel(name): name
    for name in _SNAKE_NAMES
    if name not in set(_IRREGULAR_ALIASES.values())
}
PROPS.update(_IRREGULAR_ALIASES)

OBJECT_COLUMNS = {
    "image", "coords", "convex_image", "slice",
    "filled_image", "intensity_image",
}

_INT_COLUMNS = (
    "area", "bbox", "bbox_area", "convex_area", "euler_number",
    "filled_area", "label", "max_intensity", "min_intensity",
)

COL_DTYPES = {name: int for name in _INT_COLUMNS}
COL_DTYPES.update({name: object for name in OBJECT_COLUMNS})
COL_DTYPES.update(
    {name: float for name in _SNAKE_NAMES if name not in COL_DTYPES}
)

PROP_VALS = set(PROPS.values())


# --------------------------------------------------------------------------
# the measurements (math identical to round 1; bodies are jnp rewrites of
# the reference's property bodies, _regionprops.py:214-641)
# --------------------------------------------------------------------------


@_measurement(cache=True)
def area(r):
    return int(jnp.sum(r.image))


@_measurement()
def bbox(r):
    starts = [r.slice[i].start for i in range(r._ndim)]
    stops = [r.slice[i].stop for i in range(r._ndim)]
    return tuple(starts + stops)


@_measurement()
def bbox_area(r):
    return r.image.size


@_measurement()
def centroid(r):
    return tuple(np.asarray(r.coords).mean(axis=0))


@_measurement(cache=True)
def convex_area(r):
    return int(jnp.sum(r.convex_image))


@_measurement(cache=True)
def convex_image(r):
    from ..morphology.convex_hull import convex_hull_image

    return convex_hull_image(r.image)


@_measurement()
def coords(r):
    indices = jnp.nonzero(r.image)
    return jnp.vstack(
        [indices[i] + r.slice[i].start for i in range(r._ndim)]
    ).T


@_measurement(two_d_only=True)
def eccentricity(r):
    l1, l2 = (float(v) for v in r.inertia_tensor_eigvals)
    return 0 if l1 == 0 else sqrt(1 - l2 / l1)


@_measurement()
def equivalent_diameter(r):
    if r._ndim == 2:
        return sqrt(4 * r.area / PI)
    return (2 * r._ndim * r.area / PI) ** (1 / r._ndim)


# shadows the module-level euler_number import inside the registry only
@_measurement()
def _region_euler_number(r):
    if r._ndim not in (2, 3):
        raise NotImplementedError(
            "Euler number is implemented for 2D or 3D images only"
        )
    return euler_number(r.image, r._ndim)


_REGION_PROPS["euler_number"] = _REGION_PROPS.pop("_region_euler_number")


@_measurement()
def extent(r):
    return r.area / r.image.size


@_measurement()
def feret_diameter_max(r):
    hull = jnp.pad(r.convex_image, 2, mode="constant", constant_values=0)
    pts = _surface_midpoints(hull)
    if pts.shape[0] < 2:
        return 0.0
    pts = jnp.asarray(pts)
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    return sqrt(float(jnp.max(d2)))


@_measurement()
def filled_area(r):
    return int(jnp.sum(r.filled_image))


@_measurement(cache=True)
def filled_image(r):
    return ndi.binary_fill_holes(r.image, np.ones((3,) * r._ndim))


@_measurement(cache=True)
def image(r):
    return r._label_image[r.slice] == r.label


@_measurement(cache=True)
def inertia_tensor(r):
    return _moments.inertia_tensor(r.image, r.moments_central)


@_measurement(cache=True)
def inertia_tensor_eigvals(r):
    return _moments.inertia_tensor_eigvals(r.image, T=r.inertia_tensor)


@_measurement(cache=True)
def intensity_image(r):
    if r._intensity_image is None:
        raise AttributeError("No intensity image specified.")
    mask = r.image
    if r._multichannel:
        mask = jnp.expand_dims(mask, r._ndim)
    return jnp.asarray(r._intensity_image)[r.slice] * mask


@_measurement()
def local_centroid(r):
    M = np.asarray(r.moments)
    return tuple(
        M[tuple(np.eye(r._ndim, dtype=int))] / M[(0,) * r._ndim]
    )


@_measurement()
def major_axis_length(r):
    return 4 * sqrt(float(r.inertia_tensor_eigvals[0]))


@_measurement()
def max_intensity(r):
    return jnp.max(r.intensity_image[r.image], axis=0)


@_measurement()
def mean_intensity(r):
    return jnp.mean(r.intensity_image[r.image], axis=0)


@_measurement()
def min_intensity(r):
    return jnp.min(r.intensity_image[r.image], axis=0)


@_measurement()
def minor_axis_length(r):
    return 4 * sqrt(float(r.inertia_tensor_eigvals[-1]))


@_measurement(cache=True)
def moments(r):
    return _moments.moments(r.image.astype(np.uint8), 3)


@_measurement(cache=True)
def moments_central(r):
    return _moments.moments_central(
        r.image.astype(np.uint8), r.local_centroid, order=3
    )


@_measurement(two_d_only=True)
def moments_hu(r):
    return _moments.moments_hu(r.moments_normalized)


@_measurement(cache=True)
def moments_normalized(r):
    return _moments.moments_normalized(r.moments_central, 3)


@_measurement(two_d_only=True)
def orientation(r):
    a, b, _, c = np.asarray(r.inertia_tensor).ravel()
    if a - c == 0:
        return -PI / 4.0 if b < 0 else PI / 4.0
    return 0.5 * atan2(-2 * b, c - a)


@_measurement(two_d_only=True)
def _region_perimeter(r):
    return float(perimeter(r.image, 4))


_REGION_PROPS["perimeter"] = _REGION_PROPS.pop("_region_perimeter")


@_measurement(two_d_only=True)
def _region_perimeter_crofton(r):
    return float(perimeter_crofton(r.image, 4))


_REGION_PROPS["perimeter_crofton"] = _REGION_PROPS.pop(
    "_region_perimeter_crofton"
)


@_measurement()
def solidity(r):
    return r.area / r.convex_area


@_measurement()
def weighted_centroid(r):
    local = np.asarray(r.weighted_local_centroid)
    return tuple(c + s.start for c, s in zip(local, r.slice))


@_measurement()
def weighted_local_centroid(r):
    M = r.weighted_moments
    return M[tuple(np.eye(r._ndim, dtype=int))] / M[(0,) * r._ndim]


def _per_channel(r, fn):
    """Apply ``fn(plane)`` per intensity channel and stack, or directly
    for single-channel regions."""
    img = r.intensity_image.astype(float)
    if not r._multichannel:
        return fn(img)
    return jnp.stack(
        [fn(img[..., ch]) for ch in range(img.shape[-1])], axis=-1
    )


@_measurement(cache=True)
def weighted_moments(r):
    return _per_channel(r, lambda im: _moments.moments(im, order=3))


@_measurement(cache=True)
def weighted_moments_central(r):
    ctr = r.weighted_local_centroid
    img = r.intensity_image.astype(float)
    if not r._multichannel:
        return _moments.moments_central(img, ctr, order=3)
    return jnp.stack(
        [
            _moments.moments_central(
                img[..., ch], center=ctr[..., ch], order=3
            )
            for ch in range(img.shape[-1])
        ],
        axis=-1,
    )


@_measurement(two_d_only=True)
def weighted_moments_hu(r):
    nu = r.weighted_moments_normalized
    if not r._multichannel:
        return _moments.moments_hu(nu)
    return jnp.stack(
        [
            _moments.moments_hu(nu[..., ch])
            for ch in range(r._intensity_image.shape[-1])
        ],
        axis=-1,
    )


@_measurement(cache=True)
def weighted_moments_normalized(r):
    mu = r.weighted_moments_central
    if not r._multichannel:
        return _moments.moments_normalized(mu, order=3)
    return jnp.stack(
        [
            _moments.moments_normalized(mu[..., ch], order=3)
            for ch in range(r._intensity_image.shape[-1])
        ],
        axis=-1,
    )


def _surface_midpoints(mask):
    """Vertices of the 0.5-level surface of a binary mask: midpoints
    between axis-adjacent on/off pixels.

    For binary data these are exactly the marching-squares/cubes vertex
    positions the reference obtains via CPU find_contours/marching_cubes
    (_regionprops.py:372-394).
    """
    mask = np.asarray(mask).astype(bool)
    pts = []
    for ax in range(mask.ndim):
        lo = [slice(None)] * mask.ndim
        hi = [slice(None)] * mask.ndim
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        diff = mask[tuple(lo)] != mask[tuple(hi)]
        edge = np.argwhere(diff).astype(float)
        edge[:, ax] += 0.5
        pts.append(edge)
    return np.concatenate(pts, axis=0)


# --------------------------------------------------------------------------
# the lazy per-region object
# --------------------------------------------------------------------------


def _arg_count(func):
    """Number of required positional arguments of ``func``."""
    spec = inspect.getfullargspec(func)
    return len(spec.args) - len(spec.defaults or ())


class RegionProperties:
    """Please refer to ``regionprops`` for details on available properties."""

    def __init__(
        self,
        slice,
        label,
        label_image,
        intensity_image,
        cache_active,
        *,
        extra_properties=None,
    ):
        multichannel = False
        if intensity_image is not None:
            ndim = label_image.ndim
            shapes_ok = (
                intensity_image.shape[:ndim] == label_image.shape
                and intensity_image.ndim in (ndim, ndim + 1)
            )
            if not shapes_ok:
                raise ValueError(
                    "Label and intensity image shapes must match,"
                    " except for channel (last) axis."
                )
            multichannel = label_image.shape < intensity_image.shape

        self.label = label
        self.slice = slice
        self._slice = slice
        self._label_image = label_image
        self._intensity_image = intensity_image
        self._cache_active = cache_active
        self._cache = {}
        self._ndim = label_image.ndim
        self._multichannel = multichannel
        self._spatial_axes = tuple(range(self._ndim))

        self._extra_properties = {}
        for func in extra_properties or ():
            name = func.__name__
            if name in _REGION_PROPS:
                warn(
                    f"Extra property '{name}' is shadowed by existing "
                    "property and will be inaccessible. Consider "
                    "renaming it."
                )
            self._extra_properties[name] = func

    def _compute_extra(self, name):
        func = self._extra_properties[name]
        n_args = _arg_count(func)
        if n_args == 1:
            return func(self.image)
        if n_args == 2:
            if self._intensity_image is None:
                raise AttributeError(
                    f"intensity image required to calculate {name}"
                )
            return func(self.image, self.intensity_image)
        raise AttributeError(
            "Custom regionprop function's number of arguments must be 1 "
            f"or 2 but {name} takes {n_args} arguments."
        )

    def __getattr__(self, attr):
        # registered measurements win over extra properties, matching the
        # reference's class-attribute-over-__getattr__ resolution order
        entry = _REGION_PROPS.get(attr)
        if entry is not None:
            fn, memo, two_d_only = entry
            if two_d_only and self._ndim > 2:
                raise NotImplementedError(
                    f"Property {attr} is not implemented for 3D images"
                )
            if memo and self._cache_active:
                if attr not in self._cache:
                    self._cache[attr] = fn(self)
                return self._cache[attr]
            return fn(self)
        if attr in self.__dict__.get("_extra_properties", {}):
            return self._compute_extra(attr)
        raise AttributeError(
            f"'{type(self)}' object has no attribute '{attr}'"
        )

    def __dir__(self):
        # __getattr__-backed measurements must still show up in dir()
        # (skimage exposes them as class properties; tooling and the
        # props-dict-completeness contract rely on enumerability)
        return sorted(set(PROPS.values()) | {"label", "slice"})

    def __getitem__(self, key):
        value = getattr(self, key, None)
        if value is not None:
            return value
        return getattr(self, PROPS[key])  # legacy alias

    def __iter__(self):
        names = PROP_VALS
        if self._intensity_image is None:
            names = names - _NEEDS_INTENSITY
        return iter(sorted(names))

    def __eq__(self, other):
        if not isinstance(other, RegionProperties):
            return False
        for name in PROP_VALS:
            mine = getattr(self, name, None)
            theirs = getattr(other, name, None)
            try:
                if isinstance(mine, tuple):
                    np.testing.assert_equal(mine, theirs)
                else:
                    np.testing.assert_array_equal(
                        np.asarray(mine), np.asarray(theirs)
                    )
            except AssertionError:
                return False
        return True


_RegionProperties = RegionProperties


# --------------------------------------------------------------------------
# drivers
# --------------------------------------------------------------------------


def regionprops(
    label_image,
    intensity_image=None,
    cache=True,
    coordinates=None,
    *,
    extra_properties=None,
):
    """Measure properties of labeled image regions
    (reference _regionprops.py:942-1252; see its docstring for the full
    property list — the same properties are available here).

    Bounding slices come from the device-side ``ndi.find_objects``
    (segment reductions) instead of a host find_objects pass.
    """
    label_image = jnp.asarray(label_image)

    if label_image.ndim not in (2, 3):
        raise TypeError("Only 2-D and 3-D images supported.")

    if not np.issubdtype(label_image.dtype, np.integer):
        if np.issubdtype(label_image.dtype, np.bool_):
            raise TypeError(
                "Non-integer image types are ambiguous: "
                "use skimage.measure.label to label the connected "
                "components of label_image, "
                "or label_image.astype(np.uint8) to interpret "
                "the True values as a single label."
            )
        raise TypeError("Non-integer label_image types are ambiguous")

    _check_coordinates_kwarg(coordinates)

    return [
        RegionProperties(
            bounds,
            lab,
            label_image,
            intensity_image,
            cache,
            extra_properties=extra_properties,
        )
        for lab, bounds in enumerate(ndi.find_objects(label_image), 1)
        if bounds is not None
    ]


def _check_coordinates_kwarg(coordinates):
    """Reject/deprecate the pre-0.16 ``coordinates`` kwarg exactly as the
    reference does (_regionprops.py:1206-1232)."""
    if coordinates is None:
        return
    if coordinates == "rc":
        warn(
            "The coordinates keyword argument to "
            "skimage.measure.regionprops is deprecated. "
            "All features are now computed in rc (row-column) "
            "coordinates. Please remove `coordinates=\"rc\"` from "
            "all calls to regionprops before updating scikit-image.",
            stacklevel=3,
            category=FutureWarning,
        )
    else:
        raise ValueError(
            'Values other than "rc" for the "coordinates" argument '
            "to skimage.measure.regionprops are no longer "
            "supported. You should update your code to use \"rc\" "
            "coordinates and stop using the \"coordinates\" "
            "argument, or use skimage version 0.15.x or earlier."
        )


def _infer_regionprop_dtype(func, *, intensity, ndim):
    """Infer the column dtype of an extra property by probing it on two
    tiny synthetic regions (reference _regionprops.py:141-184)."""
    sample = np.zeros((3,) * ndim, dtype=np.intp)
    sample[(0,) * ndim] = 1
    sample[(slice(1, None),) * ndim] = 2
    masks = (jnp.asarray(sample == 1), jnp.asarray(sample == 2))
    if intensity and _arg_count(func) == 2:
        rng = np.random.RandomState(0)

        def probe(mask):
            return func(mask, jnp.asarray(rng.random_sample(sample.shape)))

    else:
        probe = func
    first, second = probe(masks[0]), probe(masks[1])
    scalars = np.isscalar(first) and np.isscalar(second)
    if scalars or np.asarray(first).shape == np.asarray(second).shape:
        return np.asarray(first).dtype.type
    return np.object_


def _column_dtype(sample_region, prop):
    if prop in COL_DTYPES:
        return COL_DTYPES[prop]
    return _infer_regionprop_dtype(
        sample_region._extra_properties[prop],
        intensity=sample_region._intensity_image is not None,
        ndim=sample_region.image.ndim,
    )


def _props_to_dict(regions, properties=("label", "bbox"), separator="-"):
    """Convert a regionprops list to a column dictionary
    (reference _regionprops.py:640-763); columns are host numpy arrays
    (pandas-ready)."""
    out = {}
    n = len(regions)
    for prop in properties:
        dtype = _column_dtype(regions[0], prop)
        sample = getattr(regions[0], prop)
        scalar_like = (
            np.isscalar(sample)
            or getattr(sample, "ndim", None) == 0
            or prop in OBJECT_COLUMNS
            or dtype is np.object_
        )
        if scalar_like:
            column = np.empty(n, dtype=dtype)
            for k, region in enumerate(regions):
                column[k] = region[prop]
            out[prop] = column
            continue
        # fixed-shape vector/tensor property: one column per element
        shape = sample.shape if hasattr(sample, "shape") else (len(sample),)
        values = [np.asarray(region[prop]) for region in regions]
        for ind in np.ndindex(shape):
            loc = ind if len(ind) > 1 else ind[0]
            column = np.empty(n, dtype=dtype)
            for k in range(n):
                column[k] = values[k][loc]
            out[separator.join(map(str, (prop,) + ind))] = column
    return out


def regionprops_table(
    label_image,
    intensity_image=None,
    properties=("label", "bbox"),
    *,
    cache=True,
    separator="-",
    extra_properties=None,
):
    """Compute image properties as a pandas-compatible table
    (reference _regionprops.py:767-939)."""
    regions = regionprops(
        label_image,
        intensity_image=intensity_image,
        cache=cache,
        extra_properties=extra_properties,
    )
    if extra_properties is not None:
        properties = list(properties) + [
            fn.__name__ for fn in extra_properties
        ]
    if regions:
        return _props_to_dict(
            regions, properties=properties, separator=separator
        )
    # empty input: build the schema from a dummy single-pixel region and
    # return 0-row columns (reference _regionprops.py:918-939)
    ndim = label_image.ndim
    dummy = np.zeros((3,) * ndim, dtype=int)
    dummy[(1,) * ndim] = 1
    if intensity_image is not None:
        intensity_image = jnp.zeros(
            dummy.shape + jnp.asarray(intensity_image).shape[ndim:],
            dtype=intensity_image.dtype,
        )
    regions = regionprops(
        jnp.asarray(dummy),
        intensity_image=intensity_image,
        cache=cache,
        extra_properties=extra_properties,
    )
    table = _props_to_dict(
        regions, properties=properties, separator=separator
    )
    return {name: column[:0] for name, column in table.items()}
