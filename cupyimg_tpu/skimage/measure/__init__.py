"""skimage.measure-compatible subpackage (reference
cupyimg/skimage/measure/__init__.py)."""

from ._regionprops import (
    regionprops,
    regionprops_table,
    perimeter,
    perimeter_crofton,
    euler_number,
)
from ._polygon import approximate_polygon, subdivide_polygon
from ._moments import (
    moments,
    moments_central,
    moments_coords,
    moments_coords_central,
    moments_normalized,
    centroid,
    moments_hu,
    inertia_tensor,
    inertia_tensor_eigvals,
)
from .profile import profile_line
from .block import block_reduce
from ._label import label
from .entropy import shannon_entropy

__all__ = [
    "regionprops",
    "regionprops_table",
    "perimeter",
    "perimeter_crofton",
    "euler_number",
    "approximate_polygon",
    "subdivide_polygon",
    "block_reduce",
    "centroid",
    "moments",
    "moments_central",
    "moments_coords",
    "moments_coords_central",
    "moments_normalized",
    "moments_hu",
    "inertia_tensor",
    "inertia_tensor_eigvals",
    "profile_line",
    "label",
    "shannon_entropy",
]
