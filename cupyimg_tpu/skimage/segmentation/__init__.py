"""skimage.segmentation-compatible subpackage (reference
cupyimg/skimage/segmentation/__init__.py)."""

from .boundaries import find_boundaries, mark_boundaries
from ._join import join_segmentations, relabel_sequential, clear_border
from .morphsnakes import (
    morphological_geodesic_active_contour,
    morphological_chan_vese,
    inverse_gaussian_gradient,
    circle_level_set,
    disk_level_set,
    checkerboard_level_set,
)

__all__ = [
    "find_boundaries",
    "mark_boundaries",
    "clear_border",
    "join_segmentations",
    "relabel_sequential",
    "morphological_geodesic_active_contour",
    "morphological_chan_vese",
    "inverse_gaussian_gradient",
    "circle_level_set",
    "disk_level_set",
    "checkerboard_level_set",
]
