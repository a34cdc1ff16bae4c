"""skimage.morphology-compatible subpackage (reference
cupyimg/skimage/morphology/__init__.py)."""

from .binary import (
    binary_erosion,
    binary_dilation,
    binary_opening,
    binary_closing,
)
from .grey import (
    erosion,
    dilation,
    opening,
    closing,
    white_tophat,
    black_tophat,
)
from .selem import (
    square,
    rectangle,
    diamond,
    disk,
    ellipse,
    cube,
    octahedron,
    ball,
    octagon,
    star,
)
from .greyreconstruct import reconstruction
from .convex_hull import convex_hull_image
from .misc import remove_small_objects, remove_small_holes

__all__ = [
    "binary_erosion",
    "binary_dilation",
    "binary_opening",
    "binary_closing",
    "erosion",
    "dilation",
    "opening",
    "closing",
    "white_tophat",
    "black_tophat",
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
    "reconstruction",
    "convex_hull_image",
    "remove_small_objects",
    "remove_small_holes",
]
