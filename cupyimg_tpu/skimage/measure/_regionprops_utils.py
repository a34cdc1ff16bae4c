"""euler_number / perimeter / perimeter_crofton (reference
cupyimg/skimage/measure/_regionprops_utils.py).

All three are LUT-histogram reductions over a small integer stencil
(configuration codes from a 2x2 / 2x2x2 binary neighborhood): one
``ndi.convolve`` + ``bincount`` + dot.  Deterministic and fully on device.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi

__all__ = ["euler_number", "perimeter", "perimeter_crofton"]

STREL_4 = np.array(
    [[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8
)
STREL_8 = np.ones((3, 3), dtype=np.uint8)

# Ohser/Nagel/Schladitz configuration-contribution LUTs (same constants as
# reference _regionprops_utils.py:27-63)
EULER_COEFS2D_4 = [0, 1, 0, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0, 0, 0, 0]
EULER_COEFS2D_8 = [0, 0, 0, 0, 0, 0, -1, 0, 1, 0, 0, 0, 0, 0, -1, 0]
# fmt: off
EULER_COEFS3D_26 = np.array([0, 1, 1, 0, 1, 0, -2, -1,
                            1, -2, 0, -1, 0, -1, -1, 0,
                            1, 0, -2, -1, -2, -1, -1, -2,
                            -6, -3, -3, -2, -3, -2, 0, -1,
                            1, -2, 0, -1, -6, -3, -3, -2,
                            -2, -1, -1, -2, -3, 0, -2, -1,
                            0, -1, -1, 0, -3, -2, 0, -1,
                            -3, 0, -2, -1, 0, 1, 1, 0,
                            1, -2, -6, -3, 0, -1, -3, -2,
                            -2, -1, -3, 0, -1, -2, -2, -1,
                            0, -1, -3, -2, -1, 0, 0, -1,
                            -3, 0, 0, 1, -2, -1, 1, 0,
                            -2, -1, -3, 0, -3, 0, 0, 1,
                            -1, 4, 0, 3, 0, 3, 1, 2,
                            -1, -2, -2, -1, -2, -1, 1,
                            0, 0, 3, 1, 2, 1, 2, 2, 1,
                            1, -6, -2, -3, -2, -3, -1, 0,
                            0, -3, -1, -2, -1, -2, -2, -1,
                            -2, -3, -1, 0, -1, 0, 4, 3,
                            -3, 0, 0, 1, 0, 1, 3, 2,
                            0, -3, -1, -2, -3, 0, 0, 1,
                            -1, 0, 0, -1, -2, 1, -1, 0,
                            -1, -2, -2, -1, 0, 1, 3, 2,
                            -2, 1, -1, 0, 1, 2, 2, 1,
                            0, -3, -3, 0, -1, -2, 0, 1,
                            -1, 0, -2, 1, 0, -1, -1, 0,
                            -1, -2, 0, 1, -2, -1, 3, 2,
                            -2, 1, 1, 2, -1, 0, 2, 1,
                            -1, 0, -2, 1, -2, 1, 1, 2,
                            -2, 3, -1, 2, -1, 2, 0, 1,
                            0, -1, -1, 0, -1, 0, 2, 1,
                            -1, 2, 0, 1, 0, 1, 1, 0, ])
# fmt: on


def euler_number(image, connectivity=None):
    """Euler characteristic of the set of non-zero pixels
    (reference _regionprops_utils.py:66-213)."""
    image = jnp.asarray(image)
    image = (image > 0).astype(int)
    image = jnp.pad(image, pad_width=1, mode="constant")

    if connectivity is None:
        connectivity = image.ndim

    if image.ndim == 2:
        config = jnp.array([[0, 0, 0], [0, 1, 4], [0, 2, 8]])
        if connectivity == 1:
            coefs = EULER_COEFS2D_4
        else:
            coefs = EULER_COEFS2D_8
        bins = 16
    else:
        if connectivity == 2:
            raise NotImplementedError(
                "For 3D images, Euler number is implemented "
                "for connectivities 1 and 3 only"
            )
        # fmt: off
        config = jnp.array([[[0, 0, 0], [0, 0, 0], [0, 0, 0]],
                            [[0, 0, 0], [0, 1, 4], [0, 2, 8]],
                            [[0, 0, 0], [0, 16, 64], [0, 32, 128]]])
        # fmt: on
        if connectivity == 1:
            coefs = EULER_COEFS3D_26[::-1]
        else:
            coefs = EULER_COEFS3D_26
        bins = 256

    XF = ndi.convolve(image, config, mode="constant", cval=0)
    h = jnp.bincount(XF.ravel(), length=bins)

    coefs = jnp.asarray(np.asarray(coefs), dtype=float)
    if image.ndim == 2:
        return int(coefs @ h)
    else:
        return int(0.125 * float(coefs @ h))


def perimeter(image, neighbourhood=4):
    """Total perimeter of all objects in a 2-D binary image
    (reference _regionprops_utils.py:216-283)."""
    image = jnp.asarray(image)
    if image.ndim != 2:
        raise NotImplementedError("`perimeter` supports 2D images only")

    if neighbourhood == 4:
        strel = STREL_4
    else:
        strel = STREL_8
    image = image.astype(np.uint8)
    eroded_image = ndi.binary_erosion(image, strel, border_value=0)
    border_image = image - eroded_image.astype(np.uint8)

    perimeter_weights = np.zeros(50, dtype=np.float64)
    perimeter_weights[[5, 7, 15, 17, 25, 27]] = 1
    perimeter_weights[[21, 33]] = math.sqrt(2)
    perimeter_weights[[13, 23]] = (1 + math.sqrt(2)) / 2

    perimeter_image = ndi.convolve(
        border_image.astype(np.int32),
        jnp.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]]),
        mode="constant",
        cval=0,
    )

    perimeter_histogram = jnp.bincount(
        perimeter_image.ravel(), length=50
    )
    total_perimeter = perimeter_histogram @ jnp.asarray(perimeter_weights)
    return total_perimeter


def perimeter_crofton(image, directions=4):
    """Total Crofton perimeter of all objects in a 2-D image
    (reference _regionprops_utils.py:286-336)."""
    image = jnp.asarray(image)
    if image.ndim != 2:
        raise NotImplementedError(
            "`perimeter_crofton` supports 2D images only"
        )

    image = (image > 0).astype(np.int32)
    image = jnp.pad(image, pad_width=1, mode="constant")
    XF = ndi.convolve(
        image,
        jnp.array([[0, 0, 0], [0, 1, 4], [0, 2, 8]]),
        mode="constant",
        cval=0,
    )
    h = jnp.bincount(XF.ravel(), length=16)

    # fmt: off
    if directions == 2:
        coefs = [0, np.pi / 2, 0, 0, 0, np.pi / 2, 0, 0,
                 np.pi / 2, np.pi, 0, 0, np.pi / 2, np.pi, 0, 0]
    else:
        sq2 = math.sqrt(2)
        coefs = [0, np.pi / 4 * (1 + 1 / sq2),
                 np.pi / (4 * sq2),
                 np.pi / (2 * sq2), 0,
                 np.pi / 4 * (1 + 1 / sq2),
                 0, np.pi / (4 * sq2), np.pi / 4, np.pi / 2,
                 np.pi / (4 * sq2), np.pi / (4 * sq2),
                 np.pi / 4, np.pi / 2, 0, 0]
    # fmt: on

    total_perimeter = jnp.asarray(coefs) @ h
    return total_perimeter
