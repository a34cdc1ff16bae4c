"""DAISY dense feature descriptors (reference
cupyimg/skimage/feature/_daisy.py).

The orientation histograms are built as one stacked (orientations, H, W)
tensor and smoothed per ring; descriptor assembly gathers shifted windows
— all static-shape slicing, fused by XLA.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import gaussian_filter
from ..util.dtype import img_as_float
from .._shared.utils import check_nD

__all__ = ["daisy"]


def daisy(
    image,
    step=4,
    radius=15,
    rings=3,
    histograms=8,
    orientations=8,
    normalization="l1",
    sigmas=None,
    ring_radii=None,
    visualize=False,
):
    """Extract DAISY feature descriptors densely (skimage parity;
    reference _daisy.py:10-263).

    ``visualize=True`` is not supported (the reference delegates the
    drawing to CPU skimage.draw).
    """
    image = jnp.asarray(image)
    check_nD(image, 2, "img")
    image = img_as_float(image)

    # Validate parameters.
    if (
        sigmas is not None
        and ring_radii is not None
        and len(sigmas) - 1 != len(ring_radii)
    ):
        raise ValueError("`len(sigmas)-1 != len(ring_radii)`")
    if ring_radii is not None:
        rings = len(ring_radii)
        radius = ring_radii[-1]
    if sigmas is not None:
        rings = len(sigmas) - 1
    if sigmas is None:
        sigmas = [
            radius * (i + 1) / float(2 * rings) for i in range(rings)
        ]
    if ring_radii is None:
        ring_radii = [
            radius * (i + 1) / float(rings) for i in range(rings)
        ]
    if normalization not in ["l1", "l2", "daisy", "off"]:
        raise ValueError("Invalid normalization method.")
    if visualize:
        raise NotImplementedError(
            "visualize=True requires CPU skimage.draw and is not "
            "supported"
        )

    # Image derivatives (forward differences, zero at the far edge).
    dx = jnp.pad(jnp.diff(image, n=1, axis=1), ((0, 0), (0, 1)))
    dy = jnp.pad(jnp.diff(image, n=1, axis=0), ((0, 1), (0, 0)))

    # Gradient orientation/magnitude histogram contributions.
    grad_mag = jnp.sqrt(dx * dx + dy * dy)
    grad_ori = jnp.arctan2(dy, dx)
    pi = np.pi
    orientation_kappa = orientations / pi
    orientation_angles = [
        2 * o * pi / orientations - pi for o in range(orientations)
    ]
    hist = jnp.stack(
        [
            jnp.exp(orientation_kappa * jnp.cos(grad_ori - o))
            * grad_mag
            for o in orientation_angles
        ],
        axis=0,
    )

    # Smooth histograms for the center and all rings.
    sigmas = [sigmas[0]] + list(sigmas)
    hist_smooth = jnp.stack(
        [
            jnp.stack(
                [
                    gaussian_filter(hist[j], sigma=sigmas[i])
                    for j in range(orientations)
                ],
                axis=0,
            )
            for i in range(rings + 1)
        ],
        axis=0,
    )

    # Assemble descriptor grid.
    theta = [2 * pi * j / histograms for j in range(histograms)]
    desc_dims = (rings * histograms + 1) * orientations
    out_shape = (
        image.shape[0] - 2 * radius,
        image.shape[1] - 2 * radius,
    )
    blocks = [hist_smooth[0][:, radius:-radius, radius:-radius]]
    for i in range(rings):
        for j in range(histograms):
            y_min = radius + int(
                round(ring_radii[i] * math.sin(theta[j]))
            )
            y_max = out_shape[0] + y_min
            x_min = radius + int(
                round(ring_radii[i] * math.cos(theta[j]))
            )
            x_max = out_shape[1] + x_min
            blocks.append(
                hist_smooth[i + 1][:, y_min:y_max, x_min:x_max]
            )
    descs = jnp.concatenate(blocks, axis=0)
    descs = descs[:, ::step, ::step]
    descs = jnp.moveaxis(descs, 0, -1)

    # Normalize descriptors.
    if normalization != "off":
        descs = descs + 1e-10
        if normalization == "l1":
            descs = descs / jnp.sum(descs, axis=2)[:, :, None]
        elif normalization == "l2":
            descs = descs / jnp.sqrt(
                jnp.sum(descs * descs, axis=2)
            )[:, :, None]
        elif normalization == "daisy":
            chunks = []
            for i in range(0, desc_dims, orientations):
                dtmp = descs[:, :, i : i + orientations]
                norms = jnp.sqrt(jnp.sum(dtmp * dtmp, axis=2))
                chunks.append(dtmp / norms[:, :, None])
            descs = jnp.concatenate(chunks, axis=2)

    return descs
