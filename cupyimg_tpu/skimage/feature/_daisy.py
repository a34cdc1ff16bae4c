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

    ``visualize=True`` additionally returns an (M, N, 3) rendering of
    the sampling geometry; unlike the reference (which delegates to CPU
    skimage.draw) the AA rasterization here is first-party.
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

    if visualize:
        descs_img = _render_descriptors(
            np.asarray(image), np.asarray(descs), step, radius, sigmas,
            ring_radii, orientation_angles, theta, rings, histograms,
            orientations,
        )
        return descs, jnp.asarray(descs_img)
    return descs


def _blend(img, ys, xs, alpha, color):
    """Alpha-blend ``color`` into ``img`` at integer pixels, dropping
    out-of-bounds samples (host-side; visualization only)."""
    h, w = img.shape[:2]
    keep = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w) & (alpha > 0)
    ys, xs, alpha = ys[keep], xs[keep], alpha[keep][:, None]
    img[ys, xs] = (1.0 - alpha) * img[ys, xs] + alpha * np.asarray(color)


def _draw_circle_aa(img, cy, cx, r, color):
    """Anti-aliased circle perimeter via a radial distance ramp
    (first-party replacement for skimage.draw.circle_perimeter_aa)."""
    r = max(int(r), 1)
    yy, xx = np.mgrid[-r - 1: r + 2, -r - 1: r + 2]
    d = np.hypot(yy, xx)
    alpha = np.clip(1.0 - np.abs(d - r), 0.0, 1.0)
    ys, xs = np.nonzero(alpha)
    _blend(img, ys + cy - r - 1, xs + cx - r - 1, alpha[ys, xs], color)


def _draw_line_aa(img, y0, x0, y1, x1, color):
    """Anti-aliased segment via perpendicular-distance coverage
    (first-party replacement for skimage.draw.line_aa)."""
    ymin, ymax = sorted((y0, y1))
    xmin, xmax = sorted((x0, x1))
    yy, xx = np.mgrid[ymin - 1: ymax + 2, xmin - 1: xmax + 2]
    dy, dx = y1 - y0, x1 - x0
    L2 = float(dy * dy + dx * dx)
    if L2 == 0:
        d = np.hypot(yy - y0, xx - x0)
    else:
        t = np.clip(((yy - y0) * dy + (xx - x0) * dx) / L2, 0.0, 1.0)
        d = np.hypot(yy - (y0 + t * dy), xx - (x0 + t * dx))
    alpha = np.clip(1.0 - d, 0.0, 1.0)
    ys, xs = np.nonzero(alpha)
    _blend(img, ys + ymin - 1, xs + xmin - 1, alpha[ys, xs], color)


def _render_descriptors(image, descs, step, radius, sigmas, ring_radii,
                        orientation_angles, theta, rings, histograms,
                        orientations):
    """Render the DAISY sampling geometry like the reference
    (_daisy.py:200-260): red center rings/bins, ring histograms in a
    green-blue ramp, bin lines scaled by histogram mass.  The reference
    delegates to CPU skimage.draw; here the AA rasterizers above are
    first-party, so the visualization needs no skimage install."""
    descs_img = np.repeat(image[:, :, None], 3, axis=2).astype(float)
    for i in range(descs.shape[0]):
        for j in range(descs.shape[1]):
            color = [1, 0, 0]
            desc_y = i * step + radius
            desc_x = j * step + radius
            _draw_circle_aa(
                descs_img, desc_y, desc_x, int(sigmas[0]), color
            )
            max_bin = float(np.max(descs[i, j, :]))
            if max_bin == 0:
                max_bin = 1.0
            for o_num, o in enumerate(orientation_angles):
                bin_size = float(descs[i, j, o_num]) / max_bin
                dy = sigmas[0] * bin_size * math.sin(o)
                dx = sigmas[0] * bin_size * math.cos(o)
                _draw_line_aa(
                    descs_img, desc_y, desc_x,
                    int(desc_y + dy), int(desc_x + dx), color,
                )
            for r_num, r in enumerate(ring_radii):
                color_offset = float(1 + r_num) / rings
                color = (1 - color_offset, 1, color_offset)
                for t_num, t in enumerate(theta):
                    hist_y = desc_y + int(round(r * math.sin(t)))
                    hist_x = desc_x + int(round(r * math.cos(t)))
                    _draw_circle_aa(
                        descs_img, hist_y, hist_x,
                        int(sigmas[r_num + 1]), color,
                    )
                    for o_num, o in enumerate(orientation_angles):
                        bin_size = float(
                            descs[
                                i, j,
                                orientations
                                + r_num * histograms * orientations
                                + t_num * orientations
                                + o_num,
                            ]
                        ) / max_bin
                        dy = sigmas[r_num + 1] * bin_size * math.sin(o)
                        dx = sigmas[r_num + 1] * bin_size * math.cos(o)
                        _draw_line_aa(
                            descs_img, hist_y, hist_x,
                            int(hist_y + dy), int(hist_x + dx), color,
                        )
    return descs_img
