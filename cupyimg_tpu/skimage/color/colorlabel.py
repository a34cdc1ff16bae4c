"""label2rgb (skimage.color.colorlabel parity; reference
cupyimg/skimage/color/colorlabel.py)."""

from __future__ import annotations

import itertools
import warnings

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.color import rgb_colors
from cupyimg_tpu.skimage.color.colorconv import (
    gray2rgb,
    rgb2gray,
)
from cupyimg_tpu.skimage.util.dtype import img_as_float
from cupyimg_tpu.skimage._shared.utils import change_default_value

__all__ = ["color_dict", "label2rgb", "DEFAULT_COLORS"]

DEFAULT_COLORS = (
    "red", "blue", "yellow", "magenta", "green", "indigo", "darkorange",
    "cyan", "pink", "yellowgreen",
)

color_dict = {
    k: v for k, v in rgb_colors.__dict__.items() if isinstance(v, tuple)
}


def _rgb_vector(color):
    if isinstance(color, str):
        color = color_dict[color]
    return np.asarray(color[:3], dtype=np.float64)


@change_default_value("bg_label", new_value=0, changed_version="0.19")
def label2rgb(
    label, image=None, colors=None, alpha=0.3, bg_label=-1, bg_color=(0, 0, 0),
    image_alpha=1, kind="overlay",
):
    """Color-code labeled regions, optionally overlaid on an image
    (skimage parity; 'overlay' and 'avg' kinds)."""
    label = jnp.asarray(label)
    if kind == "overlay":
        return _label2rgb_overlay(
            label, image, colors, alpha, bg_label, bg_color, image_alpha
        )
    elif kind == "avg":
        return _label2rgb_avg(label, image, bg_label, bg_color)
    raise ValueError("`kind` must be either 'overlay' or 'avg'.")


def _label2rgb_overlay(
    label, image=None, colors=None, alpha=0.3, bg_label=-1, bg_color=None,
    image_alpha=1,
):
    if colors is None:
        colors = DEFAULT_COLORS
    colors = np.stack([_rgb_vector(c) for c in colors])

    if image is None:
        image = jnp.zeros(label.shape + (3,), dtype=np.float64)
        alpha = 1.0
    else:
        image = jnp.asarray(image)
        if image.shape[: label.ndim] != label.shape or image.ndim > label.ndim + 1:
            raise ValueError("`image` and `label` must be the same shape")
        import jax as _jax

        if not isinstance(image, _jax.core.Tracer) and float(
            image.min()
        ) < 0:
            warnings.warn(
                "Negative intensities in `image` are not supported"
            )
        if image.ndim == label.ndim + 1 and image.shape[-1] != 3:
            raise ValueError("`image` must be RGB")
        if image.ndim == label.ndim:
            image = gray2rgb(image)
        image = img_as_float(rgb2gray(image))
        image = gray2rgb(image) * image_alpha + (1 - image_alpha)

    # map label values to color indices (host-side unique; API-level sync
    # like the reference's label handling)
    labels_np = np.asarray(label)
    if labels_np.dtype.kind not in "iub":
        # non-integer label fields densify through unique/inverse (the
        # reference's rank mapping handles floats the same way)
        uniq, inv = np.unique(labels_np, return_inverse=True)
        hit = np.flatnonzero(uniq == bg_label)
        bg_label = int(hit[0]) if hit.size else -1
        labels_np = inv.reshape(labels_np.shape)
    offset = min(int(labels_np.min()), bg_label)
    if offset != 0:
        labels_np = labels_np - offset
        bg_label_adj = bg_label - offset
    else:
        bg_label_adj = bg_label
    unique_labels = np.unique(labels_np)
    fg_labels = unique_labels[unique_labels != bg_label_adj]
    color_cycle = itertools.cycle(range(len(colors)))
    lut = np.zeros((int(labels_np.max()) + 2, 3), dtype=np.float64)
    is_fg = np.zeros(int(labels_np.max()) + 2, dtype=bool)
    for lab_val, color_idx in zip(fg_labels, color_cycle):
        lut[int(lab_val)] = colors[color_idx]
        is_fg[int(lab_val)] = True
    if bg_color is not None and 0 <= bg_label_adj < lut.shape[0]:
        lut[bg_label_adj] = _rgb_vector(bg_color)

    mapped = jnp.asarray(lut)[jnp.asarray(labels_np)]
    fg_mask = jnp.asarray(is_fg)[jnp.asarray(labels_np)][..., None]
    result = mapped * alpha + image * (1 - alpha)
    if bg_color is None:
        result = jnp.where(fg_mask, result, image)
    else:
        bg = jnp.asarray(_rgb_vector(bg_color))
        bg_mask = jnp.asarray(labels_np == bg_label_adj)[..., None]
        result = jnp.where(bg_mask, bg * alpha + image * (1 - alpha), result)
        result = jnp.where(fg_mask | bg_mask, result, image)
    return result


def _label2rgb_avg(label_field, image, bg_label=0, bg_color=(0, 0, 0)):
    """Color each region with its average color (skimage parity)."""
    image = jnp.asarray(image)
    label_field = jnp.asarray(label_field)
    labels_np = np.asarray(label_field)
    out = jnp.zeros(label_field.shape + (3,), dtype=np.float64)
    img = image if image.ndim == label_field.ndim + 1 else gray2rgb(image)
    img = img_as_float(img)
    for lab_val in np.unique(labels_np):
        mask = jnp.asarray(labels_np == lab_val)
        if lab_val == bg_label:
            color = jnp.asarray(_rgb_vector(bg_color))
        else:
            denom = jnp.maximum(mask.sum(), 1)
            color = (img * mask[..., None]).sum(
                axis=tuple(range(label_field.ndim))
            ) / denom
        out = jnp.where(mask[..., None], color, out)
    return out
