"""Unsharp masking (skimage.filters parity; reference
cupyimg/skimage/filters/_unsharp_mask.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.filters._gaussian import gaussian
from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = ["unsharp_mask"]


def _unsharp_mask_single_channel(image, radius, amount):
    blurred = gaussian(image, sigma=radius, mode="nearest",
                       preserve_range=True)
    result = image + (image - blurred) * amount
    return result


def unsharp_mask(image, radius=1.0, amount=1.0, multichannel=False,
                 preserve_range=False):
    """Sharpen by amplifying the difference to a blurred copy (skimage
    parity)."""
    image = jnp.asarray(image)
    fimg = img_as_float(image) if not preserve_range else image.astype(
        np.float64
    )
    if multichannel:
        out = jnp.stack(
            [
                _unsharp_mask_single_channel(fimg[..., c], radius, amount)
                for c in range(image.shape[-1])
            ],
            axis=-1,
        )
    else:
        out = _unsharp_mask_single_channel(fimg, radius, amount)
    if not preserve_range:
        out = jnp.clip(out, -1.0 if float(fimg.min()) < 0 else 0.0, 1.0)
    return out
