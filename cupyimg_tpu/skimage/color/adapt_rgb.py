"""adapt_rgb decorator (skimage.color.adapt_rgb parity)."""

from __future__ import annotations

import functools

import jax.numpy as jnp

from cupyimg_tpu.skimage.color.colorconv import gray2rgb, rgb2gray
from cupyimg_tpu.skimage.color import colorconv
from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = ["adapt_rgb", "hsv_value", "each_channel"]


def is_rgb_like(image):
    return jnp.ndim(image) == 3 and jnp.shape(image)[2] in (3, 4)


def adapt_rgb(apply_to_rgb):
    """Decorator adapting a gray-scale filter to RGB images."""

    def decorator(image_filter):
        @functools.wraps(image_filter)
        def image_filter_adapted(image, *args, **kwargs):
            if is_rgb_like(image):
                return apply_to_rgb(image_filter, image, *args, **kwargs)
            return image_filter(image, *args, **kwargs)

        return image_filter_adapted

    return decorator


def hsv_value(image_filter, image, *args, **kwargs):
    """Apply the filter to the V channel of HSV."""
    hsv = colorconv.rgb2hsv(image[..., :3])
    value = hsv[..., 2]
    filtered = image_filter(value, *args, **kwargs)
    hsv = hsv.at[..., 2].set(img_as_float(filtered))
    return colorconv.hsv2rgb(hsv)


def each_channel(image_filter, image, *args, **kwargs):
    """Apply the filter to each RGB channel independently."""
    channels = [
        image_filter(image[..., c], *args, **kwargs)
        for c in range(image.shape[-1])
    ]
    return jnp.stack(channels, axis=-1)
