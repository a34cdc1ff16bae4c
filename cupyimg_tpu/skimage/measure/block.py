"""block_reduce (skimage.measure parity; reference
cupyimg/skimage/measure/block.py): pad to a multiple of the block size,
view as blocks, reduce over block axes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.util.shape import view_as_blocks

__all__ = ["block_reduce"]


def block_reduce(image, block_size, func=jnp.sum, cval=0, func_kwargs=None):
    """Downsample by applying ``func`` to local blocks (skimage parity)."""
    image = jnp.asarray(image)
    if np.isscalar(block_size):
        block_size = (int(block_size),) * image.ndim
    if len(block_size) != image.ndim:
        raise ValueError(
            "`block_size` must have the same length as `image.shape`."
        )
    if func_kwargs is None:
        func_kwargs = {}
    pad_width = []
    for i in range(len(block_size)):
        if block_size[i] < 1:
            raise ValueError(
                "Down-sampling factors must be >= 1. Use "
                "`skimage.transform.resize` to up-sample an image."
            )
        if image.shape[i] % block_size[i] != 0:
            after_width = block_size[i] - (image.shape[i] % block_size[i])
        else:
            after_width = 0
        pad_width.append((0, after_width))
    image = jnp.pad(image, pad_width, mode="constant", constant_values=cval)
    blocked = view_as_blocks(image, tuple(block_size))
    return func(
        blocked, axis=tuple(range(image.ndim, blocked.ndim)), **func_kwargs
    )
