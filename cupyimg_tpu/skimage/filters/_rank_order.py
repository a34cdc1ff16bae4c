"""rank_order (skimage.filters parity; reference
cupyimg/skimage/filters/_rank_order.py)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rank_order"]


def rank_order(image):
    """Rank-order the image values: each pixel replaced by the index of
    its value among the sorted unique values (skimage parity).

    Returns (labels, original_values).  Host sync for the unique count at
    the API boundary (like the reference's variable-size returns).
    """
    image = jnp.asarray(image)
    flat = image.ravel()
    sort_order = jnp.argsort(flat)
    sorted_vals = flat[sort_order]
    is_new = jnp.concatenate(
        [jnp.array([False]), sorted_vals[1:] != sorted_vals[:-1]]
    )
    ranks_sorted = jnp.cumsum(is_new.astype(jnp.int32))
    labels = jnp.zeros_like(ranks_sorted)
    labels = labels.at[sort_order].set(ranks_sorted)
    import numpy as np

    n_unique = int(ranks_sorted[-1]) + 1 if flat.size else 0
    unique_mask = np.asarray(
        jnp.concatenate([jnp.array([True]),
                         sorted_vals[1:] != sorted_vals[:-1]])
    )
    original_values = jnp.asarray(np.asarray(sorted_vals)[unique_mask])
    return labels.reshape(image.shape).astype(jnp.uint32), original_values
