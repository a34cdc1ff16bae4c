"""shannon_entropy (reference cupyimg/skimage/measure/entropy.py)."""

from __future__ import annotations

import jax.numpy as jnp

from cupyimg_tpu.scipy.stats import entropy as scipy_entropy

__all__ = ["shannon_entropy"]


def shannon_entropy(image, base=2):
    """Shannon entropy of an image: S = -sum(pk * log(pk)) over the
    frequency of each distinct pixel value."""
    _, counts = jnp.unique(jnp.asarray(image), return_counts=True)
    return scipy_entropy(counts, base=base)
