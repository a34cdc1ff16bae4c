"""skimage.util.random_noise (reference cupyimg/skimage/util/noise.py).

Uses JAX's counter-based PRNG (seeded via ``seed``); noise realizations
differ from skimage's MT19937 stream but match in distribution.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = ["random_noise"]


def random_noise(image, mode="gaussian", seed=None, clip=True, **kwargs):
    """Add random noise of various types to an image (skimage parity)."""
    image = img_as_float(jnp.asarray(image))
    key = jax.random.PRNGKey(0 if seed is None else int(seed))
    mode = mode.lower()

    if image.min() < 0:
        low_clip = -1.0
    else:
        low_clip = 0.0

    if mode in ("gaussian", "speckle"):
        mean = kwargs.get("mean", 0.0)
        var = kwargs.get("var", 0.01)
        noise = mean + jnp.sqrt(var) * jax.random.normal(
            key, image.shape, dtype=image.dtype
        )
        if mode == "gaussian":
            out = image + noise
        else:
            out = image + image * noise
    elif mode == "localvar":
        local_vars = jnp.asarray(kwargs["local_vars"])
        # upstream contract: every local variance strictly positive; the
        # check is data-dependent, so traced values skip it (same policy
        # as util/dtype.py's range checks)
        if not isinstance(local_vars, jax.core.Tracer) and np.any(
            np.asarray(local_vars) <= 0
        ):
            raise ValueError("All values of `local_vars` must be > 0.")
        out = image + jnp.sqrt(local_vars) * jax.random.normal(
            key, image.shape, dtype=image.dtype
        )
    elif mode == "poisson":
        vals = len(np.unique(np.asarray(image)))
        vals = 2 ** np.ceil(np.log2(vals))
        if low_clip == -1.0:
            old_max = image.max()
            image = (image + 1.0) / (old_max + 1.0)
        out = jax.random.poisson(key, image * vals, image.shape) / float(vals)
        if low_clip == -1.0:
            out = out * (old_max + 1.0) - 1.0
    elif mode in ("salt", "pepper", "s&p"):
        amount = kwargs.get("amount", 0.05)
        salt_vs_pepper = kwargs.get("salt_vs_pepper", 0.5)
        u = jax.random.uniform(key, image.shape)
        if mode == "salt":
            out = jnp.where(u < amount, 1.0, image)
        elif mode == "pepper":
            out = jnp.where(u < amount, low_clip, image)
        else:
            flipped = u < amount
            k2 = jax.random.fold_in(key, 1)
            salted = jax.random.uniform(k2, image.shape) < salt_vs_pepper
            out = jnp.where(flipped & salted, 1.0, image)
            out = jnp.where(flipped & ~salted, low_clip, out)
    else:
        # upstream raises KeyError (allowed-types dict lookup)
        raise KeyError(f"unknown noise mode: {mode}")

    if clip:
        out = jnp.clip(out, low_clip, 1.0)
    return out
