"""match_histograms (skimage.exposure parity; reference
cupyimg/skimage/exposure/histogram_matching.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["match_histograms"]


def _match_cumulative_cdf(source, template):
    """Map source values so their CDF matches the template's."""
    src = source.ravel()
    tmpl = template.ravel()
    # quantile arithmetic must run in the default float dtype: an
    # int32 rank divided by a Python int promotes to float32 even
    # under x64, which costs ~1e-7 on otherwise-exact knot hits
    ftype = jnp.result_type(float)
    # quantile of each source value among source values
    src_sorted = jnp.sort(src)
    # CDF position of each pixel: searchsorted right gives rank
    src_rank = jnp.searchsorted(src_sorted, src, side="right")
    src_quantiles = src_rank.astype(ftype) / src.shape[0]
    tmpl_sorted = jnp.sort(tmpl).astype(ftype)
    tmpl_quantiles = (
        jnp.arange(tmpl.shape[0], dtype=ftype) + 1
    ) / tmpl.shape[0]
    interp = jnp.interp(src_quantiles, tmpl_quantiles, tmpl_sorted)
    return interp.reshape(source.shape)


def match_histograms(image, reference, multichannel=False,
                     channel_axis=None):
    """Adjust ``image``'s histogram to match ``reference`` (skimage
    parity)."""
    image = jnp.asarray(image)
    reference = jnp.asarray(reference)
    if channel_axis is not None:
        multichannel = True
    if image.ndim != reference.ndim:
        raise ValueError(
            "Image and reference must have the same number of channels."
        )
    if multichannel:
        if image.shape[-1] != reference.shape[-1]:
            raise ValueError(
                "Number of channels in the input image and reference image "
                "must match!"
            )
        matched = [
            _match_cumulative_cdf(image[..., c], reference[..., c])
            for c in range(image.shape[-1])
        ]
        return jnp.stack(matched, axis=-1)
    return _match_cumulative_cdf(image, reference)
