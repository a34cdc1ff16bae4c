"""J-invariant denoiser calibration (Noise2Self) — reference
cupyimg/skimage/restoration/j_invariant.py."""

from __future__ import annotations

import itertools
import functools

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from ..metrics import mean_squared_error
from ..util import img_as_float

__all__ = ["calibrate_denoiser"]


def _interpolate_image(image, *, multichannel=False):
    """Replace each pixel with the average of its neighbors
    (reference j_invariant.py:12-38)."""
    spatialdims = image.ndim if not multichannel else image.ndim - 1
    conv_filter = np.asarray(
        ndi.generate_binary_structure(spatialdims, 1)
    ).astype(np.dtype(image.dtype))
    conv_filter.ravel()[conv_filter.size // 2] = 0
    conv_filter /= conv_filter.sum()

    if multichannel:
        conv_filter = conv_filter[..., np.newaxis]
    return ndi.convolve(image, jnp.asarray(conv_filter), mode="mirror")


def _generate_grid_slice(shape, *, offset, stride=3):
    """Slices selecting a uniformly-spaced grid of points
    (reference j_invariant.py:41-87)."""
    phases = np.unravel_index(offset, (stride,) * len(shape))
    return tuple(slice(p, None, stride) for p in phases)


def _invariant_denoise(
    image, denoise_function, *, stride=4, masks=None,
    denoiser_kwargs=None,
):
    """J-invariant version of ``denoise_function``
    (reference j_invariant.py:90-138)."""
    image = img_as_float(image)
    if denoiser_kwargs is None:
        denoiser_kwargs = {}

    multichannel = denoiser_kwargs.get("multichannel", False)
    interp = _interpolate_image(image, multichannel=multichannel)
    output = jnp.zeros_like(image)

    if masks is None:
        spatialdims = image.ndim if not multichannel else image.ndim - 1
        n_masks = stride**spatialdims
        masks = (
            _generate_grid_slice(
                image.shape[:spatialdims], offset=idx, stride=stride
            )
            for idx in range(n_masks)
        )

    for mask in masks:
        input_image = image.at[mask].set(interp[mask])
        denoised = denoise_function(input_image, **denoiser_kwargs)
        output = output.at[mask].set(jnp.asarray(denoised)[mask])
    return output


def _product_from_dict(dictionary):
    """Cartesian product of a dict of lists, as dicts."""
    keys = dictionary.keys()
    for element in itertools.product(*dictionary.values()):
        yield dict(zip(keys, element))


def calibrate_denoiser(
    image,
    denoise_function,
    denoise_parameters,
    *,
    stride=4,
    approximate_loss=True,
    extra_output=False,
):
    """Calibrate a denoising function via the self-supervised
    (Noise2Self) MSE loss and return its optimal J-invariant version
    (reference j_invariant.py:162-262)."""
    parameters_tested, losses = _calibrate_denoiser_search(
        image,
        denoise_function,
        denoise_parameters=denoise_parameters,
        stride=stride,
        approximate_loss=approximate_loss,
    )

    idx = int(np.argmin(losses))
    best_parameters = parameters_tested[idx]

    best_denoise_function = functools.partial(
        _invariant_denoise,
        denoise_function=denoise_function,
        stride=stride,
        denoiser_kwargs=best_parameters,
    )

    if extra_output:
        return best_denoise_function, (parameters_tested, losses)
    return best_denoise_function


def _calibrate_denoiser_search(
    image,
    denoise_function,
    denoise_parameters,
    *,
    stride=4,
    approximate_loss=True,
):
    """Grid-search history with self-supervised losses
    (reference j_invariant.py:265-336)."""
    image = img_as_float(image)
    parameters_tested = list(_product_from_dict(denoise_parameters))
    losses = []

    for denoiser_kwargs in parameters_tested:
        multichannel = denoiser_kwargs.get("multichannel", False)
        if not approximate_loss:
            denoised = _invariant_denoise(
                image,
                denoise_function,
                stride=stride,
                denoiser_kwargs=denoiser_kwargs,
            )
            loss = mean_squared_error(image, denoised)
        else:
            spatialdims = (
                image.ndim if not multichannel else image.ndim - 1
            )
            n_masks = stride**spatialdims
            mask = _generate_grid_slice(
                image.shape[:spatialdims],
                offset=n_masks // 2,
                stride=stride,
            )
            masked_denoised = _invariant_denoise(
                image,
                denoise_function,
                masks=[mask],
                denoiser_kwargs=denoiser_kwargs,
            )
            loss = mean_squared_error(
                image[mask], masked_denoised[mask]
            )

        losses.append(float(loss))

    return parameters_tested, losses
