"""Masked normalized cross-correlation (Padfield) — reference
cupyimg/skimage/registration/_masked_phase_cross_correlation.py.

Six FFTs + elementwise normalization; expressed functionally so the whole
pipeline fuses under jit (no in-place masking passes).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp

from .._shared.fft import fftmodule, next_fast_len

__all__ = ["cross_correlate_masked"]


def _masked_phase_cross_correlation(
    reference_image,
    moving_image,
    reference_mask,
    moving_mask=None,
    overlap_ratio=0.3,
):
    """Masked image translation registration by masked normalized
    cross-correlation (reference _masked_phase_cross_correlation.py:19-113).
    """
    reference_image = jnp.asarray(reference_image)
    moving_image = jnp.asarray(moving_image)
    if moving_mask is None:
        if reference_image.shape != moving_image.shape:
            raise ValueError(
                "Input images have different shapes, moving_mask must "
                "be explicitely set."
            )
        moving_mask = jnp.asarray(reference_mask, dtype=bool)

    for (im, mask) in [
        (reference_image, reference_mask),
        (moving_image, moving_mask),
    ]:
        if im.shape != jnp.asarray(mask).shape:
            raise ValueError(
                "Image sizes must match their respective mask sizes."
            )

    xcorr = cross_correlate_masked(
        moving_image,
        reference_image,
        moving_mask,
        reference_mask,
        axes=tuple(range(moving_image.ndim)),
        mode="full",
        overlap_ratio=overlap_ratio,
    )

    # Generalize to the average of multiple equal maxima
    maxima = jnp.stack(jnp.nonzero(xcorr == xcorr.max()), axis=1)
    center = jnp.mean(maxima.astype(float), axis=0)
    shifts = center - jnp.asarray(reference_image.shape) + 1

    size_mismatch = jnp.asarray(
        [
            t - s
            for t, s in zip(moving_image.shape, reference_image.shape)
        ]
    )
    return -shifts + (size_mismatch / 2)


def cross_correlate_masked(
    arr1, arr2, m1, m2, mode="full", axes=(-2, -1), overlap_ratio=0.3
):
    """Masked normalized cross-correlation between arrays (reference
    _masked_phase_cross_correlation.py:116-294)."""
    if mode not in {"full", "same"}:
        raise ValueError(
            "Correlation mode {} is not valid.".format(mode)
        )

    arr1 = jnp.asarray(arr1)
    arr2 = jnp.asarray(arr2)
    if np.dtype(arr1.dtype).kind == "c" or np.dtype(arr2.dtype).kind == "c":
        raise ValueError("complex-valued arr1, arr2 are not supported")

    float_dtype = (
        np.float64 if jnp.zeros(0).dtype == jnp.float64 else np.float32
    )
    fixed_image = arr1.astype(float_dtype)
    fixed_mask = jnp.asarray(m1, dtype=bool)
    moving_image = arr2.astype(float_dtype)
    moving_mask = jnp.asarray(m2, dtype=bool)
    eps = np.finfo(float_dtype).eps

    # Array dimensions along non-transformation axes should be equal.
    all_axes = set(range(fixed_image.ndim))
    axes = tuple(ax % fixed_image.ndim for ax in axes)
    for axis in all_axes - set(axes):
        if fixed_image.shape[axis] != moving_image.shape[axis]:
            raise ValueError(
                "Array shapes along non-transformation axes should be "
                "equal, but dimensions along axis {a} are not".format(
                    a=axis
                )
            )

    final_shape = list(arr1.shape)
    for axis in axes:
        final_shape[axis] = (
            fixed_image.shape[axis] + moving_image.shape[axis] - 1
        )
    final_shape = tuple(final_shape)
    final_slice = tuple([slice(0, int(sz)) for sz in final_shape])

    fast_shape = tuple(
        [next_fast_len(final_shape[ax]) for ax in axes]
    )

    fft = partial(fftmodule.fftn, s=fast_shape, axes=axes)
    ifft = partial(fftmodule.ifftn, s=fast_shape, axes=axes)

    fixed_image = jnp.where(fixed_mask, fixed_image, 0.0)
    moving_image = jnp.where(moving_mask, moving_image, 0.0)

    # N-dim analog to rotation by 180 deg: flip over the correlation axes
    rotated_moving_image = _flip(moving_image, axes=axes)
    rotated_moving_mask = _flip(moving_mask, axes=axes)

    fixed_fft = fft(fixed_image)
    rotated_moving_fft = fft(rotated_moving_image)
    fixed_mask_fft = fft(fixed_mask.astype(float_dtype))
    rotated_moving_mask_fft = fft(
        rotated_moving_mask.astype(float_dtype)
    )

    number_overlap_masked_px = jnp.real(
        ifft(rotated_moving_mask_fft * fixed_mask_fft)
    )
    number_overlap_masked_px = jnp.around(number_overlap_masked_px)
    number_overlap_masked_px = jnp.fmax(number_overlap_masked_px, eps)
    masked_correlated_fixed_fft = ifft(
        rotated_moving_mask_fft * fixed_fft
    )
    masked_correlated_rotated_moving_fft = ifft(
        fixed_mask_fft * rotated_moving_fft
    )

    numerator = ifft(rotated_moving_fft * fixed_fft)
    numerator = numerator - (
        masked_correlated_fixed_fft
        * masked_correlated_rotated_moving_fft
        / number_overlap_masked_px
    )

    fixed_squared_fft = fft(jnp.square(fixed_image))
    fixed_denom = ifft(rotated_moving_mask_fft * fixed_squared_fft)
    fixed_denom = fixed_denom - (
        jnp.square(masked_correlated_fixed_fft)
        / number_overlap_masked_px
    )
    fixed_denom = jnp.fmax(fixed_denom.real, 0.0)

    rotated_moving_squared_fft = fft(jnp.square(rotated_moving_image))
    moving_denom = ifft(fixed_mask_fft * rotated_moving_squared_fft)
    moving_denom = moving_denom - (
        jnp.square(masked_correlated_rotated_moving_fft)
        / number_overlap_masked_px
    )
    moving_denom = jnp.fmax(moving_denom.real, 0.0)

    denom = jnp.sqrt(fixed_denom * moving_denom)

    numerator = numerator[final_slice]
    denom = denom[final_slice]
    number_overlap_masked_px = number_overlap_masked_px[final_slice]

    if mode == "same":
        _centering = partial(
            _centered, newshape=fixed_image.shape, axes=axes
        )
        denom = _centering(denom)
        numerator = _centering(numerator)
        number_overlap_masked_px = _centering(
            number_overlap_masked_px
        )

    # zero-out pixels where `denom` is numerically negligible
    tol = 1e3 * eps * jnp.max(
        jnp.abs(denom), axis=axes, keepdims=True
    )
    nonzero_indices = denom > tol

    numerator = numerator.real
    out = jnp.where(nonzero_indices, numerator / jnp.where(
        nonzero_indices, denom, 1.0), 0.0)
    out = jnp.clip(out, -1, 1)

    # Apply overlap ratio threshold
    number_px_threshold = overlap_ratio * jnp.max(
        number_overlap_masked_px, axis=axes, keepdims=True
    )
    out = jnp.where(
        number_overlap_masked_px < number_px_threshold, 0.0, out
    )
    return out


def _centered(arr, newshape, axes):
    """Return the center ``newshape`` portion of ``arr`` along ``axes``."""
    currshape = arr.shape
    slices = [slice(None, None)] * arr.ndim
    for ax in axes:
        startind = (currshape[ax] - newshape[ax]) // 2
        endind = startind + newshape[ax]
        slices[ax] = slice(startind, endind)
    return arr[tuple(slices)]


def _flip(arr, axes=None):
    """Reverse array over many axes."""
    if axes is None:
        reverse = [slice(None, None, -1)] * arr.ndim
    else:
        reverse = [slice(None, None, None)] * arr.ndim
        for axis in axes:
            reverse[axis] = slice(None, None, -1)
    return arr[tuple(reverse)]
