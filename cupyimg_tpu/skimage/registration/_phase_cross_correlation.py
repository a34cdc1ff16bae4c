"""Subpixel translation registration by phase cross-correlation
(reference cupyimg/skimage/registration/_phase_cross_correlation.py).

Pure FFT + matrix-multiply DFT math — the upsampled-DFT refinement is a
chain of small ``tensordot`` contractions, which XLA schedules on the MXU
(SURVEY.md §3.6: this stack maps 1:1 to jnp).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from .._shared.fft import fftmodule as fft
from ._masked_phase_cross_correlation import _masked_phase_cross_correlation

__all__ = ["phase_cross_correlation"]


def _region_params(data_ndim, data_shape, upsampled_region_size, axis_offsets):
    if not hasattr(upsampled_region_size, "__iter__"):
        upsampled_region_size = [upsampled_region_size] * data_ndim
    else:
        if len(upsampled_region_size) != data_ndim:
            raise ValueError(
                "shape of upsampled region sizes must be equal "
                "to input data's number of dimensions."
            )
    if axis_offsets is None:
        axis_offsets = [0] * data_ndim
    else:
        if len(axis_offsets) != data_ndim:
            raise ValueError(
                "number of axis offsets must be equal to input "
                "data's number of dimensions."
            )
    return upsampled_region_size, axis_offsets


def _upsampled_dft_real(
    data_re, data_im, upsampled_region_size, upsample_factor=1,
    axis_offsets=None,
):
    """Upsampled DFT by matrix multiplication, in real arithmetic.

    Carries (re, im) planes and applies the per-axis DFT kernel
    K = exp(-i*theta) = cos(theta) - i*sin(theta) as two real tensordots
    per part.  Real matmuls map directly onto the MXU, and no complex
    values are constructed on device (``lax.complex`` is unavailable on
    some TPU runtimes).
    """
    upsampled_region_size, axis_offsets = _region_params(
        data_re.ndim, data_re.shape, upsampled_region_size, axis_offsets
    )
    real_dtype = data_re.dtype

    dim_properties = list(
        zip(data_re.shape, upsampled_region_size, axis_offsets)
    )
    for (n_items, ups_size, ax_offset) in dim_properties[::-1]:
        freqs = jnp.fft.fftfreq(
            n_items, upsample_factor, dtype=real_dtype
        )
        theta = (
            2
            * np.pi
            * (jnp.arange(ups_size, dtype=real_dtype) - ax_offset)[
                :, None
            ]
            * freqs
        )
        c = jnp.cos(theta)
        sn = jnp.sin(theta)
        # (c - i*sn) @ (re + i*im)
        new_re = jnp.tensordot(c, data_re, axes=(1, -1)) + jnp.tensordot(
            sn, data_im, axes=(1, -1)
        )
        new_im = jnp.tensordot(c, data_im, axes=(1, -1)) - jnp.tensordot(
            sn, data_re, axes=(1, -1)
        )
        data_re, data_im = new_re, new_im
    return data_re, data_im


def _upsampled_dft(
    data, upsampled_region_size, upsample_factor=1, axis_offsets=None
):
    """Upsampled DFT of a small region by matrix multiplication
    (reference _phase_cross_correlation.py:15-87).

    Complex-in/complex-out convenience wrapper over
    ``_upsampled_dft_real``; combining the parts requires complex
    construction, so use the real-pair form directly on TPU runtimes
    without ``lax.complex`` support.
    """
    data = jnp.asarray(data)
    re, im = _upsampled_dft_real(
        jnp.real(data),
        jnp.imag(data),
        upsampled_region_size,
        upsample_factor,
        axis_offsets,
    )
    from cupyimg_tpu.core.complexutil import make_complex
    return make_complex(re, im)


def _compute_phasediff(ccmax_real, ccmax_imag):
    """Global phase difference between the two images.

    Takes the real/imag parts separately: complex scalar host transfer is
    not supported on all TPU runtimes, and the math only needs floats.
    """
    return jnp.arctan2(ccmax_imag, ccmax_real)


def _compute_error(ccmax_real, ccmax_imag, src_amp, target_amp):
    """Translation-invariant normalized RMS error (from |CCmax|^2)."""
    error = 1.0 - (ccmax_real**2 + ccmax_imag**2) / (
        src_amp * target_amp
    )
    return jnp.sqrt(jnp.abs(error))


@functools.partial(
    jax.jit,
    static_argnames=("upsample_factor", "return_error", "fourier_space"),
)
def _pcc_core(
    reference_image, moving_image, upsample_factor, return_error,
    fourier_space,
):
    """The whole registration pipeline as ONE compiled computation:
    FFTs, correlation peak, matrix-multiply DFT refinement.  Eagerly
    dispatched this chain costs ~15 device round trips per call."""
    if fourier_space:
        src_freq = reference_image
        target_freq = moving_image
    else:
        src_freq = fft.fftn(reference_image)
        target_freq = fft.fftn(moving_image)

    # Whole-pixel shift - cross-correlation by an IFFT
    shape = src_freq.shape
    image_product = src_freq * target_freq.conj()
    cross_correlation = fft.ifftn(image_product)

    # Locate maximum
    maxima = jnp.unravel_index(
        jnp.argmax(jnp.abs(cross_correlation)), cross_correlation.shape
    )
    midpoints = np.array([np.fix(axis_size / 2) for axis_size in shape])

    float_dtype = (
        np.float64 if jnp.zeros(0).dtype == jnp.float64 else np.float32
    )
    shifts = jnp.stack(
        [m.astype(float_dtype) for m in maxima]
    )
    shifts = jnp.where(
        shifts > jnp.asarray(midpoints, dtype=shifts.dtype),
        shifts - jnp.asarray(shape, dtype=shifts.dtype),
        shifts,
    )

    src_amp = target_amp = ccmax_re = ccmax_im = None
    if upsample_factor == 1:
        if return_error:
            src_amp = jnp.sum(jnp.abs(src_freq) ** 2) / src_freq.size
            target_amp = (
                jnp.sum(jnp.abs(target_freq) ** 2) / target_freq.size
            )
            ccmax_re = cross_correlation.real[maxima]
            ccmax_im = cross_correlation.imag[maxima]
    else:
        # refine estimate with matrix-multiply DFT
        shifts = jnp.around(shifts * upsample_factor) / upsample_factor
        upsampled_region_size = math.ceil(upsample_factor * 1.5)
        dftshift = np.fix(upsampled_region_size / 2.0)
        upsample_factor = float(upsample_factor)
        sample_region_offset = dftshift - shifts * upsample_factor
        # conj(input) in, conj(output) out — all in real-pair arithmetic
        cc_re, cc_im = _upsampled_dft_real(
            jnp.real(image_product),
            -jnp.imag(image_product),
            upsampled_region_size,
            upsample_factor,
            sample_region_offset,
        )
        cc_im = -cc_im
        maxima = jnp.unravel_index(
            jnp.argmax(cc_re * cc_re + cc_im * cc_im),
            cc_re.shape,
        )
        ccmax_re = cc_re[maxima]
        ccmax_im = cc_im[maxima]

        maxima_arr = (
            jnp.stack([m.astype(float_dtype) for m in maxima]) - dftshift
        )
        shifts = shifts + maxima_arr / upsample_factor

        if return_error:
            src_amp = jnp.sum(jnp.abs(src_freq) ** 2)
            target_amp = jnp.sum(jnp.abs(target_freq) ** 2)

    # a singleton dimension admits no shift
    singleton = np.array([s == 1 for s in shape])
    if singleton.any():
        shifts = jnp.where(jnp.asarray(singleton), 0.0, shifts)

    if not return_error:
        return shifts, None, None, None
    nan_found = (
        jnp.isnan(ccmax_re)
        | jnp.isnan(ccmax_im)
        | jnp.isnan(src_amp)
        | jnp.isnan(target_amp)
    )
    return (
        shifts,
        _compute_error(ccmax_re, ccmax_im, src_amp, target_amp),
        _compute_phasediff(ccmax_re, ccmax_im),
        nan_found,
    )


def phase_cross_correlation(
    reference_image,
    moving_image,
    *,
    upsample_factor=1,
    space="real",
    return_error=True,
    reference_mask=None,
    moving_mask=None,
    overlap_ratio=0.3,
):
    """Efficient subpixel image translation registration by
    cross-correlation (skimage parity; reference
    _phase_cross_correlation.py:120-320).

    Returns ``shifts`` (and ``error``, ``phasediff`` if
    ``return_error``); with masks, dispatches to the Padfield masked NCC.
    """
    if (reference_mask is not None) or (moving_mask is not None):
        return _masked_phase_cross_correlation(
            reference_image,
            moving_image,
            reference_mask,
            moving_mask,
            overlap_ratio,
        )

    reference_image = jnp.asarray(reference_image)
    moving_image = jnp.asarray(moving_image)
    if reference_image.shape != moving_image.shape:
        raise ValueError("images must be same shape")
    if space.lower() not in ("real", "fourier"):
        raise ValueError('space argument must be "real" of "fourier"')

    shifts, error, phasediff, nan_found = _pcc_core(
        reference_image,
        moving_image,
        int(upsample_factor),
        bool(return_error),
        space.lower() == "fourier",
    )
    if not return_error:
        return shifts
    if isinstance(nan_found, jax.core.Tracer):
        # under jit the NaN check cannot raise eagerly; NaNs propagate
        # into the returned shifts/error instead
        return shifts, error, phasediff
    if bool(nan_found):
        raise ValueError(
            "NaN values found, please remove NaNs from your "
            "input data or use the `reference_mask`/`moving_mask` "
            "keywords, eg: "
            "phase_cross_correlation(reference_image, moving_image, "
            "reference_mask=~np.isnan(reference_image), "
            "moving_mask=~np.isnan(moving_image))"
        )
    return shifts, error, phasediff
