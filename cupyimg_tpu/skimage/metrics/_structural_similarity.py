"""SSIM (skimage.metrics.structural_similarity parity; reference
cupyimg/skimage/metrics/_structural_similarity.py; Wang et al. 2004)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import gaussian_filter, uniform_filter
from cupyimg_tpu.skimage._shared.utils import check_shape_equality, warn
from cupyimg_tpu.skimage.util.arraycrop import crop
from cupyimg_tpu.skimage.util.dtype import dtype_range

__all__ = ["structural_similarity"]


def structural_similarity(
    im1,
    im2,
    *,
    win_size=None,
    gradient=False,
    data_range=None,
    multichannel=False,
    channel_axis=None,
    gaussian_weights=False,
    full=False,
    **kwargs,
):
    """Mean structural similarity index between two images (skimage
    parity; optionally also the gradient and/or the full SSIM image)."""
    im1 = jnp.asarray(im1)
    im2 = jnp.asarray(im2)
    check_shape_equality(im1, im2)

    if channel_axis is not None:
        multichannel = True
    if multichannel:
        # apply per channel along the last axis
        args = dict(
            win_size=win_size,
            gradient=gradient,
            data_range=data_range,
            multichannel=False,
            gaussian_weights=gaussian_weights,
            full=full,
        )
        args.update(kwargs)
        nch = im1.shape[-1]
        mssim = []
        grads = []
        fulls = []
        for ch in range(nch):
            result = structural_similarity(
                im1[..., ch], im2[..., ch], **args
            )
            if gradient and full:
                mssim.append(result[0])
                grads.append(result[1])
                fulls.append(result[2])
            elif gradient:
                mssim.append(result[0])
                grads.append(result[1])
            elif full:
                mssim.append(result[0])
                fulls.append(result[1])
            else:
                mssim.append(result)
        mssim = jnp.mean(jnp.stack([jnp.asarray(m) for m in mssim]))
        out = [mssim]
        if gradient:
            out.append(jnp.stack(grads, axis=-1))
        if full:
            out.append(jnp.stack(fulls, axis=-1))
        return tuple(out) if len(out) > 1 else out[0]

    K1 = kwargs.pop("K1", 0.01)
    K2 = kwargs.pop("K2", 0.03)
    sigma = kwargs.pop("sigma", 1.5)
    use_sample_covariance = kwargs.pop("use_sample_covariance", True)
    if K1 < 0 or K2 < 0 or sigma < 0:
        raise ValueError("K1, K2 and sigma must all be positive")

    if gaussian_weights:
        truncate = 3.5
    if win_size is None:
        if gaussian_weights:
            r = int(truncate * sigma + 0.5)
            win_size = 2 * r + 1
        else:
            win_size = 7
    if np.any((np.asarray(im1.shape) - win_size) < 0):
        raise ValueError(
            "win_size exceeds image extent. If the input is a "
            "multichannel (color) image, set multichannel=True."
        )
    if not (win_size % 2 == 1):
        raise ValueError("Window size must be odd.")

    if data_range is None:
        if im1.dtype != im2.dtype:
            warn(
                "Inputs have mismatched dtype. Setting data_range based on "
                "im1.dtype.",
                stacklevel=2,
            )
        dmin, dmax = dtype_range[np.dtype(im1.dtype).type]
        data_range = dmax - dmin

    ndim = im1.ndim
    if gaussian_weights:
        filter_func = gaussian_filter
        filter_args = {"sigma": sigma, "truncate": truncate}
    else:
        filter_func = uniform_filter
        filter_args = {"size": win_size}

    NP = win_size ** ndim
    cov_norm = NP / (NP - 1) if use_sample_covariance else 1.0

    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    ux = filter_func(im1, **filter_args)
    uy = filter_func(im2, **filter_args)
    uxx = filter_func(im1 * im1, **filter_args)
    uyy = filter_func(im2 * im2, **filter_args)
    uxy = filter_func(im1 * im2, **filter_args)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = data_range
    C1 = (K1 * R) ** 2
    C2 = (K2 * R) ** 2

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    D = B1 * B2
    S = (A1 * A2) / D

    pad = (win_size - 1) // 2
    mssim = jnp.mean(crop(S, pad))

    out = [mssim]
    if gradient:
        # local gradient of MSSIM w.r.t. im2 (Avanaki 2009 formulation)
        grad = filter_func(A1 / D, **filter_args) * im1
        grad = grad + filter_func(-S / B2, **filter_args) * im2
        grad = grad + filter_func(
            (ux * (A2 - A1) - uy * (B2 - B1) * S) / D, **filter_args
        )
        grad = grad * (2 / im1.size)
        out.append(grad)
    if full:
        out.append(S)
    return tuple(out) if len(out) > 1 else mssim
