"""Image warping (skimage.transform parity; reference
cupyimg/skimage/transform/_warps.py, SURVEY.md S11): geometry is resolved to
dense inverse-map coordinates and the bulk gather runs through the
TPU-native spline engine (scipy.ndimage.map_coordinates / zoom)."""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage._shared.utils import (
    _validate_interpolation_order,
    convert_to_float,
    safe_as_int,
)
from cupyimg_tpu.skimage.measure.block import block_reduce
from cupyimg_tpu.skimage.transform._geometric import (
    AffineTransform,
    ProjectiveTransform,
    SimilarityTransform,
)

__all__ = [
    "warp",
    "warp_coords",
    "warp_polar",
    "resize",
    "rescale",
    "rotate",
    "swirl",
    "downscale_local_mean",
]

HOMOGRAPHY_TRANSFORMS = (
    SimilarityTransform,
    AffineTransform,
    ProjectiveTransform,
)


def _to_ndimage_mode(mode):
    """np.pad-style mode name -> ndimage mode (skimage convention)."""
    # reference _geometric.py:14-21: np.pad names map onto the LEGACY
    # ndimage modes ('wrap' stays period-(n-1) legacy wrap, 'constant'
    # stays legacy constant) — skimage only moved to the grid- modes
    # after the reference's era
    mode_translation_dict = {
        "constant": "constant",
        "edge": "nearest",
        "symmetric": "reflect",
        "reflect": "mirror",
        "wrap": "wrap",
    }
    # ndimage-native names ('nearest', 'mirror', 'grid-wrap', ...) pass
    # through untranslated, like the reference (_geometric.py:14-21);
    # map_coordinates itself rejects genuinely unknown modes
    return mode_translation_dict.get(mode, mode)


def _clip_warp_output(input_image, output_image, mode, cval, clip):
    """Clip output to the input's intensity range (skimage parity).

    Kept traced (no host sync) so ``warp`` remains jittable."""
    if not clip:
        return output_image
    min_val = jnp.min(input_image)
    max_val = jnp.max(input_image)
    if mode == "constant":
        min_val = jnp.minimum(min_val, cval)
        max_val = jnp.maximum(max_val, cval)
    return jnp.clip(output_image, min_val, max_val)


def warp_coords(coord_map, shape, dtype=np.float64):
    """Build the coordinate array for warping (skimage parity: coord_map
    maps output (col, row) -> input (col, row))."""
    shape = tuple(shape)
    rows, cols = shape[0], shape[1]
    tf_coords = jnp.stack(
        jnp.meshgrid(
            jnp.arange(cols, dtype=dtype),
            jnp.arange(rows, dtype=dtype),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)
    mapped = jnp.asarray(coord_map(tf_coords)).astype(dtype)
    # (x, y) -> rows=y, cols=x
    map_rows = mapped[:, 1].reshape(rows, cols)
    map_cols = mapped[:, 0].reshape(rows, cols)
    if len(shape) == 2:
        return jnp.stack([map_rows, map_cols], axis=0)
    # multichannel: identity map over the trailing dim
    nch = shape[2]
    coords = jnp.stack(
        [
            jnp.broadcast_to(map_rows[..., None], (rows, cols, nch)),
            jnp.broadcast_to(map_cols[..., None], (rows, cols, nch)),
            jnp.broadcast_to(
                jnp.arange(nch, dtype=dtype), (rows, cols, nch)
            ),
        ],
        axis=0,
    )
    return coords


def warp(
    image,
    inverse_map,
    map_args=None,
    output_shape=None,
    order=None,
    mode="constant",
    cval=0.0,
    clip=True,
    preserve_range=False,
):
    """Warp an image according to a given inverse coordinate map
    (skimage parity: transforms, callables, or dense coordinate arrays)."""
    if map_args is None:
        map_args = {}
    image = jnp.asarray(image)
    if image.size == 0:
        raise ValueError("Cannot warp empty image with dimensions")
    order = _validate_interpolation_order(image.dtype, order)
    if np.dtype(image.dtype).kind != "c":
        # reference _warps.py:946-951: ALWAYS float (bool/int included),
        # scaled by img_as_float unless preserve_range
        image = convert_to_float(image, preserve_range)
    input_shape = image.shape
    if output_shape is None:
        output_shape = input_shape
    else:
        output_shape = tuple(safe_as_int(output_shape))

    if isinstance(inverse_map, jnp.ndarray) and inverse_map.shape == (3, 3):
        inverse_map = np.asarray(inverse_map)
    if isinstance(inverse_map, np.ndarray) and inverse_map.shape == (3, 3):
        inverse_map = ProjectiveTransform(matrix=inverse_map)

    # affine-form homography on a 2-D image: dispatch to
    # ndi.affine_transform (identical math through map_coordinates, but
    # it routes to the one-hot MXU sampler on TPU instead of a dense
    # per-point gather).  skimage's (x, y) convention transposes to
    # ndi's (row, col).
    if (
        isinstance(inverse_map, HOMOGRAPHY_TRANSFORMS)
        and image.ndim == 2
        and len(output_shape) == 2
    ):
        H = np.asarray(inverse_map.params)
        if H.shape == (3, 3) and np.allclose(H[2], [0, 0, 1]):
            mat_rc = np.array(
                [[H[1, 1], H[1, 0]], [H[0, 1], H[0, 0]]]
            )
            off_rc = np.array([H[1, 2], H[0, 2]])
            ndi_mode = _to_ndimage_mode(mode)
            warped = ndi.affine_transform(
                image,
                mat_rc,
                offset=off_rc,
                output_shape=tuple(output_shape),
                order=order,
                mode=ndi_mode,
                cval=cval,
                prefilter=order > 1,
                allow_float32=np.dtype(image.dtype) != np.float64,
            )
            return _clip_warp_output(image, warped, mode, cval, clip)

    if isinstance(inverse_map, (np.ndarray, jnp.ndarray)) and (
        jnp.asarray(inverse_map).ndim >= 2
        and jnp.asarray(inverse_map).shape[0] == image.ndim
    ):
        # dense coordinate array in (row, col, ...) convention
        coords = jnp.asarray(inverse_map)
    elif callable(inverse_map) or isinstance(
        inverse_map, HOMOGRAPHY_TRANSFORMS
    ):
        if image.ndim < 2 or image.ndim > 3:
            raise ValueError(
                "Only 2-D images (grayscale or color) are supported, "
                "when providing a callable `inverse_map`."
            )
        if isinstance(inverse_map, HOMOGRAPHY_TRANSFORMS):
            def coord_map(c):
                return inverse_map(c)
        else:
            def coord_map(c):
                return inverse_map(c, **map_args)

        if len(input_shape) == 3 and len(output_shape) == 2:
            output_shape = tuple(output_shape) + (input_shape[2],)
        coords = warp_coords(coord_map, output_shape)
    else:
        raise ValueError("Invalid `inverse_map` argument")

    ndi_mode = _to_ndimage_mode(mode)
    warped = ndi.map_coordinates(
        image, coords, prefilter=order > 1, mode=ndi_mode, order=order,
        cval=cval,
    )
    return _clip_warp_output(image, warped, mode, cval, clip)


def resize(
    image,
    output_shape,
    order=None,
    mode="reflect",
    cval=0,
    clip=True,
    preserve_range=False,
    anti_aliasing=None,
    anti_aliasing_sigma=None,
):
    """Resize an image (skimage parity: pixel-grid zoom + optional
    gaussian anti-aliasing on downscale)."""
    image = jnp.asarray(image)
    output_shape = tuple(safe_as_int(output_shape))
    input_shape = image.shape
    if len(output_shape) > image.ndim:
        # append channel dims
        input_shape = input_shape + (1,) * (len(output_shape) - image.ndim)
        image = image.reshape(input_shape)
    elif len(output_shape) == image.ndim - 1:
        # multichannel: keep the trailing channel axis
        output_shape = output_shape + (input_shape[-1],)
    elif len(output_shape) < image.ndim - 1:
        raise ValueError(
            "len(output_shape) cannot be smaller than the image dimensions"
        )

    factors = np.asarray(input_shape, dtype=float) / np.asarray(
        output_shape, dtype=float
    )
    order = _validate_interpolation_order(image.dtype, order)

    if anti_aliasing is None:
        anti_aliasing = (
            not np.dtype(image.dtype) == bool
            and any(x < y for x, y in zip(output_shape, input_shape))
        )
    if np.dtype(image.dtype) == bool and anti_aliasing:
        # reference _warps.py:128-138: FutureWarning (0.19 raises)
        import warnings

        warnings.warn(
            "Input image dtype is bool. Gaussian convolution is not "
            "defined with bool data type. Please set anti_aliasing to "
            "False or explicitly cast input image to another data type. "
            "Starting from version 0.19 a ValueError will be raised "
            "instead of this warning.",
            FutureWarning,
            stacklevel=2,
        )
    # skimage converts every non-complex input to float (img_as_float
    # scaling unless preserve_range), for order 0 included
    if np.dtype(image.dtype).kind != "c":
        image = convert_to_float(image, preserve_range)

    ndi_mode = _to_ndimage_mode(mode)
    if anti_aliasing:
        if anti_aliasing_sigma is None:
            anti_aliasing_sigma = np.maximum(0, (factors - 1) / 2)
        else:
            anti_aliasing_sigma = np.atleast_1d(
                np.asarray(anti_aliasing_sigma, dtype=float)
            ) * np.ones_like(factors)
            if np.any(anti_aliasing_sigma < 0):
                raise ValueError(
                    "Anti-aliasing standard deviation must be "
                    "greater than or equal to zero"
                )
            elif np.any((anti_aliasing_sigma > 0) & (factors <= 1)):
                import warnings

                warnings.warn(
                    "Anti-aliasing standard deviation greater than zero "
                    "but not down-sampling along all axes"
                )
        image = ndi.gaussian_filter(
            image, list(anti_aliasing_sigma), cval=cval, mode=ndi_mode
        )

    zoom_factors = [1 / f for f in factors]
    out = ndi.zoom(
        image, zoom_factors, order=order, mode=ndi_mode, cval=cval,
        grid_mode=True,
    )
    if out.shape != tuple(output_shape):
        # rounding mismatch safeguard
        out = out[tuple(slice(0, s) for s in output_shape)]
    return _clip_warp_output(image, out, mode, cval, clip)


def rescale(
    image,
    scale,
    order=None,
    mode="reflect",
    cval=0,
    clip=True,
    preserve_range=False,
    multichannel=False,
    anti_aliasing=None,
    anti_aliasing_sigma=None,
):
    """Rescale by a factor (skimage parity)."""
    image = jnp.asarray(image)
    scale = np.atleast_1d(np.asarray(scale, dtype=float))
    if len(scale) > 1:
        if (not multichannel and len(scale) != image.ndim) or (
            multichannel and len(scale) != image.ndim - 1
        ):
            raise ValueError(
                "Supply a single scale, or one value per spatial axis"
            )
        if multichannel:
            scale = np.concatenate((scale, [1]))
    orig_shape = np.asarray(image.shape)
    output_shape = np.round(scale * orig_shape[: len(np.atleast_1d(scale))])
    if scale.size == 1:
        output_shape = np.round(scale * orig_shape)
        if multichannel:
            output_shape[-1] = orig_shape[-1]
    return resize(
        image, tuple(int(s) for s in output_shape), order=order, mode=mode,
        cval=cval, clip=clip, preserve_range=preserve_range,
        anti_aliasing=anti_aliasing,
        anti_aliasing_sigma=anti_aliasing_sigma,
    )


def rotate(
    image, angle, resize=False, center=None, order=None, mode="constant",
    cval=0, clip=True, preserve_range=False,
):
    """Rotate about the image center (skimage parity; 2D in-plane)."""
    image = jnp.asarray(image)
    rows, cols = image.shape[0], image.shape[1]
    if center is None:
        center = np.array((cols, rows)) / 2.0 - 0.5
    else:
        center = np.asarray(center, dtype=float)
    tform1 = SimilarityTransform(translation=center)
    tform2 = SimilarityTransform(rotation=np.deg2rad(angle))
    tform3 = SimilarityTransform(translation=-center)
    tform = tform3 + tform2 + tform1

    output_shape = None
    if resize:
        corners = np.array(
            [[0, 0], [0, rows - 1], [cols - 1, rows - 1], [cols - 1, 0]]
        )
        corners = np.asarray(tform.inverse(corners))
        minc = corners[:, 0].min()
        minr = corners[:, 1].min()
        maxc = corners[:, 0].max()
        maxr = corners[:, 1].max()
        out_rows = maxr - minr + 1
        out_cols = maxc - minc + 1
        output_shape = np.around((out_rows, out_cols))
        # fit output image in new shape
        translation = (minc, minr)
        tform4 = SimilarityTransform(translation=translation)
        tform = tform4 + tform
    tform.params[2] = (0, 0, 1)
    return warp(
        image, tform, output_shape=output_shape, order=order, mode=mode,
        cval=cval, clip=clip, preserve_range=preserve_range,
    )


def swirl(
    image, center=None, strength=1, radius=100, rotation=0,
    output_shape=None, order=None, mode="reflect", cval=0, clip=True,
    preserve_range=False,
):
    """Swirl distortion (skimage parity)."""
    image = jnp.asarray(image)
    if center is None:
        center = np.array(image.shape)[:2][::-1] / 2
    # radius rescale so the swirl decays to ~1/1000 at `radius`
    radius = radius / 5 * math.log(2)

    def _swirl_mapping(xy):
        x, y = xy[:, 0], xy[:, 1]
        x0, y0 = center
        rho = jnp.sqrt((x - x0) ** 2 + (y - y0) ** 2)
        theta = rotation + strength * jnp.exp(-rho / radius) + jnp.arctan2(
            y - y0, x - x0
        )
        xr = x0 + rho * jnp.cos(theta)
        yr = y0 + rho * jnp.sin(theta)
        return jnp.stack([xr, yr], axis=-1)

    return warp(
        image, _swirl_mapping, output_shape=output_shape, order=order,
        mode=mode, cval=cval, clip=clip, preserve_range=preserve_range,
    )


def warp_polar(
    image, center=None, *, radius=None, output_shape=None,
    scaling="linear", multichannel=False, **kwargs,
):
    """Polar (or log-polar) warp (skimage parity)."""
    image = jnp.asarray(image)
    if image.ndim != 2 and not multichannel:
        raise ValueError(
            "Input array must be 2 dimensions when `multichannel=False`, "
            f"got {image.ndim}"
        )
    if image.ndim != 3 and multichannel:
        raise ValueError(
            "Input array must be 3 dimensions when `multichannel=True`, "
            f"got {image.ndim}"
        )
    if center is None:
        center = (np.array(image.shape)[:2] / 2) - 0.5
    if radius is None:
        w, h = np.array(image.shape)[:2] / 2
        radius = np.sqrt(w ** 2 + h ** 2)
    if output_shape is None:
        height = 360
        width = int(np.ceil(radius))
        output_shape = (height, width)
    else:
        output_shape = safe_as_int(output_shape)
        height = output_shape[0]
        width = output_shape[1]
    if scaling == "linear":
        k_radius = width / radius
        map_func = _linear_polar_mapping
    elif scaling == "log":
        k_radius = width / math.log(radius)
        map_func = _log_polar_mapping
    else:
        raise ValueError("Scaling value must be in {'linear', 'log'}")
    k_angle = height / (2 * np.pi)

    def coord_map(xy):
        return map_func(xy, k_angle, k_radius, center[::-1])

    return warp(image, coord_map, output_shape=tuple(int(s) for s in
                                                     output_shape), **kwargs)


def _linear_polar_mapping(output_coords, k_angle, k_radius, center):
    angle = output_coords[:, 1] / k_angle
    rr = output_coords[:, 0] / k_radius
    coord_x = rr * jnp.cos(angle) + center[0]
    coord_y = rr * jnp.sin(angle) + center[1]
    return jnp.stack([coord_x, coord_y], axis=-1)


def _log_polar_mapping(output_coords, k_angle, k_radius, center):
    angle = output_coords[:, 1] / k_angle
    rr = jnp.exp(output_coords[:, 0] / k_radius)
    coord_x = rr * jnp.cos(angle) + center[0]
    coord_y = rr * jnp.sin(angle) + center[1]
    return jnp.stack([coord_x, coord_y], axis=-1)


def downscale_local_mean(image, factors, cval=0, clip=True):
    """Downsample by local averaging (skimage parity)."""
    return block_reduce(image, factors, jnp.mean, cval)
