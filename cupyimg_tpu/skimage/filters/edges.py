"""Edge filters (skimage.filters parity; reference
cupyimg/skimage/filters/edges.py, SURVEY.md S5): a shared separable
smooth x derivative engine drives sobel/scharr/prewitt/farid in nd."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi

__all__ = [
    "sobel", "sobel_h", "sobel_v",
    "scharr", "scharr_h", "scharr_v",
    "prewitt", "prewitt_h", "prewitt_v",
    "roberts", "roberts_pos_diag", "roberts_neg_diag",
    "farid", "farid_h", "farid_v",
    "laplace",
]

# smoothing weights (normalized); derivative is the central difference.
# Kernels stated here in correlate orientation; the reference applies the
# convolve-oriented [1, 0, -1] (edges.py:23,132), i.e. f(x+1) - f(x-1).
HSOBEL_SMOOTH = np.array([1, 2, 1]) / 4.0
HSCHARR_SMOOTH = np.array([3, 10, 3]) / 16.0
HPREWITT_SMOOTH = np.array([1, 1, 1]) / 3.0
EDGE_KERNEL = np.array([-1.0, 0.0, 1.0])

# Farid & Simoncelli 5-tap optimal kernels (published constants);
# the reference convolves with d1 (edges.py:48-51) == correlate with
# its reverse.
FARID_SMOOTH = np.array(
    [0.0376593171958126, 0.249153396177344, 0.426374573253687,
     0.249153396177344, 0.0376593171958126]
)
FARID_EDGE = np.array(
    [-0.109603762960254, -0.276690988455557, 0.0, 0.276690988455557,
     0.109603762960254]
)

ROBERTS_PD_WEIGHTS = np.array([[1, 0], [0, -1]], dtype=np.float64)
ROBERTS_ND_WEIGHTS = np.array([[0, 1], [-1, 0]], dtype=np.float64)


def _mask_filter_result(result, mask):
    """Zero the filter output where the (eroded) mask is False."""
    if mask is None:
        return result
    mask = jnp.asarray(mask, dtype=bool)
    erosion_footprint = np.ones((3,) * result.ndim, dtype=bool)
    mask = ndi.binary_erosion(mask, erosion_footprint, border_value=0)
    return result * mask


def _generic_edge_filter(
    image, *, smooth_weights, edge_weights=EDGE_KERNEL, axis=None, mode="reflect",
    cval=0.0, mask=None,
):
    """Separable smooth-x-derivative filter over one or all axes
    (reference edges.py:128-202 engine)."""
    image = jnp.asarray(image).astype(np.float64)
    ndim = image.ndim
    if axis is None:
        axes = list(range(ndim))
    elif np.isscalar(axis):
        axes = [axis % ndim]
    else:
        axes = [a % ndim for a in axis]
    return_magnitude = len(axes) > 1

    output = None
    for edge_dim in axes:
        ax_out = ndi.correlate1d(
            image, np.asarray(edge_weights), axis=edge_dim, mode=mode,
            cval=cval,
        )
        for smooth_dim in range(ndim):
            if smooth_dim == edge_dim:
                continue
            ax_out = ndi.correlate1d(
                ax_out, np.asarray(smooth_weights), axis=smooth_dim,
                mode=mode, cval=cval,
            )
        if return_magnitude:
            ax_out = ax_out * ax_out
        output = ax_out if output is None else output + ax_out
    if return_magnitude:
        # reference edges.py:197-199: average of squares over ndim, not
        # over the number of requested axes
        output = jnp.sqrt(output / ndim)
    return output


def sobel(image, mask=None, *, axis=None, mode="reflect", cval=0.0):
    """Sobel filter: edge magnitude, or single-axis derivative (skimage
    parity)."""
    out = _generic_edge_filter(
        image, smooth_weights=HSOBEL_SMOOTH, axis=axis, mode=mode, cval=cval
    )
    return _mask_filter_result(out, mask)


def sobel_h(image, mask=None):
    """Horizontal-edge Sobel (derivative along rows; skimage parity)."""
    return sobel(image, mask, axis=0)


def sobel_v(image, mask=None):
    """Vertical-edge Sobel (skimage parity)."""
    return sobel(image, mask, axis=1)


def scharr(image, mask=None, *, axis=None, mode="reflect", cval=0.0):
    """Scharr filter (skimage parity)."""
    out = _generic_edge_filter(
        image, smooth_weights=HSCHARR_SMOOTH, axis=axis, mode=mode, cval=cval
    )
    return _mask_filter_result(out, mask)


def scharr_h(image, mask=None):
    return scharr(image, mask, axis=0)


def scharr_v(image, mask=None):
    return scharr(image, mask, axis=1)


def prewitt(image, mask=None, *, axis=None, mode="reflect", cval=0.0):
    """Prewitt filter (skimage parity)."""
    out = _generic_edge_filter(
        image, smooth_weights=HPREWITT_SMOOTH, axis=axis, mode=mode,
        cval=cval,
    )
    return _mask_filter_result(out, mask)


def prewitt_h(image, mask=None):
    return prewitt(image, mask, axis=0)


def prewitt_v(image, mask=None):
    return prewitt(image, mask, axis=1)


def farid(image, mask=None, *, axis=None, mode="reflect", cval=0.0):
    """Farid & Simoncelli 5-tap derivative filter (skimage parity)."""
    out = _generic_edge_filter(
        image, smooth_weights=FARID_SMOOTH, edge_weights=FARID_EDGE,
        axis=axis, mode=mode, cval=cval,
    )
    return _mask_filter_result(out, mask)


def farid_h(image, mask=None):
    return farid(image, mask, axis=0)


def farid_v(image, mask=None):
    return farid(image, mask, axis=1)


def roberts(image, mask=None):
    """Roberts' cross edge magnitude (skimage parity; reference
    edges.py:599-611 divides by sqrt(2) so [0, 1] inputs stay in
    [0, 1])."""
    return jnp.sqrt(
        roberts_pos_diag(image, mask) ** 2
        + roberts_neg_diag(image, mask) ** 2
    ) / np.sqrt(2.0)


def roberts_pos_diag(image, mask=None):
    """Roberts' cross, positive diagonal (skimage parity)."""
    image = jnp.asarray(image).astype(np.float64)
    result = ndi.convolve(image, ROBERTS_PD_WEIGHTS)
    return _mask_filter_result(result, mask)


def roberts_neg_diag(image, mask=None):
    """Roberts' cross, negative diagonal (skimage parity)."""
    image = jnp.asarray(image).astype(np.float64)
    result = ndi.convolve(image, ROBERTS_ND_WEIGHTS)
    return _mask_filter_result(result, mask)


def laplace(image, ksize=3, mask=None):
    """Laplace edge filter (skimage parity: reference edges.py:682-713
    convolves with the uft.laplacian impulse — center +2*ndim,
    neighbors -1 — the negated ndimage laplacian)."""
    from ..restoration.uft import laplacian as _uft_laplacian

    image = jnp.asarray(image).astype(np.float64)
    _, laplace_op = _uft_laplacian(image.ndim, (ksize,) * image.ndim)
    result = ndi.correlate(image, laplace_op)
    return _mask_filter_result(result, mask)
