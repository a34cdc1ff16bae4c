"""Corner/derivative-tensor features (skimage.feature parity; reference
cupyimg/skimage/feature/corner.py, SURVEY.md S4): structure tensor,
Hessian machinery with closed-form symmetric eigenvalues (2x2/3x3, pure
VPU math — no LAPACK round-trip), and the classic corner responses."""

from __future__ import annotations

import itertools
from warnings import warn

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage._shared.utils import _supported_float_type
from cupyimg_tpu.skimage.util.dtype import img_as_float

__all__ = [
    "structure_tensor",
    "structure_tensor_eigvals",
    "structure_tensor_eigenvalues",
    "hessian_matrix",
    "hessian_matrix_det",
    "hessian_matrix_eigvals",
    "shape_index",
    "corner_kitchen_rosenfeld",
    "corner_harris",
    "corner_shi_tomasi",
    "corner_foerstner",
    "corner_peaks",
]


def _compute_derivatives(image, mode="constant", cval=0):
    """First Gaussian-free derivatives along every axis (sobel-style
    gradients use ndi.sobel in skimage)."""
    return [
        ndi.sobel(image, axis=i, mode=mode, cval=cval)
        for i in range(image.ndim)
    ]


def structure_tensor(image, sigma=1, mode="constant", cval=0, order=None):
    """Structure tensor: gaussian-smoothed outer products of gradients
    (skimage parity incl. the deprecated implicit 2-D 'xy' default,
    reference corner.py:46-139)."""
    image = jnp.asarray(image)
    if order == "xy" and image.ndim > 2:
        raise ValueError('Only "rc" order is supported for dim > 2.')
    if order is None:
        if image.ndim == 2:
            warn(
                "deprecation warning: the default order of the structure "
                'tensor values will be "row-column" instead of "xy" '
                'starting in skimage version 0.20. Use order="rc" or '
                'order="xy" to set this explicitly.  (Specify order="xy" '
                "to maintain the old behavior.)",
                category=FutureWarning,
                stacklevel=2,
            )
            order = "xy"
        else:
            order = "rc"
    image = _prepare_grayscale_input_nD(image)
    derivatives = _compute_derivatives(image, mode=mode, cval=cval)
    if order == "xy":
        derivatives = derivatives[::-1]
    elif order != "rc":
        raise ValueError(f"unknown order: {order}")
    A_elems = [
        ndi.gaussian_filter(der0 * der1, sigma, mode=mode, cval=cval)
        for der0, der1 in itertools.combinations_with_replacement(
            derivatives, 2
        )
    ]
    return A_elems


def _prepare_grayscale_input_nD(image):
    image = jnp.asarray(image)
    return img_as_float(image).astype(
        _supported_float_type(image.dtype)
    )


def hessian_matrix(image, sigma=1, mode="constant", cval=0, order="rc"):
    """Hessian via gradients of a Gaussian-smoothed image (skimage
    parity): returns the upper-triangular elements in row-major order."""
    image = _prepare_grayscale_input_nD(image)
    gaussian_filtered = ndi.gaussian_filter(
        image, sigma=sigma, mode=mode, cval=cval
    )
    gradients = jnp.gradient(gaussian_filtered)
    axes = range(image.ndim)
    # skimage quirk kept for parity (reference corner.py:203-205):
    # 'rc' REVERSES the axis order, so Hrr is the second derivative
    # along the LAST axis — the documented/golden-tested behavior
    if order == "rc":
        axes = reversed(list(axes))
    elif order != "xy":
        raise ValueError(f"unknown order: {order}")
    axes = list(axes)
    H_elems = [
        jnp.gradient(gradients[ax0], axis=ax1)
        for ax0, ax1 in itertools.combinations_with_replacement(axes, 2)
    ]
    return H_elems


def _symmetric_eigvals_2x2(a, b, d):
    """Eigenvalues of [[a, b], [b, d]], descending."""
    tr_half = (a + d) / 2
    det_part = jnp.sqrt(((a - d) / 2) ** 2 + b * b)
    return [tr_half + det_part, tr_half - det_part]


def _symmetric_eigvals_3x3(a, b, c, d, e, f):
    """Eigenvalues of [[a,b,c],[b,d,e],[c,e,f]], descending (trigonometric
    closed form for symmetric 3x3; Smith 1961)."""
    p1 = b * b + c * c + e * e
    q = (a + d + f) / 3.0
    p2 = (a - q) ** 2 + (d - q) ** 2 + (f - q) ** 2 + 2 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # B = (A - q I) / p
    b11 = (a - q) / p
    b22 = (d - q) / p
    b33 = (f - q) / p
    b12 = b / p
    b13 = c / p
    b23 = e / p
    detB = (
        b11 * (b22 * b33 - b23 * b23)
        - b12 * (b12 * b33 - b23 * b13)
        + b13 * (b12 * b23 - b22 * b13)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig1 = q + 2 * p * jnp.cos(phi)
    eig3 = q + 2 * p * jnp.cos(phi + (2 * np.pi / 3.0))
    eig2 = 3 * q - eig1 - eig3
    is_diag = p2 <= 1e-30
    eig1 = jnp.where(is_diag, a, eig1)
    eig2 = jnp.where(is_diag, d, eig2)
    eig3 = jnp.where(is_diag, f, eig3)
    # sort descending elementwise
    lo = jnp.minimum(jnp.minimum(eig1, eig2), eig3)
    hi = jnp.maximum(jnp.maximum(eig1, eig2), eig3)
    mid = eig1 + eig2 + eig3 - lo - hi
    return [hi, mid, lo]


def _symmetric_eigvals(S_elems):
    n = len(S_elems)
    if n == 3:  # 2x2
        return _symmetric_eigvals_2x2(S_elems[0], S_elems[1], S_elems[2])
    if n == 6:  # 3x3
        return _symmetric_eigvals_3x3(*S_elems)
    # general fallback via jnp.linalg.eigvalsh on stacked matrices
    ndim = int((np.sqrt(8 * n + 1) - 1) / 2)
    shape = S_elems[0].shape
    M = jnp.zeros(shape + (ndim, ndim), dtype=S_elems[0].dtype)
    k = 0
    for i in range(ndim):
        for j in range(i, ndim):
            M = M.at[..., i, j].set(S_elems[k])
            M = M.at[..., j, i].set(S_elems[k])
            k += 1
    vals = jnp.linalg.eigvalsh(M)
    return [vals[..., ndim - 1 - i] for i in range(ndim)]


def structure_tensor_eigenvalues(A_elems):
    """Eigenvalues of the structure tensor, descending (skimage parity)."""
    return jnp.stack(_symmetric_eigvals(A_elems), axis=0)


def structure_tensor_eigvals(Axx, Axy, Ayy):
    """2D structure-tensor eigenvalues (legacy API; skimage parity)."""
    warn(
        "deprecation warning: use structure_tensor_eigenvalues instead "
        "of structure_tensor_eigvals which will be removed in version "
        "0.20.",
        category=FutureWarning,
        stacklevel=2,
    )
    return tuple(_symmetric_eigvals_2x2(Axx, Axy, Ayy))


def hessian_matrix_eigvals(H_elems):
    """Eigenvalues of the Hessian, descending (skimage parity)."""
    return jnp.stack(_symmetric_eigvals(H_elems), axis=0)


def hessian_matrix_det(image, sigma=1, approximate=True):
    """Determinant of the (approximate) Hessian (skimage parity).

    The SURF box-filter approximation (Bay et al.) for 2D; exact gaussian
    Hessian determinant otherwise."""
    image = _prepare_grayscale_input_nD(image)
    if image.ndim == 2 and approximate:
        from cupyimg_tpu.skimage.transform.integral import integral_image

        ii = integral_image(image)
        return _hessian_matrix_det_approx(ii, sigma)
    H = hessian_matrix(image, sigma)
    if image.ndim == 2:
        return H[0] * H[2] - H[1] ** 2
    # general determinant via stacked matrices
    n = image.ndim
    shape = image.shape
    M = jnp.zeros(shape + (n, n), dtype=H[0].dtype)
    k = 0
    for i in range(n):
        for j in range(i, n):
            M = M.at[..., i, j].set(H[k])
            M = M.at[..., j, i].set(H[k])
            k += 1
    return jnp.linalg.det(M)


def _integ(ii, r, c, rl, cl):
    """Box sum over [r, r+rl) x [c, c+cl) windows for all pixels (shifted
    integral-image lookups with edge clamping)."""
    rows, cols = ii.shape
    grid_r, grid_c = jnp.meshgrid(
        jnp.arange(rows), jnp.arange(cols), indexing="ij"
    )

    def at(rr, cc):
        rr = jnp.clip(rr, -1, rows - 1)
        cc = jnp.clip(cc, -1, cols - 1)
        vals = ii[jnp.maximum(rr, 0), jnp.maximum(cc, 0)]
        return jnp.where((rr < 0) | (cc < 0), 0.0, vals)

    r0 = grid_r + r - 1
    c0 = grid_c + c - 1
    r1 = grid_r + r + rl - 1
    c1 = grid_c + c + cl - 1
    return at(r1, c1) - at(r1, c0) - at(r0, c1) + at(r0, c0)


def _hessian_matrix_det_approx(ii, sigma):
    """SURF-style approximate Hessian determinant from an integral image
    (skimage's _hessian_matrix_det math)."""
    size = int(3 * sigma)
    if size % 2 == 0:
        size += 1
    s2 = (size - 1) // 2
    s3 = size // 3
    w = size
    scale = 1.0 / (w * w)

    # D_xx: three horizontal bands (left, center, right)
    mid_c = -(s3 - 1) // 2
    tl = _integ(ii, -s3 + 1, -s2, 2 * s3 - 1, s3)
    tm = _integ(ii, -s3 + 1, mid_c, 2 * s3 - 1, s3)
    tr = _integ(ii, -s3 + 1, s2 - s3 + 1, 2 * s3 - 1, s3)
    dxx = tl - 2 * tm + tr

    # D_yy (transpose roles)
    tl = _integ(ii, -s2, -s3 + 1, s3, 2 * s3 - 1)
    tm = _integ(ii, mid_c, -s3 + 1, s3, 2 * s3 - 1)
    tr = _integ(ii, s2 - s3 + 1, -s3 + 1, s3, 2 * s3 - 1)
    dyy = tl - 2 * tm + tr

    # D_xy quadrants
    d1 = _integ(ii, -s3, -s3, s3, s3)
    d2 = _integ(ii, -s3, 1, s3, s3)
    d3 = _integ(ii, 1, -s3, s3, s3)
    d4 = _integ(ii, 1, 1, s3, s3)
    dxy = d1 - d2 - d3 + d4

    dxx = dxx * scale
    dyy = dyy * scale
    dxy = dxy * scale
    return dxx * dyy - 0.81 * dxy * dxy


def shape_index(image, sigma=1, mode="constant", cval=0):
    """Koenderink & van Doorn shape index (skimage parity)."""
    H = hessian_matrix(image, sigma=sigma, mode=mode, cval=cval, order="rc")
    l1, l2 = hessian_matrix_eigvals(H)
    # IEEE semantics on purpose (skimage parity): equal eigenvalues give
    # x/0 = +-inf -> arctan -> +-pi/2 (spherical cap = +-1); only 0/0
    # (flat) is NaN
    return (2.0 / np.pi) * jnp.arctan((l2 + l1) / (l2 - l1))


def corner_kitchen_rosenfeld(image, mode="constant", cval=0):
    """Kitchen-Rosenfeld curvature corner response (skimage parity)."""
    image = _prepare_grayscale_input_nD(image)
    imy, imx = _compute_derivatives(image, mode=mode, cval=cval)
    imxy, imxx = [
        ndi.sobel(imx, axis=i, mode=mode, cval=cval) for i in (0, 1)
    ]
    imyy, imyx = [
        ndi.sobel(imy, axis=i, mode=mode, cval=cval) for i in (0, 1)
    ]
    numerator = imxx * imy ** 2 + imyy * imx ** 2 - 2 * imxy * imx * imy
    denominator = imx ** 2 + imy ** 2
    safe = jnp.where(denominator == 0, 1.0, denominator)
    return jnp.where(denominator == 0, 0.0, numerator / safe)


def corner_harris(image, method="k", k=0.05, eps=1e-6, sigma=1):
    """Harris corner response (skimage parity)."""
    A_elems = structure_tensor(image, sigma, order="rc")
    Arr, Arc, Acc = A_elems
    detA = Arr * Acc - Arc ** 2
    traceA = Arr + Acc
    if method == "k":
        return detA - k * traceA ** 2
    return 2 * detA / (traceA + eps)


def corner_shi_tomasi(image, sigma=1):
    """Shi-Tomasi (minimum eigenvalue) response (skimage parity)."""
    Arr, Arc, Acc = structure_tensor(image, sigma, order="rc")
    return (
        Arr + Acc - jnp.sqrt((Arr - Acc) ** 2 + 4 * Arc ** 2)
    ) / 2


def corner_foerstner(image, sigma=1):
    """Foerstner (w, q) corner measures (skimage parity)."""
    Arr, Arc, Acc = structure_tensor(image, sigma, order="rc")
    detA = Arr * Acc - Arc ** 2
    traceA = Arr + Acc
    w = jnp.where(traceA == 0, 0.0, detA / jnp.where(traceA == 0, 1, traceA))
    q = jnp.where(
        traceA == 0, 0.0, 4 * detA / jnp.where(traceA == 0, 1, traceA ** 2)
    )
    return w, q


def corner_peaks(
    image,
    min_distance=1,
    threshold_abs=None,
    threshold_rel=None,
    exclude_border=True,
    indices=True,
    num_peaks=np.inf,
    footprint=None,
    labels=None,
    *,
    num_peaks_per_label=np.inf,
    p_norm=np.inf,
):
    """Corner peaks with minimum pairwise distance (skimage parity;
    device-side suppression replaces the reference's cKDTree,
    corner.py:926-930)."""
    from cupyimg_tpu.skimage._shared.coord import ensure_spacing
    from cupyimg_tpu.skimage.feature.peak import peak_local_max

    if indices is False:
        warn(
            "indices argument is deprecated and will be removed in "
            "version 0.20. To avoid this warning, please do not use the "
            "indices argument. Please see corner_peaks documentation for "
            "more details.",
            FutureWarning,
            stacklevel=2,
        )

    coords = peak_local_max(
        image,
        min_distance=min_distance,
        threshold_abs=threshold_abs,
        threshold_rel=threshold_rel,
        exclude_border=exclude_border,
        num_peaks=np.inf,
        footprint=footprint,
        labels=labels,
        num_peaks_per_label=num_peaks_per_label,
    )
    if len(coords):
        # corner_peaks' suppression is INCLUSIVE (query_ball_point with
        # r=min_distance, no exactly-at-spacing exemption): connected
        # plateau peaks with equal accumulator values collapse to one
        coords = ensure_spacing(
            coords, spacing=min_distance, p_norm=p_norm, strict=False
        )
    coords = np.asarray(coords)
    if len(coords) > num_peaks:
        coords = coords[: int(num_peaks)]
    if indices:
        return jnp.asarray(coords.astype(np.int64))
    peaks = np.zeros(jnp.asarray(image).shape, dtype=bool)
    peaks[tuple(coords.astype(int).T)] = True
    return jnp.asarray(peaks)
