"""Thresholding algorithms (skimage.filters parity; reference
cupyimg/skimage/filters/thresholding.py, SURVEY.md S5).

Global methods reduce a device histogram to a scalar threshold (one host
sync at the API boundary, like the reference); local methods (niblack/
sauvola/local) stay fully on device via separable windowed statistics."""

from __future__ import annotations

import inspect
import math
from collections import OrderedDict

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage.exposure.exposure import histogram
from cupyimg_tpu.skimage._shared.utils import warn

__all__ = [
    "try_all_threshold",
    "threshold_otsu",
    "threshold_yen",
    "threshold_isodata",
    "threshold_li",
    "threshold_local",
    "threshold_minimum",
    "threshold_mean",
    "threshold_niblack",
    "threshold_sauvola",
    "threshold_triangle",
    "threshold_multiotsu",
    "apply_hysteresis_threshold",
]


def _validate_image_histogram(image, hist, nbins):
    if image is None and hist is None:
        raise Exception("Either image or hist must be provided.")
    if hist is not None:
        if isinstance(hist, (tuple, list)):
            counts, bin_centers = hist
        else:
            counts = hist
            bin_centers = jnp.arange(len(counts))
        return jnp.asarray(counts).astype(np.float64), jnp.asarray(
            bin_centers
        )
    counts, bin_centers = histogram(
        jnp.asarray(image).ravel(), nbins, source_range="image"
    )
    return counts.astype(np.float64), bin_centers


def threshold_otsu(image=None, nbins=256, *, hist=None):
    """Otsu's threshold: maximize between-class variance (skimage
    parity)."""
    counts, bin_centers = _validate_image_histogram(image, hist, nbins)
    if bin_centers.shape[0] == 1:  # single-color image: that value
        return bin_centers[0]
    counts = counts / jnp.sum(counts)
    weight1 = jnp.cumsum(counts)
    weight2 = jnp.cumsum(counts[::-1])[::-1]
    csum = jnp.cumsum(counts * bin_centers)
    mean1 = csum / jnp.where(weight1 == 0, 1, weight1)
    # mean of bins [i:]: numerator must INCLUDE bin i like weight2 does
    csum_excl = csum - counts * bin_centers
    mean2 = (csum[-1] - csum_excl) / jnp.where(weight2 == 0, 1, weight2)
    # between-class variance at split after index i
    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = jnp.argmax(variance12)
    return bin_centers[idx]


def threshold_yen(image=None, nbins=256, *, hist=None):
    """Yen's threshold (maximum correlation criterion; skimage parity)."""
    counts, bin_centers = _validate_image_histogram(image, hist, nbins)
    if bin_centers.shape[0] == 1:  # single-color image: that value
        return bin_centers[0]
    pmf = counts / jnp.sum(counts)
    P1 = jnp.cumsum(pmf)
    P1_sq = jnp.cumsum(pmf ** 2)
    P2_sq = jnp.cumsum(pmf[::-1] ** 2)[::-1]
    eps = np.finfo(np.float64).eps
    crit = jnp.log(
        ((P1_sq[:-1] * P2_sq[1:]) ** -1 + eps)
        * (P1[:-1] * (1.0 - P1[:-1])) ** 2
        + eps
    )
    return bin_centers[jnp.argmax(crit)]


def threshold_isodata(image=None, nbins=256, return_all=False, *, hist=None):
    """Ridler-Calvard / ISODATA threshold(s) (skimage parity)."""
    counts, bin_centers = _validate_image_histogram(image, hist, nbins)
    if bin_centers.shape[0] == 1:
        if return_all:
            return bin_centers
        return bin_centers[0]
    counts = counts.astype(np.float64)
    csuml = jnp.cumsum(counts)
    csumh = csuml[-1] - csuml
    intensity_sum = counts * bin_centers
    csum_intensity = jnp.cumsum(intensity_sum)
    lower = csum_intensity[:-1] / jnp.where(csuml[:-1] == 0, 1, csuml[:-1])
    higher = (csum_intensity[-1] - csum_intensity[:-1]) / jnp.where(
        csumh[:-1] == 0, 1, csumh[:-1]
    )
    all_mean = (lower + higher) / 2.0
    bin_width = bin_centers[1] - bin_centers[0]
    distances = all_mean - bin_centers[:-1]
    thresholds_mask = (distances >= 0) & (distances < bin_width)
    thresh_np = np.asarray(bin_centers[:-1])[np.asarray(thresholds_mask)]
    if return_all:
        return jnp.asarray(thresh_np)
    return thresh_np[0]


def threshold_li(image, *, tolerance=None, initial_guess=None,
                 iter_callback=None):
    """Li's minimum cross-entropy threshold (iterative; skimage parity
    incl. the nan/inf/constant edge semantics of the upstream suite)."""
    image = jnp.asarray(image).ravel()
    if np.dtype(image.dtype).kind == "f":
        image = image[~jnp.isnan(image)]
    if image.size == 0:
        return float("nan")
    # single-valued images (including inf) threshold at that value
    val0 = image[0]
    if bool(jnp.all(image == val0)):
        return float(val0)
    if np.dtype(image.dtype).kind == "f":
        finite = image[jnp.isfinite(image)]
        if finite.size == 0:
            # only +inf and -inf remain: any finite value separates them
            return 0.0
        image = finite
    imin = float(image.min())
    image = image.astype(np.float64) - imin  # ensure positivity
    if tolerance is None:
        # half the smallest difference between distinct intensities
        tolerance = float(jnp.min(jnp.diff(jnp.unique(image)))) / 2

    if initial_guess is None:
        t_next = float(image.mean())
    elif callable(initial_guess):
        t_next = float(initial_guess(image)) - imin
    else:
        t_next = float(initial_guess) - imin
        if not 0 < t_next < float(image.max()):
            raise ValueError(
                "The initial guess for threshold_li must be within the "
                "range of the image."
            )
    t_curr = -2 * tolerance
    if iter_callback is not None:
        iter_callback(t_next + imin)
    eps = np.finfo(np.float64).eps
    while abs(t_next - t_curr) > tolerance:
        t_curr = t_next
        foreground = image > t_curr
        mean_fore = float(jnp.mean(jnp.where(foreground, image, 0))) / max(
            float(jnp.mean(foreground)), eps
        )
        mean_back = float(jnp.mean(jnp.where(~foreground, image, 0))) / max(
            float(jnp.mean(~foreground)), eps
        )
        if mean_back == 0:
            mean_back = eps
        t_next = (mean_back - mean_fore) / (
            math.log(mean_back + eps) - math.log(mean_fore + eps)
        )
        if iter_callback is not None:
            iter_callback(t_next + imin)
    return t_next + imin


def threshold_minimum(image=None, nbins=256, max_iter=10000, *, hist=None):
    """Minimum method: smooth the histogram until bimodal, threshold at
    the valley (skimage parity)."""
    counts, bin_centers = _validate_image_histogram(image, hist, nbins)
    counts_np = np.asarray(counts, dtype=np.float64)

    def find_local_maxima_idx(h):
        maximums = []
        direction = 1
        for i in range(h.shape[0] - 1):
            if direction > 0:
                if h[i + 1] < h[i]:
                    direction = -1
                    maximums.append(i)
            else:
                if h[i + 1] > h[i]:
                    direction = 1
        return maximums

    smooth_hist = counts_np
    for counter in range(max_iter):
        # skimage smooths with uniform_filter1d (reflect boundary); a
        # zero-padded convolve decays the ends and can fabricate maxima
        padded = np.concatenate(
            ([smooth_hist[0]], smooth_hist, [smooth_hist[-1]])
        )
        smooth_hist = np.convolve(
            padded, np.ones(3) / 3.0, mode="valid"
        )
        maximum_idxs = find_local_maxima_idx(smooth_hist)
        if len(maximum_idxs) < 3:
            break
    if len(maximum_idxs) != 2:
        raise RuntimeError("Unable to find two maxima in histogram")
    if counter == max_iter - 1:
        raise RuntimeError("Maximum iteration reached for histogram "
                           "smoothing")
    threshold_idx = np.argmin(
        smooth_hist[maximum_idxs[0]: maximum_idxs[1] + 1]
    ) + maximum_idxs[0]
    return np.asarray(bin_centers)[threshold_idx]


def threshold_mean(image):
    """Mean intensity threshold (skimage parity)."""
    return jnp.mean(jnp.asarray(image))


def threshold_triangle(image, nbins=256):
    """Triangle algorithm (Zack 1977; skimage parity)."""
    counts, bin_centers = _validate_image_histogram(image, None, nbins)
    counts = np.asarray(counts, dtype=np.float64)
    nbins = len(counts)

    arg_peak_height = int(np.argmax(counts))
    peak_height = counts[arg_peak_height]
    nz = np.flatnonzero(counts)
    arg_low_level, arg_high_level = nz[0], nz[-1]

    flip = arg_peak_height - arg_low_level < arg_high_level - arg_peak_height
    if flip:
        counts = counts[::-1]
        arg_low_level = nbins - arg_high_level - 1
        arg_peak_height = nbins - arg_peak_height - 1

    del arg_high_level
    width = arg_peak_height - arg_low_level
    x1 = np.arange(width)
    y1 = counts[x1 + arg_low_level]
    norm = np.sqrt(peak_height ** 2 + width ** 2)
    peak_height_n = peak_height / norm
    width_n = width / norm
    length = peak_height_n * x1 - width_n * y1
    arg_level = int(np.argmax(length)) + arg_low_level
    if flip:
        arg_level = nbins - arg_level - 1
    return np.asarray(bin_centers)[arg_level]


def threshold_multiotsu(image, classes=3, nbins=256):
    """Multi-Otsu thresholds for any class count (skimage parity).

    The reference delegates to scikit-image's LUT recursion
    (reference thresholding.py threshold_multiotsu); here the maximal
    between-class criterion sum_k m_k^2/w_k is found by dynamic
    programming over (class, last-bin) — O(classes * nbins^2) host math
    on the (tiny) histogram, exact for every class count.
    """
    image = jnp.asarray(image)
    counts, bin_centers = _validate_image_histogram(image, None, nbins)
    prob = np.asarray(counts / jnp.sum(counts), dtype=np.float64)
    centers = np.asarray(bin_centers, dtype=np.float64)
    nb = len(prob)
    if int(np.count_nonzero(prob)) < classes:
        raise ValueError(
            f"The input image has less unique values ({int(np.count_nonzero(prob))}) "
            f"than the desired number of classes ({classes})"
        )
    P = np.concatenate([[0.0], np.cumsum(prob)])
    M = np.concatenate([[0.0], np.cumsum(prob * centers)])

    def seg(i, j):
        """Criterion of the class covering bins [i, j] inclusive."""
        w = P[j + 1] - P[i]
        if w <= 0:
            return 0.0
        m = M[j + 1] - M[i]
        return m * m / w

    NEG = -np.inf
    # dp[j] = best score for splitting bins [0..j] into `c` classes,
    # cut[c][j] = the last class's start bin at the optimum
    dp = np.array([seg(0, j) for j in range(nb)])
    cuts = []
    for c in range(2, classes + 1):
        ndp = np.full(nb, NEG)
        cut = np.zeros(nb, dtype=int)
        for j in range(c - 1, nb):
            best, bi = NEG, c - 1
            for i in range(c - 1, j + 1):
                v = dp[i - 1] + seg(i, j)
                if v > best:
                    best, bi = v, i
            ndp[j] = best
            cut[j] = bi
        dp = ndp
        cuts.append(cut)
    # backtrack: thresholds are the last bin of each class but the final
    j = nb - 1
    idx = []
    for cut in reversed(cuts):
        i = cut[j]
        idx.append(i - 1)
        j = i - 1
    idx = np.asarray(sorted(idx))
    return jnp.asarray(centers[idx])


def threshold_niblack(image, window_size=15, k=0.2):
    """Niblack local threshold surface (skimage parity)."""
    m, s = _mean_std(image, window_size)
    return m - k * s


def threshold_sauvola(image, window_size=15, k=0.2, r=None):
    """Sauvola local threshold surface (skimage parity)."""
    image = jnp.asarray(image)
    if r is None:
        imin, imax = float(image.min()), float(image.max())
        r = 0.5 * (imax - imin)
    m, s = _mean_std(image, window_size)
    return m * (1 + k * ((s / r) - 1))


def _mean_std(image, w):
    """Local mean and std over a w-sized window (separable box sums;
    replaces the reference's integral-image version,
    thresholding.py:1003-1058)."""
    image = jnp.asarray(image).astype(np.float64)
    if np.isscalar(w):
        w = (int(w),) * image.ndim
    if any(wi < 3 or wi % 2 == 0 for wi in w):
        warn("All window sizes should be odd and >= 3")
    m = ndi.uniform_filter(image, size=list(w), mode="mirror")
    m2 = ndi.uniform_filter(image * image, size=list(w), mode="mirror")
    var = jnp.maximum(m2 - m * m, 0)
    return m, jnp.sqrt(var)


def threshold_local(
    image, block_size, method="gaussian", offset=0, mode="reflect",
    param=None, cval=0,
):
    """Adaptive local threshold surface (skimage parity)."""
    image = jnp.asarray(image).astype(np.float64)
    if np.isscalar(block_size):
        block_size = (int(block_size),) * image.ndim
    if any(b % 2 == 0 for b in block_size):
        raise ValueError(
            "block_size must be odd! Given block_size "
            f"{block_size} contains even values."
        )
    if method == "generic":
        # beyond the reference, which raises here (reference
        # thresholding.py:236): route through ndimage.generic_filter,
        # whose callable receives each window's values raveled
        if not callable(param):
            raise ValueError(
                "Method 'generic' requires a callable 'param'"
            )
        thresh = ndi.generic_filter(
            image, param, size=tuple(block_size), mode=mode, cval=cval
        )
        return thresh - offset
    if method == "gaussian":
        if param is None:
            sigma = [(b - 1) / 6.0 for b in block_size]
        else:
            sigma = param
        thresh = ndi.gaussian_filter(image, sigma, mode=mode, cval=cval)
    elif method == "mean":
        thresh = ndi.uniform_filter(
            image, size=list(block_size), mode=mode, cval=cval
        )
    elif method == "median":
        thresh = ndi.median_filter(
            image, size=tuple(block_size), mode=mode, cval=cval
        )
    else:
        raise ValueError(
            "Invalid method specified. Please use `generic`, "
            "`gaussian`, `mean`, or `median`."
        )
    return thresh - offset


def apply_hysteresis_threshold(image, low, high):
    """Hysteresis thresholding: keep low-mask components touching the
    high mask (skimage parity; device-side via label)."""
    image = jnp.asarray(image)
    low = jnp.clip(jnp.asarray(low), None, jnp.asarray(high))
    mask_low = image > low
    mask_high = image > high
    labels_low, num_labels = ndi.label(mask_low)
    n = int(num_labels)
    # which low components contain a high pixel
    import jax

    sums = jax.ops.segment_sum(
        mask_high.ravel().astype(np.int32),
        jnp.asarray(labels_low).ravel(),
        num_segments=n + 1,
    )
    connected = sums > 0
    connected = connected.at[0].set(False)
    return connected[labels_low]


def try_all_threshold(image, figsize=(8, 5), verbose=True):
    """Apply all global threshold methods and plot results (skimage
    parity; returns the matplotlib fig, ax)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    methods = OrderedDict(
        {
            "Isodata": threshold_isodata,
            "Li": threshold_li,
            "Mean": threshold_mean,
            "Minimum": threshold_minimum,
            "Otsu": threshold_otsu,
            "Triangle": threshold_triangle,
            "Yen": threshold_yen,
        }
    )
    num_rows = math.ceil((len(methods) + 1) / 2)
    fig, ax = plt.subplots(
        num_rows, 2, figsize=figsize, sharex=True, sharey=True
    )
    ax = ax.ravel()
    ax[0].imshow(np.asarray(image), cmap=plt.cm.gray)
    ax[0].set_title("Original")
    i = 1
    for name, func in methods.items():
        ax[i].set_title(name)
        try:
            t = func(image)
            ax[i].imshow(np.asarray(jnp.asarray(image) > t),
                         cmap=plt.cm.gray)
        except Exception as e:
            ax[i].text(
                0.5, 0.5, f"{type(e).__name__}",
                ha="center", va="center", transform=ax[i].transAxes,
            )
            if verbose:
                print(f"{name} failed: {e}")
        ax[i].set_axis_off()
        i += 1
    ax[0].set_axis_off()
    for a in ax[i:]:
        a.set_axis_off()
    return fig, ax
