"""scipy.ndimage-compatible API on TPU-native JAX engines.

Mirrors reference cupyimg/scipy/ndimage/__init__.py exports.
"""

from cupyimg_tpu.scipy.ndimage.filters import (
    generic_filter,
    generic_filter1d,  # noqa: F401
    correlate,
    convolve,
    correlate1d,
    convolve1d,
    uniform_filter,
    uniform_filter1d,
    gaussian_filter,
    gaussian_filter1d,
    prewitt,
    sobel,
    generic_laplace,
    laplace,
    gaussian_laplace,
    generic_gradient_magnitude,
    gaussian_gradient_magnitude,
    minimum_filter,
    maximum_filter,
    minimum_filter1d,
    maximum_filter1d,
    rank_filter,
    median_filter,
    percentile_filter,
)
from cupyimg_tpu.scipy.ndimage.interpolation import (  # noqa: F401
    spline_filter1d,
    spline_filter,
    map_coordinates,
    affine_transform,
    shift,
    zoom,
    rotate,
    geometric_transform,
)
from cupyimg_tpu.scipy.ndimage.fourier import (  # noqa: F401
    fourier_gaussian,
    fourier_uniform,
    fourier_shift,
    fourier_ellipsoid,
)
from cupyimg_tpu.scipy.ndimage import measurements  # noqa: F401
from cupyimg_tpu.scipy.ndimage.measurements import (  # noqa: F401
    find_objects,
    value_indices,
    label,
    sum_labels,
    mean,
    variance,
    standard_deviation,
    minimum,
    maximum,
    median,
    minimum_position,
    maximum_position,
    extrema,
    center_of_mass,
    histogram,
    labeled_comprehension,
)
from cupyimg_tpu.scipy.ndimage.measurements import sum  # noqa: F401,A004
from cupyimg_tpu.scipy.ndimage.morphology import (  # noqa: F401
    generate_binary_structure,
    iterate_structure,
    binary_erosion,
    binary_dilation,
    binary_opening,
    binary_closing,
    binary_hit_or_miss,
    binary_propagation,
    binary_fill_holes,
    grey_erosion,
    grey_dilation,
    grey_opening,
    grey_closing,
    morphological_gradient,
    morphological_laplace,
    white_tophat,
    black_tophat,
)

# spline-prefilter internals re-exported for reference parity
# (reference _spline_prefilter_core.py:14-42, 256-287); the "raw kernel"
# factory returns the jitted 1-d prefilter instead of a CUDA RawKernel
from cupyimg_tpu.ops.iir import get_poles, get_gain  # noqa: F401,E402


def get_raw_spline1d_kernel(order, mode):
    """Return a callable applying the order-``order`` spline prefilter
    along axis 0 (the TPU analog of the reference's per-row CUDA
    RawKernel factory)."""
    from cupyimg_tpu.ops import iir as _iir
    import numpy as _np

    def kernel(x):
        nb = _iir._n_boundary(
            get_poles(order), _np.dtype(x.dtype).char.lower()
        )
        return _iir._apply_axis0(
            x, order, _iir.get_spline_mode(mode), nb
        )

    return kernel

from cupyimg_tpu.scipy.ndimage._distance_transform import (  # noqa: F401,E402
    distance_transform_edt,
    distance_transform_cdt,
    distance_transform_bf,
)
