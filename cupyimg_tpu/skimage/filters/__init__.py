from cupyimg_tpu.skimage.filters.edges import (  # noqa: F401
    sobel, sobel_h, sobel_v,
    scharr, scharr_h, scharr_v,
    prewitt, prewitt_h, prewitt_v,
    roberts, roberts_pos_diag, roberts_neg_diag,
    farid, farid_h, farid_v,
    laplace,
)
from cupyimg_tpu.skimage.filters._gaussian import (  # noqa: F401
    gaussian,
    difference_of_gaussians,
)
from cupyimg_tpu.skimage.filters._median import median  # noqa: F401
from cupyimg_tpu.skimage.filters._unsharp_mask import unsharp_mask  # noqa: F401
from cupyimg_tpu.skimage.filters._gabor import gabor, gabor_kernel  # noqa: F401
from cupyimg_tpu.skimage.filters._window import window  # noqa: F401
from cupyimg_tpu.skimage.filters._rank_order import rank_order  # noqa: F401
from cupyimg_tpu.skimage.filters.lpi_filter import (  # noqa: F401
    LPIFilter2D,
    filter_forward,
    forward,
    inverse,
    wiener,
)
from cupyimg_tpu.skimage.filters.thresholding import (  # noqa: F401
    try_all_threshold,
    threshold_otsu,
    threshold_yen,
    threshold_isodata,
    threshold_li,
    threshold_local,
    threshold_minimum,
    threshold_mean,
    threshold_niblack,
    threshold_sauvola,
    threshold_triangle,
    threshold_multiotsu,
    apply_hysteresis_threshold,
)
from cupyimg_tpu.skimage.filters.ridges import (  # noqa: F401
    meijering,
    sato,
    frangi,
    hessian,
    compute_hessian_eigenvalues,
)

# rank_filter alias used by the reference's README listing
rank_filter = median
