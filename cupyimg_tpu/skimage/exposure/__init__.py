from cupyimg_tpu.skimage.exposure.exposure import (  # noqa: F401
    histogram,
    equalize_hist,
    rescale_intensity,
    cumulative_distribution,
    adjust_gamma,
    adjust_log,
    adjust_sigmoid,
    is_low_contrast,
    intensity_range,
)
from cupyimg_tpu.skimage.exposure._adapthist import equalize_adapthist  # noqa: F401
from cupyimg_tpu.skimage.exposure.histogram_matching import match_histograms  # noqa: F401
