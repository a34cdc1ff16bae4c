from cupyimg_tpu.skimage.metrics.simple_metrics import (  # noqa: F401
    mean_squared_error,
    normalized_root_mse,
    peak_signal_noise_ratio,
)
from cupyimg_tpu.skimage.metrics._structural_similarity import (  # noqa: F401
    structural_similarity,
)
