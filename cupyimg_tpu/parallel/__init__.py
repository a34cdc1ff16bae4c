"""Multi-device execution: sharded volumes with ICI halo exchange.

The reference is single-GPU (SURVEY.md §2.4 — no distributed machinery at
all); this subsystem is new TPU-native design, not a port.  Image volumes
shard over a ``jax.sharding.Mesh`` (batch axes via data parallelism, spatial
axes via spatial partitioning); stencil ops run under ``shard_map`` with
halo exchange of boundary slabs over ICI (``lax.ppermute``), reusing the
same overlap math the reference uses for overlap-add block convolution
(signaltools.py:664-985).
"""

from cupyimg_tpu.parallel.halo import (  # noqa: F401
    halo_exchange,
    sharded_correlate1d,
    sharded_uniform_filter,
    sharded_gaussian_filter,
    sharded_min_max_filter,
    sharded_minimum_filter,
    sharded_maximum_filter,
    sharded_median_filter,
    sharded_fftconvolve,
    sharded_label,
)
from cupyimg_tpu.parallel.halo import (  # noqa: F401
    sharded_map_overlap,
    sharded_correlate,
    sharded_convolve,
    sharded_binary_erosion,
    sharded_binary_dilation,
    sharded_shift,
    sharded_map_coordinates,
    sharded_affine_transform,
    sharded_fft2,
    sharded_fftconvolve2d_spatial,
)
