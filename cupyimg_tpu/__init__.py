"""cupyimg_tpu — a TPU-native, from-scratch n-dimensional image/signal framework.

Provides the capabilities of the reference library ``cupyimg``
(scipy.ndimage / scipy.signal / scipy.special / scipy.stats / scipy.interpolate
subsets plus a large scikit-image surface), re-designed for TPU:

- compute path: JAX / XLA with Pallas kernels for bandwidth-bound stencils
- distribution: ``jax.sharding`` meshes with ICI halo exchange (``cupyimg_tpu.parallel``)
- no runtime string codegen: Python-level specialization via tracing + jit caching
  plays the role the reference's memoized CUDA codegen plays
  (cf. reference cupyimg/__init__.py:25-28 memoize shim).

Public usage mirrors the reference::

    import cupyimg_tpu.scipy.ndimage as ndi
    y = ndi.uniform_filter(x, size=5)
"""

from cupyimg_tpu.version import __version__  # noqa: F401
from cupyimg_tpu.core.config import config  # noqa: F401

from cupyimg_tpu._misc import convolve_separable  # noqa: F401,E402
