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


# Persistent XLA compilation cache — the analog of the reference's CuPy
# on-disk kernel cache (SURVEY.md §5: the only persistent state either
# framework keeps).  First-compile costs on TPU are tens of seconds for
# the heavier kernels; subsequent processes replay from disk.  Opt out
# with CUPYIMG_TPU_NO_CACHE=1 or by configuring jax's cache yourself
# before importing this package.
import os as _os  # noqa: E402

if not _os.environ.get("CUPYIMG_TPU_NO_CACHE"):
    import jax as _jax  # noqa: E402

    if _jax.config.jax_compilation_cache_dir is None:
        _cache = _os.environ.get(
            "CUPYIMG_TPU_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "cupyimg_tpu",
                "xla",
            ),
        )
        try:
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # pragma: no cover - cache is best-effort
            pass
