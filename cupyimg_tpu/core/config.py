"""Global configuration for cupyimg_tpu.

The reference has no config system; behavior switches are kwargs plus CuPy
env vars (SURVEY.md §5).  Here a small config object centralizes the few
framework-level switches, chiefly the float64 strategy: TPU has no native
f64, so the SciPy-parity ``dtype_mode='ndimage'`` (f64 accumulation,
reference cupyimg/scipy/ndimage/_util.py:28-40) only yields true f64 when
JAX x64 is enabled (CPU tests); on TPU it silently computes in f32.
"""

import os


class _Config:
    """Mutable global knobs (threadsafe enough for the library use-case)."""

    def __init__(self):
        # Default dtype policy for ndimage filters. The reference defaults to
        # 'ndimage' (f64) for SciPy parity; on TPU 'float' (native f32) is the
        # performant choice, so we keep 'ndimage' as the API default (parity)
        # and let x64-off JAX degrade f64 -> f32 transparently.
        self.default_dtype_mode = os.environ.get(
            "CUPYIMG_TPU_DTYPE_MODE", "ndimage"
        )
        # Use Pallas kernels where available ('auto' => only on TPU backend).
        self.use_pallas = os.environ.get("CUPYIMG_TPU_USE_PALLAS", "auto")
        # FFT-domain convolution via MXU matmul FFTs (ops/mxfft) instead of
        # XLA's FFT ('auto' => on TPU for f32 when every size factors).
        self.use_mxfft = os.environ.get("CUPYIMG_TPU_USE_MXFFT", "auto")
        # Interpolation coordinate precision: 'auto' | 'f32' | 'f64'.
        # The reference computes interpolation coordinates in C double
        # regardless of image dtype (its _interp_kernels.py:312-317 uses
        # W=double); TPU f64 is emulated, so 'auto' means f64 only on the
        # CPU x64 parity tier and f32 on TPU (knife-edge coordinates —
        # points landing exactly on a domain edge or half-integer — may
        # then round differently from SciPy; documented deviation).
        self.coord_precision = os.environ.get(
            "CUPYIMG_TPU_COORD_PRECISION", "auto"
        )

    def pallas_fft_enabled(self) -> bool:
        """Fused single-pass Pallas FFT pipeline (ops/pallas_fft) for
        2-D real frequency-domain products.  Measured 2.3x faster than
        XLA's TPU FFT on the 4224^2 convolution roundtrip (3.7 ms vs
        8.7 ms on v5e); 'auto' follows the Pallas backend gate."""
        flag = os.environ.get("CUPYIMG_TPU_USE_PALLAS_FFT", "auto")
        if flag == "auto":
            return self.pallas_enabled()
        return flag in ("1", "true", "on", "yes")

    def mxfft_enabled(self) -> bool:
        if self.use_mxfft == "auto":
            # off until the matmul FFT measures faster than XLA's FFT
            # on the production chip; flip to backend-gated then
            return False
        return self.use_mxfft in ("1", "true", "on", "yes")

    def pallas_enabled(self) -> bool:
        if self.use_pallas == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.use_pallas in ("1", "true", "on", "yes")


config = _Config()
