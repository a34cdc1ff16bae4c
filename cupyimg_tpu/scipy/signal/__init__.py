"""scipy.signal-compatible API (reference cupyimg/scipy/signal)."""

from cupyimg_tpu.scipy.signal._upfirdn import upfirdn, upfirdn_out_len  # noqa: F401
from cupyimg_tpu.scipy.signal.signaltools import (  # noqa: F401
    choose_conv_method,
    convolve,
    correlate,
    convolve2d,
    correlate2d,
    fftconvolve,
    oaconvolve,
    wiener,
    hilbert,
    hilbert2,
    resample,
    resample_poly,
)
