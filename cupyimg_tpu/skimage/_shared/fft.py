"""FFT shim (reference cupyimg/skimage/_shared/fft.py): jnp.fft plus
next_fast_len re-export."""

import jax.numpy as jnp

from cupyimg_tpu.scipy.signal.signaltools import next_fast_len  # noqa: F401

fftmodule = jnp.fft
