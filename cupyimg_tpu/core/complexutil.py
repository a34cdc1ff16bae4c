"""Portable complex construction/transfer helpers.

Some TPU runtimes implement complex *compute* (FFT, multiply, conj) but
not ``lax.complex`` construction, complex constants, or complex
host<->device transfers.  These helpers route around that:

- ``make_complex(re, im)`` builds ``re + i*im`` on device from two real
  arrays.  The imaginary unit is synthesized with a length-4 real FFT
  (``fft([0,1,0,0])[3] == i``), so only real values ever cross the
  host/device boundary and no complex literal is materialized.
- ``to_host_complex(x)`` pulls a device complex array to a NumPy complex
  array by transferring the real and imaginary planes separately.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["make_complex", "to_host_complex", "imaginary_unit"]


def imaginary_unit(real_dtype=np.float32):
    """The scalar ``i`` as a device complex value, built from reals."""
    e1 = jnp.zeros(4, dtype=real_dtype).at[1].set(1)
    # DFT: X[k] = sum_n x[n] e^{-2*pi*i*n*k/4}; x = e_1 -> X[3] = i
    return jnp.fft.fft(e1)[3]


def make_complex(re, im):
    """``re + i*im`` from two real arrays, without ``lax.complex``."""
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    real_dtype = jnp.promote_types(re.dtype, im.dtype)
    complex_dtype = jnp.promote_types(real_dtype, np.complex64)
    i = imaginary_unit(real_dtype).astype(complex_dtype)
    return re.astype(complex_dtype) + i * im.astype(complex_dtype)


def to_host_complex(x):
    """Device complex array -> host NumPy complex array via two real
    transfers."""
    re = np.asarray(jnp.real(x))
    im = np.asarray(jnp.imag(x))
    return re + 1j * im
