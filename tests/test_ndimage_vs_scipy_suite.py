"""Direct-vs-SciPy 1-d convolve/correlate suite — TPU-native port.

Ports /root/reference/cupyimg/scipy/ndimage/tests/test_ndimage_vs_scipy.py:
convolve1d/correlate1d against scipy.ndimage across dtypes x lengths x
modes x every legal origin, including kernels LONGER than the signal,
plus the upfirdn cross-check route (the reference's fast_upfirdn backend;
first-party polyphase here) and origin-out-of-range error parity.

Deviation: the reference's complex correlate1d oracle is componentwise
(real*real + j*imag*imag — its CUDA kernels predate complex support);
this framework follows modern scipy.ndimage complex semantics, so the
complex tests pin against scipy's own complex output instead.
"""

import itertools

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import convolve1d, correlate1d
from cupyimg_tpu.scipy.signal import upfirdn


def _upfirdn_mode_kwargs(mode, cval=0):
    """ndimage boundary mode -> upfirdn extension-mode kwargs (the
    reference's _get_ndimage_mode_kwargs, _util.py:154-167)."""
    return {
        "reflect": dict(mode="symmetric"),
        "mirror": dict(mode="reflect"),
        "nearest": dict(mode="edge"),
        "constant": dict(mode="constant", cval=cval),
        "wrap": dict(mode="periodic"),
    }[mode]


MODES = ["constant", "mirror", "nearest", "reflect", "wrap"]


@pytest.mark.parametrize(
    "dtype_x, dtype_h, len_x, mode",
    itertools.product(
        [np.float32, np.float64], [np.float32, np.float64],
        [2, 3, 6, 7], MODES,
    ),
)
def test_convolve1d(dtype_x, dtype_h, len_x, mode):
    x_cpu = np.arange(1, 1 + len_x, dtype=dtype_x)
    xg = jnp.asarray(x_cpu)
    for len_h in range(1, len_x):
        h_cpu = np.arange(1, 1 + len_h, dtype=dtype_h)
        hg = jnp.asarray(h_cpu)
        min_origin = -(len_h // 2)
        max_origin = (len_h - 1) // 2
        for origin in range(min_origin, max_origin + 1):
            y = sndi.convolve1d(
                x_cpu, h_cpu, mode=mode, cval=0, origin=origin
            )
            y3 = convolve1d(xg, hg, mode=mode, cval=0, origin=origin)
            np.testing.assert_allclose(y, np.asarray(y3), rtol=1e-6)

            # the reference also cross-checks through its external
            # fast_upfirdn backend; here through the first-party
            # polyphase upfirdn (scipy/signal/_upfirdn.py)
            offset = len_h // 2 + origin
            y2 = upfirdn(
                hg, xg, offset=offset, **_upfirdn_mode_kwargs(mode)
            )[:len_x]
            np.testing.assert_allclose(y, np.asarray(y2), rtol=1e-6)

        for origin in [min_origin - 1, max_origin + 1]:
            with pytest.raises(ValueError):
                convolve1d(xg, hg, mode=mode, cval=0, origin=origin)


@pytest.mark.parametrize(
    "dtype_x, dtype_h, len_x, mode",
    itertools.product(
        [np.float32, np.float64], [np.float32, np.float64],
        [2, 3, 6, 7], MODES,
    ),
)
def test_correlate1d(dtype_x, dtype_h, len_x, mode):
    x_cpu = np.arange(1, 1 + len_x, dtype=dtype_x)
    xg = jnp.asarray(x_cpu)
    # include kernels longer than the signal
    for len_h in range(1, 2 * len_x + 2):
        h_cpu = np.arange(1, 1 + len_h, dtype=dtype_h)
        hg = jnp.asarray(h_cpu)
        min_origin = -(len_h // 2)
        max_origin = (len_h - 1) // 2

        for origin in range(min_origin, max_origin + 1):
            y = sndi.correlate1d(
                x_cpu, h_cpu, mode=mode, cval=0, origin=origin
            )
            y3 = correlate1d(xg, hg, mode=mode, cval=0, origin=origin)
            np.testing.assert_allclose(y, np.asarray(y3), rtol=1e-6)

        for origin in [min_origin - 1, max_origin + 1]:
            with pytest.raises(ValueError):
                correlate1d(xg, hg, mode=mode, cval=0, origin=origin)


@pytest.mark.parametrize(
    "dtype_x, dtype_h, mode",
    itertools.product(
        [np.complex64, np.complex128],
        [np.float64, np.complex128],
        MODES,
    ),
)
def test_correlate1d_complex(dtype_x, dtype_h, mode):
    len_x = 6
    x_cpu = np.arange(1, 1 + len_x).astype(dtype_x)
    x_cpu = x_cpu + 1j * x_cpu[::-1]
    xg = jnp.asarray(x_cpu)
    for len_h in range(1, 2 * len_x + 2):
        h_cpu = np.arange(1, 1 + len_h).astype(dtype_h)
        if np.dtype(dtype_h).kind == "c":
            h_cpu = h_cpu + 0.5j * h_cpu
        hg = jnp.asarray(h_cpu)
        y = sndi.correlate1d(x_cpu, h_cpu, mode=mode, cval=0)
        y3 = correlate1d(xg, hg, mode=mode, cval=0)
        np.testing.assert_allclose(y, np.asarray(y3), rtol=1e-6)
