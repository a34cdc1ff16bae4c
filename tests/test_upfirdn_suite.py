"""upfirdn suite (validation, naive-oracle products, extension modes).

Ported from the reference
/root/reference/cupyimg/scipy/signal/tests/test_upfirdn.py (itself adapted
from the Motorola upfirdn library tests).  Oracle = a naive numpy
upsample/convolve/downsample implementation, scipy.signal.lfilter, and the
hard-coded extension-mode vectors.
"""

from itertools import product

import numpy as np
import pytest
from numpy.testing import assert_equal, assert_allclose
from scipy.signal import firwin, lfilter
import jax.numpy as jnp

from cupyimg_tpu.scipy.signal import upfirdn
from cupyimg_tpu.scipy.signal._upfirdn import (
    upfirdn_modes,
    upfirdn_out_len as _output_len,
)


def _pad_test(x, npre, npost, mode):
    # test array extension by convolving with an impulse padded with zeros
    h = np.zeros((npre + npost + 1))
    h[npre] = 1
    return np.asarray(upfirdn(h, x, up=1, down=1, mode=mode))


def upfirdn_naive(x, h, up=1, down=1):
    """Naive upfirdn: zero-stuff, convolve, downsample."""
    h = np.asarray(h)
    out = np.zeros(len(x) * up, x.dtype)
    out[::up] = x
    out = np.convolve(h, out)[::down][
        : _output_len(len(h), len(x), up, down)
    ]
    return out


class UpFIRDnCase:
    def __init__(self, up, down, h, x_dtype):
        self.up = up
        self.down = down
        self.h = np.atleast_1d(h)
        self.x_dtype = x_dtype
        self.rng = np.random.RandomState(17)

    def __call__(self):
        # tiny signal
        self.scrub(np.ones(1, self.x_dtype))
        # ones
        self.scrub(np.ones(10, self.x_dtype))
        # randn
        x = self.rng.randn(10).astype(self.x_dtype)
        if self.x_dtype in (np.complex64, np.complex128):
            x = x + 1j * self.rng.randn(10)
        self.scrub(x)
        # ramp
        self.scrub(np.arange(10).astype(self.x_dtype))
        # 3D, random
        size = (2, 3, 5)
        x = self.rng.randn(*size).astype(self.x_dtype)
        if self.x_dtype in (np.complex64, np.complex128):
            x = x + 1j * self.rng.randn(*size)
        for axis in range(len(size)):
            self.scrub(x, axis=axis)
        x = x[:, ::2, 1::3].T
        for axis in range(len(size)):
            self.scrub(x, axis=axis)

    def scrub(self, x, axis=-1):
        yr = np.apply_along_axis(
            upfirdn_naive, axis, x, self.h, self.up, self.down
        )
        y = np.asarray(
            upfirdn(jnp.asarray(self.h), jnp.asarray(x), self.up,
                    self.down, axis=axis)
        )
        dtypes = (self.h.dtype, x.dtype)
        if all(d == np.complex64 for d in dtypes):
            assert_equal(y.dtype, np.complex64)
        elif np.complex64 in dtypes and np.float32 in dtypes:
            assert_equal(y.dtype, np.complex64)
        elif all(d == np.float32 for d in dtypes):
            assert_equal(y.dtype, np.float32)
        elif np.complex128 in dtypes or np.complex64 in dtypes:
            assert_equal(y.dtype, np.complex128)
        else:
            assert_equal(y.dtype, np.float64)
        assert_allclose(yr, y, atol=1e-8, rtol=1e-5)


class TestUpfirdn:
    def test_valid_input(self):
        with pytest.raises(ValueError):
            upfirdn([1], [1], 1, 0)  # up or down < 1
        with pytest.raises(ValueError):
            upfirdn([], [1], 1, 1)  # h.ndim != 1
        with pytest.raises(ValueError):
            upfirdn([[1]], [1], 1, 1)

    @pytest.mark.parametrize("down", [2, 11, 79])
    @pytest.mark.parametrize("dtype", [int, np.float32, np.complex64, float])
    def test_vs_lfilter(self, down, dtype):
        # up=1 gives the same answer as lfilter + slicing
        random_state = np.random.RandomState(17)
        size = 10000
        x = random_state.randn(size).astype(dtype)
        if dtype in (np.complex64, np.complex128):
            x = x + 1j * random_state.randn(size)

        tol = np.finfo(np.float32).eps * 100
        h = firwin(31, 1.0 / down, window="hamming")
        yl = lfilter(h, 1.0, x)[::down]
        y = np.asarray(upfirdn(jnp.asarray(h), jnp.asarray(x), up=1,
                               down=down))
        assert_allclose(yl, y[: yl.size], atol=tol, rtol=tol)

    @pytest.mark.parametrize(
        "up, down", [(1, 1), (2, 2), (3, 2), (2, 3)]
    )
    @pytest.mark.parametrize("x_dtype",
                             [int, np.float32, np.complex64, float, complex])
    @pytest.mark.parametrize("h", [1.0, 1j])
    def test_vs_naive_simple(self, up, down, x_dtype, h):
        UpFIRDnCase(up, down, h, x_dtype)()

    @pytest.mark.parametrize("p_max, q_max", [(100, 100), (100, 10),
                                              (10, 100), (10, 10)])
    @pytest.mark.parametrize("h_dtype, x_dtype",
                             [(int, np.float32), (float, complex),
                              (np.float32, np.complex64), (complex, float)])
    def test_vs_naive_random(self, p_max, q_max, h_dtype, x_dtype):
        n_rep = 2
        longest_h = 25
        random_state = np.random.RandomState(17)
        for _ in range(n_rep):
            p_add = q_max if p_max > q_max else 1
            q_add = p_max if q_max > p_max else 1
            p = random_state.randint(p_max) + p_add
            q = random_state.randint(q_max) + q_add
            len_h = random_state.randint(longest_h) + 1
            h = np.atleast_1d(random_state.randint(len_h)).astype(h_dtype)
            if h_dtype == complex:
                h = h + 1j * np.atleast_1d(random_state.randint(len_h))
            UpFIRDnCase(p, q, h, x_dtype)()

    @pytest.mark.parametrize("mode", upfirdn_modes)
    def test_extensions(self, mode):
        """vs manually computed results for modes not in numpy's pad."""
        x = np.array([1, 2, 3, 1], dtype=float)
        npre, npost = 6, 6

        y = _pad_test(jnp.asarray(x), npre=npre, npost=npost, mode=mode)
        if mode == "antisymmetric":
            y_expected = np.asarray(
                [3, 1, -1, -3, -2, -1, 1, 2, 3, 1, -1, -3, -2, -1, 1, 2]
            )
        elif mode == "antireflect":
            y_expected = np.asarray(
                [1, 2, 3, 1, -1, 0, 1, 2, 3, 1, -1, 0, 1, 2, 3, 1]
            )
        elif mode == "smooth":
            y_expected = np.asarray(
                [-5, -4, -3, -2, -1, 0, 1, 2, 3, 1, -1, -3, -5, -7, -9, -11]
            )
        elif mode == "line":
            lin_slope = (x[-1] - x[0]) / (len(x) - 1)
            left = x[0] + np.arange(-npre, 0, 1) * lin_slope
            right = x[-1] + np.arange(1, npost + 1) * lin_slope
            y_expected = np.concatenate((left, x, right))
        else:
            y_expected = np.pad(x, (npre, npost), mode=mode)
        assert_allclose(y, y_expected)

    @pytest.mark.parametrize(
        "size, h_len, mode, dtype",
        product(
            [8],
            [4, 5, 26],  # include cases with h_len > 2*size
            upfirdn_modes,
            [np.float32, np.float64, np.complex64, np.complex128],
        ),
    )
    def test_modes(self, size, h_len, mode, dtype):
        random_state = np.random.RandomState(5)
        x = random_state.randn(size).astype(dtype)
        if dtype in (np.complex64, np.complex128):
            x = x + 1j * random_state.randn(size)
        h = np.arange(1, 1 + h_len, dtype=np.asarray(x).real.dtype)

        y = np.asarray(upfirdn(jnp.asarray(h), jnp.asarray(x), up=1,
                               down=1, mode=mode))
        npad = h_len - 1
        if mode in ["antisymmetric", "antireflect", "smooth", "line"]:
            xpad = _pad_test(jnp.asarray(x), npre=npad, npost=npad,
                             mode=mode)
        else:
            xpad = np.pad(x, npad, mode=mode)
        ypad = np.asarray(upfirdn(jnp.asarray(h), jnp.asarray(xpad), up=1,
                                  down=1, mode="constant"))
        y_expected = ypad[npad:-npad]

        atol = rtol = np.finfo(dtype).eps * 1e2
        assert_allclose(y, y_expected, atol=atol, rtol=rtol)
