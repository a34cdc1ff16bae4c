"""Spline-prefilter suites — TPU-native port.

Ports /root/reference/cupyimg/scipy/ndimage/tests/test_splines.py (the
knot-matrix inversion identity: spline_filter1d applied to the identity
matrix, multiplied by the B-spline knot matrix, must reproduce the
identity) and test_spline_vs_ndimage.py (direct comparison against
scipy.ndimage across dtypes, orders 2-5, both axes, all modes, real and
complex).  The IIR recurrence here is the scan/FIR formulation in
ops/iir.py (reference kernel: _spline_prefilter_core.py:237-287).
"""

import itertools

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage


def get_spline_knot_values(order):
    """Knot values to the right of a B-spline's center."""
    return {
        0: [1],
        1: [1],
        2: [6, 1],
        3: [4, 1],
        4: [230, 76, 1],
        5: [66, 26, 1],
    }[order]


def make_spline_knot_matrix(n, order, mode="mirror"):
    """Matrix to invert to find the spline coefficients."""
    knot_values = get_spline_knot_values(order)

    matrix = np.zeros((n, n))
    for diag, knot_value in enumerate(knot_values):
        indices = np.arange(diag, n)
        if diag == 0:
            matrix[indices, indices] = knot_value
        else:
            matrix[indices, indices - diag] = knot_value
            matrix[indices - diag, indices] = knot_value

    knot_values_sum = knot_values[0] + 2 * sum(knot_values[1:])

    if mode == "mirror":
        start, step = 1, 1
    elif mode == "reflect":
        start, step = 0, 1
    elif mode == "grid-wrap":
        # The periodic B-spline system is exactly circulant.  The
        # reference built it by folding off-diagonals (its
        # test_splines.py:47-51) and labeled it 'wrap', but that fold
        # only handles ONE off-diagonal (orders 4-5 have two), and
        # modern scipy's 'wrap' prefilter is not the periodic system
        # at all — 'grid-wrap' is (verified: scipy's own grid-wrap
        # output satisfies this circulant identity to 4e-16 for every
        # order, while its 'wrap' misses by 0.18-0.59).
        matrix[:] = 0
        idx = np.arange(n)
        for diag, knot_value in enumerate(knot_values):
            matrix[idx, (idx + diag) % n] = knot_value
            matrix[idx, (idx - diag) % n] = knot_value
        return matrix / knot_values_sum
    else:
        raise ValueError("unsupported mode {}".format(mode))

    for row in range(len(knot_values) - 1):
        for idx, knot_value in enumerate(knot_values[row + 1:]):
            matrix[row, start + step * idx] += knot_value
            matrix[-row - 1, -start - 1 - step * idx] += knot_value

    return matrix / knot_values_sum


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize("mode", ["mirror", "grid-wrap", "reflect"])
def test_spline_filter_vs_matrix_solution(order, mode):
    n = 100
    eye = jnp.eye(n, dtype=float)
    filt0 = ndimage.spline_filter1d(eye, axis=0, order=order, mode=mode)
    filt1 = ndimage.spline_filter1d(eye, axis=1, order=order, mode=mode)
    matrix = make_spline_knot_matrix(n, order, mode=mode)
    np.testing.assert_array_almost_equal(
        np.eye(n), np.asarray(filt0) @ matrix
    )
    np.testing.assert_array_almost_equal(
        np.eye(n), np.asarray(filt1) @ matrix.T
    )


@pytest.mark.parametrize(
    "dtype, order, axis",
    itertools.product(
        [np.float32, np.float64], [2, 3, 4, 5], [0, -1]
    ),
)
def test_spline_filter_1d_real(dtype, order, axis):
    rstate = np.random.RandomState(1234)
    if dtype == np.float32:
        atol = rtol = 1e-5
    else:
        atol = rtol = 1e-11
    x = rstate.randn(156, 256).astype(dtype)
    y = sndi.spline_filter1d(x, order=order, axis=axis, output=dtype)
    yd = ndimage.spline_filter1d(
        jnp.asarray(x), order=order, axis=axis, output=dtype
    )
    np.testing.assert_allclose(y, np.asarray(yd), atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "dtype, order, axis, mode",
    itertools.product(
        [np.float32, np.float64],
        [2, 3, 4, 5],
        [0, -1],
        ["mirror", "constant", "nearest", "reflect", "wrap"],
    ),
)
def test_spline_filter_1d_real_ndimage(dtype, order, axis, mode):
    rstate = np.random.RandomState(1234)
    atol = rtol = 1e-6
    x = rstate.randn(156, 256).astype(dtype)
    y = sndi.spline_filter1d(
        x, order=order, axis=axis, output=dtype, mode=mode
    )
    yd = ndimage.spline_filter1d(
        jnp.asarray(x), order=order, axis=axis, output=dtype, mode=mode,
        allow_float32=False,
    )
    np.testing.assert_allclose(y, np.asarray(yd), atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "dtype, order, axis",
    itertools.product(
        [np.complex64, np.complex128], [2, 3, 4, 5], [0, -1]
    ),
)
def test_spline_filter_1d_complex(dtype, order, axis):
    rstate = np.random.RandomState(1234)
    if dtype == np.complex64:
        atol = rtol = 1e-5
        real_dtype = np.float32
    else:
        atol = rtol = 1e-11
        real_dtype = np.float64

    x = rstate.randn(156, 256).astype(real_dtype)
    x = x + 1j * rstate.randn(156, 256).astype(real_dtype)
    y = sndi.spline_filter1d(
        x.real, order=order, axis=axis, output=real_dtype
    )
    y = y + 1j * sndi.spline_filter1d(
        x.imag, order=order, axis=axis, output=real_dtype
    )
    yd = ndimage.spline_filter1d(
        jnp.asarray(x), order=order, axis=axis, output=dtype
    )
    np.testing.assert_allclose(y, np.asarray(yd), atol=atol, rtol=rtol)
