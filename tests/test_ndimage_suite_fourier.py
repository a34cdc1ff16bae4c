"""Reference fourier-filter product suite — TPU-native port.

Mirrors /root/reference/cupyimg/scipy/ndimage/tests/test_fourier.py: each
fourier filter applied to rfft- and fft-transformed random inputs over the
same shape/dtype product, with CPU scipy.ndimage as the oracle at test
time (the reference uses its dual-backend decorator for the same check).
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndimage

SHAPES_2D = [(32, 16), (31, 15)]
SHAPE_3D = (5, 16, 7)
SHAPE_1D = (15,)


def _rand(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(*shape)
    if np.dtype(dtype).kind == "c":
        x = x + 1j * rng.rand(*shape)
    return x.astype(dtype)


def _tol(dtype):
    return 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-11


PARAMS = {
    "fourier_shift": (2, 3),       # per-axis shift values below
    "fourier_gaussian": (2.5, 1.5),
    "fourier_uniform": (4, 3),
    "fourier_ellipsoid": (4, 3),
}


def _args(fname, ndim):
    base = PARAMS[fname]
    if fname == "fourier_shift":
        return [list(range(2, 2 + ndim))]
    return [list(base)[:1] * ndim if ndim > 2 else list(base)[:ndim]]


def _chk(fname, x, n, axis, dtype):
    a = jnp.asarray(x)
    arg = _args(fname, x.ndim)[0]
    got = getattr(ndimage, fname)(a, arg, n=n, axis=axis)
    exp = getattr(sndi, fname)(np.asarray(x), arg, n=n, axis=axis)
    np.testing.assert_allclose(
        np.asarray(got), exp, rtol=_tol(dtype), atol=_tol(dtype)
    )


FILTERS = ["fourier_shift", "fourier_gaussian", "fourier_uniform",
           "fourier_ellipsoid"]


@pytest.mark.parametrize("fname", FILTERS)
@pytest.mark.parametrize("shape", SHAPES_2D)
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_real_fft_axis0(fname, shape, dtype):
    x = _rand(shape, dtype)
    f = np.fft.rfft(x, n=shape[0], axis=0)
    _chk(fname, f, shape[0], 0, dtype)


@pytest.mark.parametrize("fname", FILTERS)
@pytest.mark.parametrize("shape", SHAPES_2D)
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_real_fft_axis1(fname, shape, dtype):
    x = _rand(shape, dtype)
    f = np.fft.rfft(x, n=shape[1], axis=1)
    _chk(fname, f, shape[1], 1, dtype)


@pytest.mark.parametrize("fname", FILTERS)
@pytest.mark.parametrize("shape", SHAPES_2D + [SHAPE_3D])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_fft(fname, shape, dtype):
    x = _rand(shape, dtype)
    f = np.fft.fftn(x)
    _chk(fname, f, -1, 0, dtype)


@pytest.mark.parametrize("fname", FILTERS)
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_complex_fft_1d(fname, dtype):
    if fname == "fourier_ellipsoid":
        pytest.skip("scipy fourier_ellipsoid is 2-D/3-D only pre-1.7")
    x = _rand(SHAPE_1D, dtype)
    f = np.fft.fft(x)
    a = jnp.asarray(f)
    arg = 2.0 if fname != "fourier_shift" else 2
    got = getattr(ndimage, fname)(a, arg, n=-1, axis=0)
    exp = getattr(sndi, fname)(f, arg, n=-1, axis=0)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=_tol(dtype),
                               atol=_tol(dtype))


@pytest.mark.parametrize("fname", FILTERS)
def test_output_dtype_preserved(fname):
    x = _rand((32, 16), np.complex64)
    f = np.fft.fftn(x).astype(np.complex64)  # numpy fftn promotes
    arg = _args(fname, 2)[0]
    got = getattr(ndimage, fname)(jnp.asarray(f), arg, n=-1, axis=0)
    assert np.asarray(got).dtype == np.complex64
