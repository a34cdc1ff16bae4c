"""Reference test_filters.py port — regression/validation cases.

Mirrors /root/reference/cupyimg/scipy/ndimage/tests/test_filters.py (the
adapted SciPy regression suite): multiple-mode semantics, truncate widths,
origin validation, degenerate footprints, plus a thread-safety smoke test
(the reference checks its per-device kernel cache; ours checks the jit
cache under concurrent tracing).
"""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as sndi
from cupyimg_tpu.scipy.ndimage.filters import _gaussian_kernel1d


def assert_eq(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_almost(a, b, decimal=7):
    np.testing.assert_array_almost_equal(
        np.asarray(a), np.asarray(b), decimal=decimal
    )


def test_gaussian_kernel1d():
    radius, sigma = 10, 2
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1, dtype=np.double)
    phi_x = np.exp(-0.5 * x * x / sigma2)
    phi_x /= phi_x.sum()
    # our kernels are returned reversed relative to scipy's internal
    # helper at call sites; compare against the same orientation
    k0 = np.asarray(_gaussian_kernel1d(sigma, 0, radius))
    np.testing.assert_allclose(np.sort(k0), np.sort(phi_x))
    np.testing.assert_allclose(k0.sum(), 1.0)
    k1 = np.asarray(_gaussian_kernel1d(sigma, 1, radius))
    np.testing.assert_allclose(
        np.abs(np.sort(k1)), np.abs(np.sort(-phi_x * x / sigma2)),
        atol=1e-12,
    )


def test_orders_gauss():
    arr = jnp.zeros((1,))
    assert float(sndi.gaussian_filter(arr, 1, order=0)[0]) == 0
    assert float(sndi.gaussian_filter(arr, 1, order=3)[0]) == 0
    with pytest.raises(ValueError):
        sndi.gaussian_filter(arr, 1, -1)
    assert float(sndi.gaussian_filter1d(arr, 1, axis=-1, order=0)[0]) == 0
    assert float(sndi.gaussian_filter1d(arr, 1, axis=-1, order=3)[0]) == 0
    with pytest.raises(ValueError):
        sndi.gaussian_filter1d(arr, 1, -1, -1)


def test_valid_origins():
    data = jnp.asarray([1, 2, 3, 4, 5], dtype=np.float64)
    with pytest.raises((ValueError, RuntimeError)):
        sndi.percentile_filter(data, 0.2, size=3, origin=2)
    for filt in [
        sndi.uniform_filter,
        sndi.minimum_filter,
        sndi.maximum_filter,
        sndi.maximum_filter1d,
        sndi.median_filter,
        sndi.minimum_filter1d,
    ]:
        list(np.asarray(filt(data, 3, origin=-1)))
        list(np.asarray(filt(data, 3, origin=1)))
        with pytest.raises((ValueError, RuntimeError)):
            filt(data, 3, origin=2)


def test_bad_convolve_and_correlate_origins():
    with pytest.raises((ValueError, RuntimeError)):
        sndi.correlate1d(jnp.asarray([0, 1, 2, 3, 4, 5]),
                         jnp.asarray([1, 1, 2, 0]), origin=2)
    with pytest.raises((ValueError, RuntimeError)):
        sndi.correlate(jnp.asarray([0, 1, 2, 3, 4, 5]),
                       jnp.asarray([0, 1, 2]), origin=[2])
    with pytest.raises((ValueError, RuntimeError)):
        sndi.correlate(jnp.ones((3, 5)), jnp.ones((2, 2)), origin=[0, 1])
    with pytest.raises((ValueError, RuntimeError)):
        sndi.convolve1d(jnp.arange(10), jnp.ones(3), origin=-2)
    with pytest.raises((ValueError, RuntimeError)):
        sndi.convolve(jnp.arange(10), jnp.ones(3), origin=[-2])
    with pytest.raises((ValueError, RuntimeError)):
        sndi.convolve(jnp.ones((3, 5)), jnp.ones((2, 2)), origin=[0, -2])


MM_ARR = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])


def test_multiple_modes():
    mode1 = "reflect"
    mode2 = ["reflect", "reflect"]
    assert_eq(sndi.gaussian_filter(MM_ARR, 1, mode=mode1),
              sndi.gaussian_filter(MM_ARR, 1, mode=mode2))
    assert_eq(sndi.prewitt(MM_ARR, mode=mode1),
              sndi.prewitt(MM_ARR, mode=mode2))
    assert_eq(sndi.sobel(MM_ARR, mode=mode1),
              sndi.sobel(MM_ARR, mode=mode2))
    assert_eq(sndi.laplace(MM_ARR, mode=mode1),
              sndi.laplace(MM_ARR, mode=mode2))
    assert_eq(sndi.gaussian_laplace(MM_ARR, 1, mode=mode1),
              sndi.gaussian_laplace(MM_ARR, 1, mode=mode2))
    assert_eq(sndi.maximum_filter(MM_ARR, size=5, mode=mode1),
              sndi.maximum_filter(MM_ARR, size=5, mode=mode2))
    assert_eq(sndi.minimum_filter(MM_ARR, size=5, mode=mode1),
              sndi.minimum_filter(MM_ARR, size=5, mode=mode2))
    assert_eq(sndi.gaussian_gradient_magnitude(MM_ARR, 1, mode=mode1),
              sndi.gaussian_gradient_magnitude(MM_ARR, 1, mode=mode2))
    assert_eq(sndi.uniform_filter(MM_ARR, 5, mode=mode1),
              sndi.uniform_filter(MM_ARR, 5, mode=mode2))


def test_multiple_modes_sequentially():
    modes = ["reflect", "wrap"]
    expected = sndi.gaussian_filter1d(MM_ARR, 1, axis=0, mode=modes[0])
    expected = sndi.gaussian_filter1d(expected, 1, axis=1, mode=modes[1])
    assert_eq(expected, sndi.gaussian_filter(MM_ARR, 1, mode=modes))

    expected = sndi.uniform_filter1d(MM_ARR, 5, axis=0, mode=modes[0])
    expected = sndi.uniform_filter1d(expected, 5, axis=1, mode=modes[1])
    assert_eq(expected, sndi.uniform_filter(MM_ARR, 5, mode=modes))

    expected = sndi.maximum_filter1d(MM_ARR, size=5, axis=0, mode=modes[0])
    expected = sndi.maximum_filter1d(expected, size=5, axis=1,
                                     mode=modes[1])
    assert_eq(expected, sndi.maximum_filter(MM_ARR, size=5, mode=modes))

    expected = sndi.minimum_filter1d(MM_ARR, size=5, axis=0, mode=modes[0])
    expected = sndi.minimum_filter1d(expected, size=5, axis=1,
                                     mode=modes[1])
    assert_eq(expected, sndi.minimum_filter(MM_ARR, size=5, mode=modes))


def test_multiple_modes_prewitt():
    expected = [[1.0, -3.0, 2.0], [1.0, -2.0, 1.0], [1.0, -1.0, 0.0]]
    assert_eq(sndi.prewitt(MM_ARR, mode=["reflect", "wrap"]), expected)


def test_multiple_modes_sobel():
    expected = [[1.0, -4.0, 3.0], [2.0, -3.0, 1.0], [1.0, -1.0, 0.0]]
    assert_eq(sndi.sobel(MM_ARR, mode=["reflect", "wrap"]), expected)


def test_multiple_modes_laplace():
    expected = [[-2.0, 2.0, 1.0], [-2.0, -3.0, 2.0], [1.0, 1.0, 0.0]]
    assert_eq(sndi.laplace(MM_ARR, mode=["reflect", "wrap"]), expected)


def test_multiple_modes_gaussian_laplace():
    expected = [
        [-0.28438687, 0.01559809, 0.19773499],
        [-0.36630503, -0.20069774, 0.07483620],
        [0.15849176, 0.18495566, 0.21934094],
    ]
    assert_almost(
        sndi.gaussian_laplace(MM_ARR, 1, mode=["reflect", "wrap"]),
        expected,
    )


def test_multiple_modes_gaussian_gradient_magnitude():
    expected = [
        [0.04928965, 0.09745625, 0.06405368],
        [0.23056905, 0.14025305, 0.04550846],
        [0.19894369, 0.14950060, 0.06796850],
    ]
    assert_almost(
        sndi.gaussian_gradient_magnitude(
            MM_ARR, 1, mode=["reflect", "wrap"]
        ),
        expected,
    )


def test_multiple_modes_uniform():
    expected = [[0.32, 0.40, 0.48], [0.20, 0.28, 0.32],
                [0.28, 0.32, 0.40]]
    assert_almost(
        sndi.uniform_filter(MM_ARR, 5, mode=["reflect", "wrap"]), expected
    )


def test_gaussian_truncate():
    arr = np.zeros((100, 100), float)
    arr[50, 50] = 1
    arr = jnp.asarray(arr)
    num_nonzeros_2 = int(
        (sndi.gaussian_filter(arr, 5, truncate=2) > 0).sum()
    )
    assert num_nonzeros_2 == 21 ** 2
    num_nonzeros_5 = int(
        (sndi.gaussian_filter(arr, 5, truncate=5) > 0).sum()
    )
    assert num_nonzeros_5 == 51 ** 2

    f = np.asarray(sndi.gaussian_filter(arr, [0.5, 2.5], truncate=3.5))
    fpos = f > 0
    assert fpos.any(axis=0).sum() == 19
    assert fpos.any(axis=1).sum() == 5

    x = np.zeros(51)
    x[25] = 1
    x = jnp.asarray(x)
    f = np.asarray(sndi.gaussian_filter1d(x, sigma=2, truncate=3.5))
    assert (f > 0).sum() == 15

    y = np.asarray(sndi.gaussian_laplace(x, sigma=2, truncate=3.5))
    nz = np.nonzero(y != 0)[0]
    assert np.ptp(nz) + 1 == 15

    y = np.asarray(
        sndi.gaussian_gradient_magnitude(x, sigma=2, truncate=3.5)
    )
    nz = np.nonzero(y != 0)[0]
    assert np.ptp(nz) + 1 == 15


def test_minmaximum_filter1d():
    in_ = jnp.arange(10)
    assert_eq(sndi.minimum_filter1d(in_, 1), in_)
    assert_eq(sndi.maximum_filter1d(in_, 1), in_)
    assert_eq(sndi.minimum_filter1d(in_, 5, mode="reflect"),
              [0, 0, 0, 1, 2, 3, 4, 5, 6, 7])
    assert_eq(sndi.maximum_filter1d(in_, 5, mode="reflect"),
              [2, 3, 4, 5, 6, 7, 8, 9, 9, 9])
    assert_eq(sndi.minimum_filter1d(in_, 5, mode="constant", cval=-1),
              [-1, -1, 0, 1, 2, 3, 4, 5, -1, -1])
    assert_eq(sndi.maximum_filter1d(in_, 5, mode="constant", cval=10),
              [10, 10, 4, 5, 6, 7, 8, 9, 10, 10])
    assert_eq(sndi.minimum_filter1d(in_, 5, mode="nearest"),
              [0, 0, 0, 1, 2, 3, 4, 5, 6, 7])
    assert_eq(sndi.maximum_filter1d(in_, 5, mode="nearest"),
              [2, 3, 4, 5, 6, 7, 8, 9, 9, 9])
    assert_eq(sndi.minimum_filter1d(in_, 5, mode="wrap"),
              [0, 0, 0, 1, 2, 3, 4, 5, 0, 0])
    assert_eq(sndi.maximum_filter1d(in_, 5, mode="wrap"),
              [9, 9, 4, 5, 6, 7, 8, 9, 9, 9])


def test_uniform_filter1d_roundoff_errors():
    # gh-6930 (xfail in the reference: integer rounding bug; we match
    # scipy exactly so it passes here)
    import scipy.ndimage as scipy_ndi

    in_np = np.repeat([0, 1, 0], [9, 9, 9])
    for filter_size in range(3, 10):
        out = sndi.uniform_filter1d(jnp.asarray(in_np), filter_size)
        exp = scipy_ndi.uniform_filter1d(in_np, filter_size)
        assert_eq(out, exp)


def test_footprint_all_zeros():
    arr = jnp.asarray(
        np.random.RandomState(0).randint(0, 100, (100, 100))
    )
    kernel = np.zeros((3, 3), bool)
    with pytest.raises((ValueError, RuntimeError)):
        sndi.maximum_filter(arr, footprint=kernel)


def test_rank_filter_noninteger_rank():
    arr = jnp.asarray(np.random.RandomState(1).random((10, 20, 30)))
    with pytest.raises(TypeError):
        sndi.rank_filter(arr, 0.5, footprint=np.ones((1, 1, 10), bool))


def test_size_footprint_both_set():
    arr = jnp.asarray(np.random.RandomState(2).random((10, 20, 30)))
    with pytest.warns(UserWarning):
        sndi.rank_filter(arr, 5, size=2,
                         footprint=np.ones((1, 1, 10), bool))


class TestThreading:
    """Concurrent tracing/dispatch smoke tests (the reference checks its
    per-device CUDA kernel cache; ours checks the jit cache)."""

    def _run(self, n, fun, args):
        outs_serial = [np.asarray(fun(*args)) for _ in range(n)]
        outs_threaded = [None] * n

        def work(i):
            outs_threaded[i] = np.asarray(fun(*args))

        threads = [
            threading.Thread(target=work, args=(i,)) for i in range(n)
        ]
        [t.start() for t in threads]
        [t.join() for t in threads]
        for a, b in zip(outs_serial, outs_threaded):
            assert_eq(a, b)

    def test_correlate1d(self):
        d = jnp.asarray(np.random.RandomState(3).randn(5000))
        self._run(4, sndi.correlate1d, (d, jnp.arange(5.0)))

    def test_correlate(self):
        d = jnp.asarray(np.random.RandomState(4).randn(100, 100))
        k = jnp.asarray(np.random.RandomState(5).randn(10, 10))
        self._run(4, sndi.correlate, (d, k))

    def test_minmax_filter(self):
        d = jnp.asarray(np.random.RandomState(6).randn(100, 100))
        self._run(4, sndi.maximum_filter, (d, 3))
        self._run(4, sndi.minimum_filter, (d, 3))
