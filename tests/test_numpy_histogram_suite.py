"""numpy histogram family suite.

Ported from the reference
/root/reference/cupyimg/numpy/lib/tests/test_histogram_from_cupy.py
(shaped_arange inputs, dtype products, weight/density/range/edge-case
expectations).  Oracle = numpy.histogram run on identical inputs.
"""

import numpy as np
import pytest

import cupyimg_tpu.numpy as tnp

_ALL_DTYPES = [
    np.float16, np.float32, np.float64,
    np.int8, np.int16, np.int32, np.int64,
    np.uint8, np.uint16, np.uint32,
]
_FLOAT_DTYPES = [np.float16, np.float32, np.float64]
_INT_DTYPES = [np.int8, np.int16, np.int32, np.int64,
               np.uint8, np.uint16, np.uint32]
_COMPLEX_DTYPES = [np.complex64, np.complex128]


def shaped_arange(shape, dtype):
    n = int(np.prod(shape))
    return (np.arange(1, n + 1).reshape(shape)).astype(dtype)


def check_pair(t_out, n_out, **kw):
    t_out = [np.asarray(v) for v in t_out]
    assert len(t_out) == len(n_out)
    for t, n in zip(t_out, n_out):
        np.testing.assert_allclose(t, n, **kw)


class TestHistogram:
    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram(self, dtype):
        x = shaped_arange((10,), dtype)
        check_pair(tnp.histogram(x), np.histogram(x))

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_same_value(self, dtype):
        x = np.zeros(10, dtype)
        check_pair(tnp.histogram(x, 3), np.histogram(x, 3))

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_density(self, dtype):
        x = shaped_arange((10,), dtype)
        y, bin_edges = tnp.histogram(x, density=True)
        area = float(np.sum(np.asarray(y) * np.diff(np.asarray(bin_edges))))
        np.testing.assert_allclose(area, 1)
        check_pair((y, bin_edges), np.histogram(x, density=True), rtol=1e-6)

    @pytest.mark.parametrize("dtype", _FLOAT_DTYPES)
    def test_histogram_range_lower_outliers(self, dtype):
        a = np.arange(10, dtype=dtype) + 0.5
        h, b = tnp.histogram(a, range=[0, 9])
        assert int(np.asarray(h).sum()) == 9
        check_pair((h, b), np.histogram(a, range=[0, 9]))

    @pytest.mark.parametrize("dtype", _FLOAT_DTYPES)
    def test_histogram_range_upper_outliers(self, dtype):
        a = np.arange(10, dtype=dtype) + 0.5
        h, b = tnp.histogram(a, range=[1, 10])
        assert int(np.asarray(h).sum()) == 9
        check_pair((h, b), np.histogram(a, range=[1, 10]))

    @pytest.mark.parametrize("dtype", _FLOAT_DTYPES)
    def test_histogram_range_with_density(self, dtype):
        a = np.arange(10, dtype=dtype) + 0.5
        h, b = tnp.histogram(a, range=[1, 9], density=True)
        np.testing.assert_allclose(
            float((np.asarray(h) * np.diff(np.asarray(b))).sum()), 1
        )
        np.testing.assert_allclose(
            np.asarray(h),
            np.histogram(a, range=[1, 9], density=True)[0],
            rtol=1e-6,
        )

    @pytest.mark.parametrize("dtype", _FLOAT_DTYPES)
    def test_histogram_range_with_weights_and_density(self, dtype):
        a = np.arange(10, dtype=dtype) + 0.5
        w = np.arange(10, dtype=dtype) + 0.5
        h, b = tnp.histogram(a, range=[1, 9], weights=w, density=True)
        np.testing.assert_allclose(
            float((np.asarray(h) * np.diff(np.asarray(b))).sum()), 1
        )
        np.testing.assert_allclose(
            np.asarray(h),
            np.histogram(a, range=[1, 9], weights=w, density=True)[0],
            rtol=2e-3 if dtype == np.float16 else 1e-6,
        )

    def test_histogram_invalid_range(self):
        # range must be None or have two elements
        with pytest.raises(ValueError):
            tnp.histogram(np.arange(10), range=[1, 9, 15])

    def test_histogram_invalid_range2(self):
        with pytest.raises(TypeError):
            tnp.histogram(np.arange(10), range=10)

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_weights_mismatch(self, dtype):
        a = np.arange(10, dtype=dtype) + 0.5
        w = np.arange(11, dtype=dtype) + 0.5
        with pytest.raises(ValueError):
            tnp.histogram(a, range=[1, 9], weights=w, density=True)

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_int_weights_dtype(self, dtype):
        # Check the type of the returned histogram
        a = np.arange(10, dtype=dtype)
        h, b = tnp.histogram(a, weights=np.ones(10, int))
        assert np.issubdtype(np.asarray(h).dtype, np.integer)
        np.testing.assert_allclose(
            np.asarray(h), np.histogram(a, weights=np.ones(10, int))[0]
        )

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_float_weights_dtype(self, dtype):
        a = np.arange(10, dtype=dtype)
        h, b = tnp.histogram(a, weights=np.ones(10, float))
        assert np.issubdtype(np.asarray(h).dtype, np.floating)
        np.testing.assert_allclose(
            np.asarray(h), np.histogram(a, weights=np.ones(10, float))[0]
        )

    def test_histogram_weights_basic(self):
        rng = np.random.RandomState(5)
        v = rng.rand(100)
        w = np.ones(100) * 5
        a, b = tnp.histogram(v)
        na, nb = tnp.histogram(v, density=True)
        wa, wb = tnp.histogram(v, weights=w)
        nwa, nwb = tnp.histogram(v, weights=w, density=True)
        np.testing.assert_array_almost_equal(np.asarray(a) * 5, np.asarray(wa))
        np.testing.assert_array_almost_equal(np.asarray(na), np.asarray(nwa))

    @pytest.mark.parametrize("dtype", _FLOAT_DTYPES)
    def test_histogram_float_weights(self, dtype):
        # Check weights are properly applied.
        v = np.linspace(0, 10, 10, dtype=dtype)
        w = np.concatenate((np.zeros(5, dtype=dtype), np.ones(5, dtype=dtype)))
        wa, wb = tnp.histogram(v, bins=np.arange(11), weights=w)
        np.testing.assert_array_almost_equal(np.asarray(wa), w)
        np.testing.assert_allclose(
            np.asarray(wb), np.histogram(v, bins=np.arange(11), weights=w)[1]
        )

    @pytest.mark.parametrize("dtype", _INT_DTYPES)
    def test_histogram_int_weights(self, dtype):
        # Check with integer weights
        v = np.asarray([1, 2, 2, 4], dtype=dtype)
        w = np.asarray([4, 3, 2, 1], dtype=dtype)
        wa, wb = tnp.histogram(v, bins=4, weights=w)
        np.testing.assert_array_equal(np.asarray(wa), [4, 5, 0, 1])
        check_pair((wa, wb), np.histogram(v, bins=4, weights=w))

    @pytest.mark.parametrize("dtype", _INT_DTYPES)
    def test_histogram_int_weights_normalized(self, dtype):
        v = np.asarray([1, 2, 2, 4], dtype=dtype)
        w = np.asarray([4, 3, 2, 1], dtype=dtype)
        wa, wb = tnp.histogram(v, bins=4, weights=w, density=True)
        np.testing.assert_array_almost_equal(
            np.asarray(wa), np.asarray([4, 5, 0, 1]) / 10.0 / 3.0 * 4
        )
        np.testing.assert_allclose(
            np.asarray(wb), np.histogram(v, bins=4, weights=w, density=True)[1]
        )

    @pytest.mark.parametrize("dtype", _INT_DTYPES)
    def test_histogram_int_weights_nonuniform_bins(self, dtype):
        # Check weights with non-uniform bin widths
        a, b = tnp.histogram(
            np.arange(9, dtype=dtype),
            np.asarray([0, 1, 3, 6, 10], dtype=dtype),
            weights=np.asarray([2, 1, 1, 1, 1, 1, 1, 1, 1], dtype=dtype),
            density=True,
        )
        np.testing.assert_array_almost_equal(
            np.asarray(a), [0.2, 0.1, 0.1, 0.075]
        )

    @pytest.mark.parametrize("dtype", _COMPLEX_DTYPES)
    def test_histogram_complex_weights(self, dtype):
        values = np.asarray([1.3, 2.5, 2.3])
        weights = np.asarray([1, -1, 2]) + 1j * np.asarray([2, 1, 2])
        weights = weights.astype(dtype)
        a, b = tnp.histogram(values, bins=2, weights=weights)
        check_pair((a, b), np.histogram(values, bins=2, weights=weights),
                   rtol=1e-6)

    @pytest.mark.parametrize("dtype", _COMPLEX_DTYPES)
    def test_histogram_complex_weights_uneven_bins(self, dtype):
        values = np.asarray([1.3, 2.5, 2.3])
        weights = np.asarray([1, -1, 2]) + 1j * np.asarray([2, 1, 2])
        weights = weights.astype(dtype)
        a, b = tnp.histogram(
            values, bins=np.asarray([0, 2, 3]), weights=weights
        )
        check_pair(
            (a, b),
            np.histogram(values, bins=np.asarray([0, 2, 3]), weights=weights),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_empty(self, dtype):
        x = np.array([], dtype)
        check_pair(tnp.histogram(x), np.histogram(x))

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_int_bins(self, dtype):
        x = shaped_arange((10,), dtype)
        check_pair(tnp.histogram(x, 4), np.histogram(x, 4))

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_array_bins(self, dtype):
        x = shaped_arange((10,), dtype)
        bins = shaped_arange((3,), dtype)
        check_pair(tnp.histogram(x, bins), np.histogram(x, bins))

    @pytest.mark.parametrize("dtype", _ALL_DTYPES)
    def test_histogram_bins_not_ordered(self, dtype):
        x = shaped_arange((10,), dtype)
        bins = np.array([1, 3, 2], dtype)
        with pytest.raises(ValueError):
            tnp.histogram(x, bins)


class TestHistogramdd:
    def test_histogramdd_basic(self):
        rng = np.random.RandomState(3)
        x = rng.rand(100, 3)
        h, e = tnp.histogramdd(x, bins=4)
        nh, ne = np.histogramdd(x, bins=4)
        np.testing.assert_allclose(np.asarray(h), nh)
        for a, b in zip(e, ne):
            np.testing.assert_allclose(np.asarray(a), b)

    def test_histogramdd_weights_density(self):
        rng = np.random.RandomState(4)
        x = rng.rand(200, 2)
        w = rng.rand(200)
        h, e = tnp.histogramdd(x, bins=(3, 5), weights=w, density=True)
        nh, ne = np.histogramdd(x, bins=(3, 5), weights=w, density=True)
        np.testing.assert_allclose(np.asarray(h), nh, rtol=1e-10)

    def test_histogramdd_range(self):
        rng = np.random.RandomState(5)
        x = rng.rand(100, 2) * 4 - 1
        rngs = [(0, 2), (-1, 3)]
        h, e = tnp.histogramdd(x, bins=4, range=rngs)
        nh, ne = np.histogramdd(x, bins=4, range=rngs)
        np.testing.assert_allclose(np.asarray(h), nh)

    def test_histogramdd_sequence_input(self):
        rng = np.random.RandomState(6)
        xs = [rng.rand(50), rng.rand(50)]
        h, e = tnp.histogramdd(xs, bins=5)
        nh, ne = np.histogramdd(xs, bins=5)
        np.testing.assert_allclose(np.asarray(h), nh)

    def test_histogramdd_dim_mismatch(self):
        with pytest.raises(ValueError):
            tnp.histogramdd(np.random.rand(10, 2), bins=[3, 4, 5])


class TestHistogram2d:
    def test_histogram2d_basic(self):
        rng = np.random.RandomState(7)
        x, y = rng.rand(100), rng.rand(100)
        h, ex, ey = tnp.histogram2d(x, y, bins=6)
        nh, nex, ney = np.histogram2d(x, y, bins=6)
        np.testing.assert_allclose(np.asarray(h), nh)
        np.testing.assert_allclose(np.asarray(ex), nex)
        np.testing.assert_allclose(np.asarray(ey), ney)

    def test_histogram2d_weights(self):
        rng = np.random.RandomState(8)
        x, y = rng.rand(100), rng.rand(100)
        w = rng.rand(100)
        h, ex, ey = tnp.histogram2d(x, y, bins=(4, 5), weights=w)
        nh = np.histogram2d(x, y, bins=(4, 5), weights=w)[0]
        np.testing.assert_allclose(np.asarray(h), nh, rtol=1e-10)

    def test_histogram2d_shared_array_bins(self):
        rng = np.random.RandomState(9)
        x, y = rng.rand(100), rng.rand(100)
        bins = np.linspace(0, 1, 7)
        h, ex, ey = tnp.histogram2d(x, y, bins=bins)
        nh, nex, ney = np.histogram2d(x, y, bins=bins)
        np.testing.assert_allclose(np.asarray(h), nh)
        np.testing.assert_allclose(np.asarray(ex), nex)
        np.testing.assert_allclose(np.asarray(ey), ney)
