"""Port of the reference scipy.interpolate suite
(cupyimg/scipy/interpolate/tests/test_interpolate.py) onto jnp +
cupyimg_tpu: RegularGridInterpolator and interpn vs hard-coded values
and scipy's qhull-based ND interpolators."""

import itertools

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_equal
from pytest import raises as assert_raises

from scipy.interpolate import LinearNDInterpolator, NearestNDInterpolator

from cupyimg_tpu.scipy.interpolate import RegularGridInterpolator, interpn

assert_allclose = np.testing.assert_allclose
assert_array_almost_equal = np.testing.assert_array_almost_equal


class TestRegularGridInterpolator:
    def _get_sample_4d(self, xp=jnp):
        # create a 4-D grid of 3 points in each dimension
        points = [(0.0, 0.5, 1.0)] * 4
        values = xp.asarray([0.0, 0.5, 1.0])
        values0 = values[:, xp.newaxis, xp.newaxis, xp.newaxis]
        values1 = values[xp.newaxis, :, xp.newaxis, xp.newaxis]
        values2 = values[xp.newaxis, xp.newaxis, :, xp.newaxis]
        values3 = values[xp.newaxis, xp.newaxis, xp.newaxis, :]
        values = values0 + values1 * 10 + values2 * 100 + values3 * 1000
        return points, values

    def _get_sample_4d_2(self):
        # another 4-D grid of 3 points in each dimension
        points = [(0.0, 0.5, 1.0)] * 2 + [(0.0, 5.0, 10.0)] * 2
        values = jnp.asarray([0.0, 0.5, 1.0])
        values0 = values[:, jnp.newaxis, jnp.newaxis, jnp.newaxis]
        values1 = values[jnp.newaxis, :, jnp.newaxis, jnp.newaxis]
        values2 = values[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
        values3 = values[jnp.newaxis, jnp.newaxis, jnp.newaxis, :]
        values = values0 + values1 * 10 + values2 * 100 + values3 * 1000
        return points, values

    def test_list_input(self):
        points, values = self._get_sample_4d()

        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )

        for method in ["linear", "nearest"]:
            interp = RegularGridInterpolator(
                points, np.asarray(values).tolist(), method=method
            )
            v1 = interp(np.asarray(sample).tolist())
            interp = RegularGridInterpolator(points, values, method=method)
            v2 = interp(sample)
            assert_allclose(v1, v2)

    def test_complex(self):
        points, values = self._get_sample_4d()
        values = values - 2j * values
        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )

        for method in ["linear", "nearest"]:
            interp = RegularGridInterpolator(points, values, method=method)
            rinterp = RegularGridInterpolator(
                points, values.real, method=method
            )
            iinterp = RegularGridInterpolator(
                points, values.imag, method=method
            )

            v1 = interp(sample)
            v2 = rinterp(sample) + 1j * iinterp(sample)
            assert_allclose(v1, v2)

    def test_linear_xi1d(self):
        points, values = self._get_sample_4d_2()
        interp = RegularGridInterpolator(points, values)
        sample = jnp.asarray([0.1, 0.1, 10.0, 9.0])
        wanted = 1001.1
        assert_array_almost_equal(interp(sample), wanted)

    def test_linear_xi3d(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values)
        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )
        wanted = np.asarray([1001.1, 846.2, 555.5])
        assert_array_almost_equal(interp(sample), wanted)

    def test_nearest(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values, method="nearest")
        for sample, wanted in [
            ([0.1, 0.1, 0.9, 0.9], 1100.0),
            ([0.1, 0.1, 0.1, 0.1], 0.0),
            ([0.0, 0.0, 0.0, 0.0], 0.0),
            ([1.0, 1.0, 1.0, 1.0], 1111.0),
            ([0.1, 0.4, 0.6, 0.9], 1055.0),
        ]:
            assert_array_almost_equal(
                interp(jnp.asarray(sample)), wanted
            )

    def test_linear_edges(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values)
        sample = jnp.asarray(
            [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
        )
        wanted = np.asarray([0.0, 1111.0])
        assert_array_almost_equal(interp(sample), wanted)

    def test_valid_create(self):
        # create a 2-D grid of 3 points in each dimension
        points = [(0.0, 0.5, 1.0), (0.0, 1.0, 0.5)]
        values = jnp.asarray([0.0, 0.5, 1.0])
        values0 = values[:, jnp.newaxis]
        values1 = values[jnp.newaxis, :]
        values = values0 + values1 * 10
        assert_raises(
            ValueError, RegularGridInterpolator, points, values
        )
        points = [((0.0, 0.5, 1.0),), (0.0, 0.5, 1.0)]
        assert_raises(
            ValueError, RegularGridInterpolator, points, values
        )
        points = [(0.0, 0.5, 0.75, 1.0), (0.0, 0.5, 1.0)]
        assert_raises(
            ValueError, RegularGridInterpolator, points, values
        )
        points = [(0.0, 0.5, 1.0), (0.0, 0.5, 1.0), (0.0, 0.5, 1.0)]
        assert_raises(
            ValueError, RegularGridInterpolator, points, values
        )
        points = [(0.0, 0.5, 1.0), (0.0, 0.5, 1.0)]
        assert_raises(
            ValueError,
            RegularGridInterpolator,
            points,
            values,
            method="undefmethod",
        )

    def test_valid_call(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values)
        sample = jnp.asarray(
            [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
        )
        assert_raises(ValueError, interp, sample, "undefmethod")
        sample = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        assert_raises(ValueError, interp, sample)
        sample = jnp.asarray(
            [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.1]]
        )
        assert_raises(ValueError, interp, sample)

    def test_out_of_bounds_extrap(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(
            points, values, bounds_error=False, fill_value=None
        )
        sample = jnp.asarray(
            [
                [-0.1, -0.1, -0.1, -0.1],
                [1.1, 1.1, 1.1, 1.1],
                [21, 2.1, -1.1, -11],
                [2.1, 2.1, -1.1, -1.1],
            ]
        )
        wanted = np.asarray([0.0, 1111.0, 11.0, 11.0])
        assert_array_almost_equal(
            interp(sample, method="nearest"), wanted
        )
        wanted = np.asarray([-111.1, 1222.1, -11068.0, -1186.9])
        assert_array_almost_equal(
            interp(sample, method="linear"), wanted
        )

    def test_out_of_bounds_extrap2(self):
        points, values = self._get_sample_4d_2()
        interp = RegularGridInterpolator(
            points, values, bounds_error=False, fill_value=None
        )
        sample = jnp.asarray(
            [
                [-0.1, -0.1, -0.1, -0.1],
                [1.1, 1.1, 1.1, 1.1],
                [21, 2.1, -1.1, -11],
                [2.1, 2.1, -1.1, -1.1],
            ]
        )
        wanted = np.asarray([0.0, 11.0, 11.0, 11.0])
        assert_array_almost_equal(
            interp(sample, method="nearest"), wanted
        )
        wanted = np.asarray([-12.1, 133.1, -1069.0, -97.9])
        assert_array_almost_equal(
            interp(sample, method="linear"), wanted
        )

    def test_out_of_bounds_fill(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(
            points, values, bounds_error=False, fill_value=np.nan
        )
        sample = jnp.asarray(
            [
                [-0.1, -0.1, -0.1, -0.1],
                [1.1, 1.1, 1.1, 1.1],
                [2.1, 2.1, -1.1, -1.1],
            ]
        )
        wanted = np.asarray([np.nan, np.nan, np.nan])
        assert_array_almost_equal(
            interp(sample, method="nearest"), wanted
        )
        assert_array_almost_equal(
            interp(sample, method="linear"), wanted
        )
        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )
        wanted = np.asarray([1001.1, 846.2, 555.5])
        assert_array_almost_equal(interp(sample), wanted)

    def test_nearest_compare_qhull(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values, method="nearest")

        points_cpu, values_cpu = self._get_sample_4d(xp=np)
        points_qhull = itertools.product(*points_cpu)
        points_qhull = [p for p in points_qhull]
        points_qhull = np.asarray(points_qhull)
        values_qhull = values_cpu.reshape(-1)
        interp_qhull = NearestNDInterpolator(points_qhull, values_qhull)
        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )
        assert_array_almost_equal(
            interp(sample), interp_qhull(np.asarray(sample))
        )

    def test_linear_compare_qhull(self):
        points, values = self._get_sample_4d()
        interp = RegularGridInterpolator(points, values)

        points_cpu, values_cpu = self._get_sample_4d(xp=np)
        points_qhull = itertools.product(*points_cpu)
        points_qhull = [p for p in points_qhull]
        points_qhull = np.asarray(points_qhull)
        values_qhull = values_cpu.reshape(-1)
        interp_qhull = LinearNDInterpolator(points_qhull, values_qhull)
        sample = jnp.asarray(
            [
                [0.1, 0.1, 1.0, 0.9],
                [0.2, 0.1, 0.45, 0.8],
                [0.5, 0.5, 0.5, 0.5],
            ]
        )
        assert_array_almost_equal(
            interp(sample), interp_qhull(np.asarray(sample))
        )

    def test_invalid_fill_value(self):
        rng = np.random.RandomState(1234)
        x = jnp.linspace(0, 2, 5)
        y = jnp.linspace(0, 1, 7)
        values = jnp.asarray(rng.rand(5, 7))

        # integers can be cast to floats
        RegularGridInterpolator((x, y), values, fill_value=1)

        # complex values cannot
        assert_raises(
            ValueError,
            RegularGridInterpolator,
            (x, y),
            values,
            fill_value=1 + 2j,
        )

    def test_fillvalue_type(self):
        # test that interpolator object construction succeeds
        values = jnp.ones((10, 20, 30), dtype=jnp.float32)
        points = [jnp.arange(n) for n in values.shape]
        RegularGridInterpolator(points, values)
        RegularGridInterpolator(points, values, fill_value=0.0)


class TestInterpN:
    def _sample_2d_data(self):
        x = jnp.array([0.5, 2.0, 3.0, 4.0, 5.5])
        y = jnp.array([0.5, 2.0, 3.0, 4.0, 5.5])
        z = jnp.array(
            [
                [1, 2, 1, 2, 1],
                [1, 2, 1, 2, 1],
                [1, 2, 3, 2, 1],
                [1, 2, 2, 2, 1],
                [1, 2, 1, 2, 1],
            ]
        )
        return x, y, z

    def _sample_4d_data(self):
        points = [(0.0, 0.5, 1.0)] * 2 + [(0.0, 5.0, 10.0)] * 2
        values = jnp.asarray([0.0, 0.5, 1.0])
        values0 = values[:, jnp.newaxis, jnp.newaxis, jnp.newaxis]
        values1 = values[jnp.newaxis, :, jnp.newaxis, jnp.newaxis]
        values2 = values[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
        values3 = values[jnp.newaxis, jnp.newaxis, jnp.newaxis, :]
        values = values0 + values1 * 10 + values2 * 100 + values3 * 1000
        return points, values

    def test_list_input(self):
        x, y, z = self._sample_2d_data()
        xi = jnp.asarray(
            [
                [1, 2.3, 5.3, 0.5, 3.3, 1.2, 3],
                [1, 3.3, 1.2, 4.0, 5.0, 1.0, 3],
            ]
        ).T

        for method in ["nearest", "linear"]:
            v1 = interpn((x, y), z, xi, method=method)
            v2 = interpn(
                (np.asarray(x).tolist(), np.asarray(y).tolist()),
                np.asarray(z).tolist(),
                np.asarray(xi).tolist(),
                method=method,
            )
            assert_allclose(v1, v2, err_msg=method)

    def test_linear_4d(self):
        points, values = self._sample_4d_data()
        interp_rg = RegularGridInterpolator(points, values)
        sample = jnp.asarray([[0.1, 0.1, 10.0, 9.0]])
        wanted = interpn(points, values, sample, method="linear")
        assert_array_almost_equal(interp_rg(sample), wanted)

    def test_4d_linear_outofbounds(self):
        points, values = self._sample_4d_data()
        sample = jnp.asarray([[0.1, -0.1, 10.1, 9.0]])
        wanted = 999.99
        actual = interpn(
            points,
            values,
            sample,
            method="linear",
            bounds_error=False,
            fill_value=999.99,
        )
        assert_array_almost_equal(actual, wanted)

    def test_nearest_4d(self):
        points, values = self._sample_4d_data()
        interp_rg = RegularGridInterpolator(
            points, values, method="nearest"
        )
        sample = jnp.asarray([[0.1, 0.1, 10.0, 9.0]])
        wanted = interpn(points, values, sample, method="nearest")
        assert_array_almost_equal(interp_rg(sample), wanted)

    def test_4d_nearest_outofbounds(self):
        points, values = self._sample_4d_data()
        sample = jnp.asarray([[0.1, -0.1, 10.1, 9.0]])
        wanted = 999.99
        actual = interpn(
            points,
            values,
            sample,
            method="nearest",
            bounds_error=False,
            fill_value=999.99,
        )
        assert_array_almost_equal(actual, wanted)

    def test_xi_1d(self):
        points, values = self._sample_4d_data()
        sample = jnp.asarray([0.1, 0.1, 10.0, 9.0])
        v1 = interpn(points, values, sample, bounds_error=False)
        v2 = interpn(
            points, values, sample[None, :], bounds_error=False
        )
        assert_allclose(v1, v2)

    def test_xi_nd(self):
        points, values = self._sample_4d_data()

        np.random.seed(1234)
        sample = jnp.asarray(np.random.rand(2, 3, 4))

        v1 = interpn(
            points, values, sample, method="nearest", bounds_error=False
        )
        assert_equal(v1.shape, (2, 3))

        v2 = interpn(
            points,
            values,
            sample.reshape(-1, 4),
            method="nearest",
            bounds_error=False,
        )
        assert_allclose(v1, v2.reshape(v1.shape))

    def test_xi_broadcast(self):
        x, y, values = self._sample_2d_data()
        points = (x, y)

        xi = jnp.linspace(0, 1, 2)
        yi = jnp.linspace(0, 3, 3)

        for method in ["nearest", "linear"]:
            sample = (xi[:, None], yi[None, :])
            v1 = interpn(
                points, values, sample, method=method, bounds_error=False
            )
            assert_equal(v1.shape, (2, 3))

            xx, yy = np.meshgrid(np.asarray(xi), np.asarray(yi))
            sample = jnp.asarray(
                np.c_[xx.T.ravel(), yy.T.ravel()]
            )

            v2 = interpn(
                points, values, sample, method=method, bounds_error=False
            )
            assert_allclose(v1, v2.reshape(v1.shape))

    def test_nonscalar_values(self):
        points, values = self._sample_4d_data()

        np.random.seed(1234)
        values = jnp.asarray(np.random.rand(3, 3, 3, 3, 6))
        sample = jnp.asarray(np.random.rand(7, 11, 4))

        for method in ["nearest", "linear"]:
            v = interpn(
                points, values, sample, method=method, bounds_error=False
            )
            assert_equal(v.shape, (7, 11, 6), err_msg=method)

            vs = [
                interpn(
                    points,
                    values[..., j],
                    sample,
                    method=method,
                    bounds_error=False,
                )
                for j in range(6)
            ]
            v2 = jnp.asarray(vs).transpose(1, 2, 0)

            assert_allclose(v, v2, err_msg=method)

    def test_complex(self):
        x, y, values = self._sample_2d_data()
        points = (x, y)
        values = values - 2j * values

        sample = jnp.asarray(
            [
                [1, 2.3, 5.3, 0.5, 3.3, 1.2, 3],
                [1, 3.3, 1.2, 4.0, 5.0, 1.0, 3],
            ]
        ).T

        for method in ["linear", "nearest"]:
            v1 = interpn(points, values, sample, method=method)
            v2r = interpn(points, values.real, sample, method=method)
            v2i = interpn(points, values.imag, sample, method=method)
            v2 = v2r + 1j * v2i
            assert_allclose(v1, v2)
