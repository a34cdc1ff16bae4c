"""gradient + stats.entropy suites.

Ported from the reference suites
/root/reference/cupyimg/numpy/lib/tests/test_function_base.py and
/root/reference/cupyimg/scipy/stats/tests/test_distributions.py.
Oracle = the hard-coded expectations from upstream numpy/scipy plus
numpy.gradient run on identical inputs.
"""

import numpy as np
import pytest
from numpy.testing import (
    assert_array_equal,
    assert_array_almost_equal,
    assert_almost_equal,
)
import jax.numpy as jnp

from cupyimg_tpu.numpy.lib import gradient
from cupyimg_tpu.scipy import stats


def _g(*args, **kw):
    out = gradient(*args, **kw)
    if isinstance(out, (list, tuple)):
        return [np.asarray(o) for o in out]
    return np.asarray(out)


class TestGradient:
    def test_basic(self):
        v = [[1, 1], [3, 4]]
        x = jnp.asarray(v)
        dx = [
            np.asarray([[2.0, 3.0], [2.0, 3.0]]),
            np.asarray([[0.0, 0.0], [1.0, 1.0]]),
        ]
        for g, d in zip(_g(x), dx):
            assert_array_equal(g, d)
        for g, d in zip(_g(v), dx):
            assert_array_equal(g, d)

    def test_args(self):
        dx = jnp.cumsum(jnp.ones(5))
        dx_uneven = [1.0, 2.0, 5.0, 9.0, 11.0]
        f_2d = jnp.arange(25).reshape(5, 5)

        # distances can be scalars or match gradient[axis]
        gradient(jnp.arange(5), 3.0)
        gradient(jnp.arange(5), jnp.array(3.0))
        gradient(jnp.arange(5), dx)
        gradient(f_2d, 1.5)
        gradient(f_2d, jnp.array(1.5))

        gradient(f_2d, dx_uneven, dx_uneven)
        gradient(f_2d, dx, 2)
        gradient(f_2d, dx, axis=1)

        with pytest.raises(ValueError, match=".*scalars or 1d"):
            gradient(f_2d, jnp.stack([dx] * 2, axis=-1), 1)

    def test_badargs(self):
        f_2d = jnp.arange(25).reshape(5, 5)
        x = jnp.cumsum(jnp.ones(5))

        # wrong sizes
        with pytest.raises(ValueError):
            gradient(f_2d, x, jnp.ones(2))
        with pytest.raises(ValueError):
            gradient(f_2d, 1, jnp.ones(2))
        with pytest.raises(ValueError):
            gradient(f_2d, jnp.ones(2), jnp.ones(2))
        # wrong number of arguments
        with pytest.raises(TypeError):
            gradient(f_2d, x)
        with pytest.raises(TypeError):
            gradient(f_2d, x, axis=(0, 1))
        with pytest.raises(TypeError):
            gradient(f_2d, x, x, x)
        with pytest.raises(TypeError):
            gradient(f_2d, 1, 1, 1)
        with pytest.raises(TypeError):
            gradient(f_2d, x, x, axis=1)
        with pytest.raises(TypeError):
            gradient(f_2d, 1, 1, axis=1)

    def test_second_order_accurate(self):
        x = jnp.linspace(0, 1, 10)
        dx = float(x[1] - x[0])
        y = 2 * x ** 3 + 4 * x ** 2 + 2 * x
        analytical = 6 * x ** 2 + 8 * x + 2
        num_error = np.abs(
            (_g(y, dx, edge_order=2) / np.asarray(analytical)) - 1
        )
        assert np.all(num_error < 0.03)

        rng = np.random.RandomState(0)
        x = np.sort(rng.random(10))
        y = 2 * x ** 3 + 4 * x ** 2 + 2 * x
        analytical = 6 * x ** 2 + 8 * x + 2
        num_error = np.abs(
            (_g(jnp.asarray(y), jnp.asarray(x), edge_order=2) / analytical)
            - 1
        )
        assert np.all(num_error < 0.03)

    def test_spacing(self):
        f = np.array([0, 2.0, 3.0, 4.0, 5.0, 5.0])
        f = np.tile(f, (6, 1)) + f.reshape(-1, 1)
        x_uneven = np.array([0.0, 0.5, 1.0, 3.0, 5.0, 7.0])
        x_even = np.arange(6.0)

        fdx_even_ord1 = np.tile([2.0, 1.5, 1.0, 1.0, 0.5, 0.0], (6, 1))
        fdx_even_ord2 = np.tile([2.5, 1.5, 1.0, 1.0, 0.5, -0.5], (6, 1))
        fdx_uneven_ord1 = np.tile([4.0, 3.0, 1.7, 0.5, 0.25, 0.0], (6, 1))
        fdx_uneven_ord2 = np.tile([5.0, 3.0, 1.7, 0.5, 0.25, -0.25], (6, 1))

        fj = jnp.asarray(f)
        # evenly spaced
        for edge_order, exp_res in [(1, fdx_even_ord1), (2, fdx_even_ord2)]:
            res1 = _g(fj, 1.0, axis=(0, 1), edge_order=edge_order)
            res2 = _g(
                fj, x_even, x_even, axis=(0, 1), edge_order=edge_order
            )
            res3 = _g(fj, x_even, x_even, axis=None, edge_order=edge_order)
            for g1, g2 in zip(res1, res2):
                assert_array_equal(g1, g2)
            for g1, g2 in zip(res2, res3):
                assert_array_equal(g1, g2)
            assert_array_almost_equal(res1[0], exp_res.T)
            assert_array_almost_equal(res1[1], exp_res)

            res1 = _g(fj, 1.0, axis=0, edge_order=edge_order)
            res2 = _g(fj, x_even, axis=0, edge_order=edge_order)
            assert res1.shape == res2.shape
            assert_array_almost_equal(res2, exp_res.T)

            res1 = _g(fj, 1.0, axis=1, edge_order=edge_order)
            res2 = _g(fj, x_even, axis=1, edge_order=edge_order)
            assert res1.shape == res2.shape
            assert_array_equal(res2, exp_res)

        # unevenly spaced
        for edge_order, exp_res in [
            (1, fdx_uneven_ord1),
            (2, fdx_uneven_ord2),
        ]:
            res1 = _g(
                fj, x_uneven, x_uneven, axis=(0, 1), edge_order=edge_order
            )
            res2 = _g(fj, x_uneven, x_uneven, axis=None,
                      edge_order=edge_order)
            for g1, g2 in zip(res1, res2):
                assert_array_equal(g1, g2)
            assert_array_almost_equal(res1[0], exp_res.T)
            assert_array_almost_equal(res1[1], exp_res)

            res1 = _g(fj, x_uneven, axis=0, edge_order=edge_order)
            assert_array_almost_equal(res1, exp_res.T)

            res1 = _g(fj, x_uneven, axis=1, edge_order=edge_order)
            assert_array_almost_equal(res1, exp_res)

        # mixed
        res1 = _g(fj, x_even, x_uneven, axis=(0, 1), edge_order=1)
        res2 = _g(fj, x_uneven, x_even, axis=(1, 0), edge_order=1)
        assert_array_equal(res1[0], res2[1])
        assert_array_equal(res1[1], res2[0])
        assert_array_almost_equal(res1[0], fdx_even_ord1.T)
        assert_array_almost_equal(res1[1], fdx_uneven_ord1)

        res1 = _g(fj, x_even, x_uneven, axis=(0, 1), edge_order=2)
        res2 = _g(fj, x_uneven, x_even, axis=(1, 0), edge_order=2)
        assert_array_equal(res1[0], res2[1])
        assert_array_equal(res1[1], res2[0])
        assert_array_almost_equal(res1[0], fdx_even_ord2.T)
        assert_array_almost_equal(res1[1], fdx_uneven_ord2)

    def test_specific_axes(self):
        v = [[1, 1], [3, 4]]
        x = jnp.array(v)
        dx = [
            np.array([[2.0, 3.0], [2.0, 3.0]]),
            np.array([[0.0, 0.0], [1.0, 1.0]]),
        ]
        assert_array_equal(_g(x, axis=0), dx[0])
        assert_array_equal(_g(x, axis=1), dx[1])
        assert_array_equal(_g(x, axis=-1), dx[1])
        for g, d in zip(_g(x, axis=(1, 0)), [dx[1], dx[0]]):
            assert_array_equal(g, d)
        for g, d in zip(_g(x, axis=None), [dx[0], dx[1]]):
            assert_array_equal(g, d)

        for g1, g2 in zip(_g(x, axis=None), _g(x)):
            assert_array_almost_equal(g1, g2)

        # vararg order
        for g, d in zip(
            _g(x, 2, 3, axis=(1, 0)), [dx[1] / 2.0, dx[0] / 3.0]
        ):
            assert_array_equal(g, d)
        with pytest.raises(TypeError):
            gradient(x, 1, 2, axis=1)

        with pytest.raises(np.exceptions.AxisError):
            gradient(x, axis=3)
        with pytest.raises(np.exceptions.AxisError):
            gradient(x, axis=-3)

    def test_vs_numpy(self):
        rng = np.random.RandomState(11)
        f = rng.rand(7, 9)
        spacing = np.sort(rng.rand(9)) * 3 + 0.1
        for eo in (1, 2):
            ours = _g(jnp.asarray(f), 2.0, spacing, edge_order=eo)
            ref = np.gradient(f, 2.0, spacing, edge_order=eo)
            for a, b in zip(ours, ref):
                np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_inexact_dtypes(self):
        for dt in [np.float16, np.float32, np.float64]:
            # dtype not promoted differently from what diff does
            x = jnp.array([1, 2, 3], dtype=dt)
            assert _g(x).dtype == np.diff(np.asarray(x)).dtype

    def test_values(self):
        # needs at least 2 points for edge_order == 1
        gradient(jnp.arange(2), edge_order=1)
        # needs at least 3 points for edge_order == 2
        gradient(jnp.arange(3), edge_order=2)

        for n, eo in [(0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]:
            with pytest.raises(ValueError):
                gradient(jnp.arange(n), edge_order=eo)


class TestEntropy:
    def test_entropy_positive(self):
        pk = jnp.asarray([0.5, 0.2, 0.3])
        qk = jnp.asarray([0.1, 0.25, 0.65])
        eself = float(stats.entropy(pk, pk))
        edouble = float(stats.entropy(pk, qk))
        assert 0.0 == eself
        assert edouble >= 0.0

    def test_entropy_base(self):
        pk = jnp.ones(16, float)
        S = float(stats.entropy(pk, base=2.0))
        assert abs(S - 4.0) < 1.0e-5

        qk = jnp.ones(16, float).at[:8].set(2.0)
        S = float(stats.entropy(pk, qk))
        S2 = float(stats.entropy(pk, qk, base=2.0))
        assert abs(S / S2 - np.log(2.0)) < 1.0e-5

    def test_entropy_zero(self):
        assert_almost_equal(
            float(stats.entropy(np.asarray([0, 1, 2]))),
            0.63651416829481278,
            decimal=12,
        )

    def test_entropy_2d(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.2, 0.1], [0.3, 0.6], [0.5, 0.3]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, qk)), [0.1933259, 0.18609809]
        )

    def test_entropy_2d_zero(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.0, 0.1], [0.3, 0.6], [0.5, 0.3]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, qk)), [np.inf, 0.18609809]
        )

        pk = pk.at[0, 0].set(0.0)
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, qk)), [0.17403988, 0.18609809]
        )

    def test_entropy_base_2d_nondefault_axis(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, axis=1)),
            np.asarray([0.63651417, 0.63651417, 0.66156324]),
        )

    def test_entropy_2d_nondefault_axis(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.2, 0.1], [0.3, 0.6], [0.5, 0.3]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, qk, axis=1)),
            np.asarray([0.231049, 0.231049, 0.127706]),
        )

    def test_entropy_raises_value_error(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.1, 0.2], [0.6, 0.3]])
        with pytest.raises(ValueError):
            stats.entropy(pk, qk)

    def test_base_entropy_with_axis_0_is_equal_to_default(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, axis=0)),
            np.asarray(stats.entropy(pk)),
        )

    def test_entropy_with_axis_0_is_equal_to_default(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.2, 0.1], [0.3, 0.6], [0.5, 0.3]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk, qk, axis=0)),
            np.asarray(stats.entropy(pk, qk)),
        )

    def test_base_entropy_transposed(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk.T)).T,
            np.asarray(stats.entropy(pk, axis=1)),
        )

    def test_entropy_transposed(self):
        pk = jnp.asarray([[0.1, 0.2], [0.6, 0.3], [0.3, 0.5]])
        qk = jnp.asarray([[0.2, 0.1], [0.3, 0.6], [0.5, 0.3]])
        assert_array_almost_equal(
            np.asarray(stats.entropy(pk.T, qk.T)).T,
            np.asarray(stats.entropy(pk, qk, axis=1)),
        )
