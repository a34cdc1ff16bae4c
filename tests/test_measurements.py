"""ndimage measurements + fourier vs scipy."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import cupyimg_tpu.scipy.ndimage.measurements as tmeas
import cupyimg_tpu.scipy.ndimage.fourier as tfour


def _blobs(shape, seed=0, p=0.6):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape) > p


class TestLabel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_default_structure(self, seed):
        x = _blobs((20, 21), seed)
        got, n_got = tmeas.label(x)
        exp, n_exp = ndi.label(x)
        assert int(n_got) == n_exp
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_full_connectivity(self):
        x = _blobs((18, 19), 3)
        s = np.ones((3, 3), bool)
        got, n_got = tmeas.label(x, structure=s)
        exp, n_exp = ndi.label(x, structure=s)
        assert int(n_got) == n_exp
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_3d(self):
        x = _blobs((10, 11, 12), 4, p=0.7)
        got, n_got = tmeas.label(x)
        exp, n_exp = ndi.label(x)
        assert int(n_got) == n_exp
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_1d(self):
        x = np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1])
        got, n_got = tmeas.label(x)
        exp, n_exp = ndi.label(x)
        assert int(n_got) == n_exp
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_empty_and_full(self):
        for x in [np.zeros((5, 5), bool), np.ones((5, 5), bool)]:
            got, n_got = tmeas.label(x)
            exp, n_exp = ndi.label(x)
            assert int(n_got) == n_exp
            np.testing.assert_array_equal(np.asarray(got), exp)

    def test_spiral_worst_case(self):
        """Long snaking component exercises the while_loop convergence."""
        x = np.zeros((16, 16), bool)
        x[0, :] = True
        x[:, -1] = True
        x[-1, :] = True
        x[2:, 0] = True
        x[2, 2:-2] = True
        got, n_got = tmeas.label(x)
        exp, n_exp = ndi.label(x)
        assert int(n_got) == n_exp
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_greyscale_mode(self):
        x = np.array([[1, 1, 2, 2], [1, 0, 2, 0], [3, 3, 3, 2]])
        got, n_got = tmeas.label(x, greyscale_mode=True)
        # oracle: components of equal-valued connected cells
        assert int(n_got) == 4
        g = np.asarray(got)
        assert g[0, 0] == g[0, 1] == g[1, 0]
        assert g[0, 2] == g[0, 3] == g[1, 2]
        assert g[2, 0] == g[2, 1] == g[2, 2]
        assert g[2, 3] not in (g[0, 2], 0) or g[2, 3] != g[1, 2]


class TestReductions:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.x = rng.randn(15, 16) * 5
        self.labels, self.n = ndi.label(_blobs((15, 16), 7, p=0.4))
        self.index = list(range(1, self.n + 1))

    @pytest.mark.parametrize(
        "name", ["sum", "mean", "variance", "standard_deviation", "minimum",
                 "maximum", "median"]
    )
    def test_per_label(self, name):
        got = getattr(tmeas, name)(self.x, self.labels, self.index)
        exp = getattr(ndi, name)(self.x, self.labels, self.index)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-12)

    @pytest.mark.parametrize("name", ["sum", "mean", "minimum", "maximum"])
    def test_scalar_index(self, name):
        got = getattr(tmeas, name)(self.x, self.labels, 2)
        exp = getattr(ndi, name)(self.x, self.labels, 2)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)

    @pytest.mark.parametrize("name", ["sum", "mean", "variance"])
    def test_no_index(self, name):
        got = getattr(tmeas, name)(self.x, self.labels)
        exp = getattr(ndi, name)(self.x, self.labels)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)

    @pytest.mark.parametrize("name", ["sum", "mean"])
    def test_no_labels(self, name):
        got = getattr(tmeas, name)(self.x)
        exp = getattr(ndi, name)(self.x)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)

    @pytest.mark.parametrize("name", ["minimum_position", "maximum_position"])
    def test_positions(self, name):
        got = getattr(tmeas, name)(self.x, self.labels, self.index)
        exp = getattr(ndi, name)(self.x, self.labels, self.index)
        assert got == [tuple(e) for e in exp]

    def test_extrema(self):
        got = tmeas.extrema(self.x, self.labels, self.index)
        exp = ndi.extrema(self.x, self.labels, self.index)
        np.testing.assert_allclose(np.asarray(got[0]), exp[0], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(got[1]), exp[1], rtol=1e-12)
        assert got[2] == [tuple(e) for e in exp[2]]
        assert got[3] == [tuple(e) for e in exp[3]]

    def test_center_of_mass(self):
        w = np.abs(self.x) + 0.1
        got = tmeas.center_of_mass(w, self.labels, self.index)
        exp = ndi.center_of_mass(w, self.labels, self.index)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-10)

    def test_histogram(self):
        got = tmeas.histogram(self.x, -10, 10, 8, self.labels, self.index)
        exp = ndi.histogram(self.x, -10, 10, 8, self.labels, self.index)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(np.asarray(g), e)

    def test_histogram_no_labels(self):
        got = tmeas.histogram(self.x, -10, 10, 8)
        exp = ndi.histogram(self.x, -10, 10, 8)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_labeled_comprehension(self):
        got = tmeas.labeled_comprehension(
            self.x, self.labels, self.index, np.mean, float, -1.0
        )
        exp = ndi.labeled_comprehension(
            self.x, self.labels, self.index, np.mean, float, -1.0
        )
        np.testing.assert_allclose(got, exp, rtol=1e-12)


class TestFourier:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.x = rng.randn(16, 17)

    @pytest.mark.parametrize("sigma", [1.0, (2.0, 0.5)])
    def test_fourier_gaussian(self, sigma):
        X = np.fft.fftn(self.x)
        got = tfour.fourier_gaussian(X, sigma)
        exp = ndi.fourier_gaussian(X, sigma)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-10)

    def test_fourier_uniform(self):
        X = np.fft.fftn(self.x)
        got = tfour.fourier_uniform(X, 5)
        exp = ndi.fourier_uniform(X, 5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-10)

    def test_fourier_shift_roundtrip(self):
        X = np.fft.fftn(self.x)
        got = np.fft.ifftn(np.asarray(tfour.fourier_shift(X, (1.0, 2.0)))).real
        exp = np.fft.ifftn(ndi.fourier_shift(X, (1.0, 2.0))).real
        np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-10)

    def test_fourier_gaussian_rfft(self):
        X = np.fft.rfftn(self.x)
        got = tfour.fourier_gaussian(X, 1.5, n=self.x.shape[-1])
        exp = ndi.fourier_gaussian(X, 1.5, n=self.x.shape[-1])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_fourier_ellipsoid_2d(self):
        X = np.fft.fftn(self.x)
        got = tfour.fourier_ellipsoid(X, 4)
        exp = ndi.fourier_ellipsoid(X, 4)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-9)

    def test_fourier_ellipsoid_3d(self):
        rng = np.random.RandomState(1)
        x = rng.randn(8, 9, 10)
        X = np.fft.fftn(x)
        got = tfour.fourier_ellipsoid(X, 4)
        exp = ndi.fourier_ellipsoid(X, 4)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-9)


class TestAbsentLabels:
    """scipy's empty-set semantics when ``index`` requests labels that
    never occur: sum -> 0, mean/variance/std/median/center_of_mass ->
    NaN, minimum/maximum/positions raise for a SCALAR absent index but
    zero-fill in list form (extrema shares that), and index=None with
    all-background labels follows the same rules."""

    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    labels = np.array([[0, 1], [1, 3]])  # label 2 absent, max label 3

    def _j(self):
        import jax.numpy as jnp

        return jnp.asarray(self.x), jnp.asarray(self.labels)

    def test_sum_zero(self):
        xj, lj = self._j()
        np.testing.assert_allclose(
            np.asarray(tmeas.sum(xj, lj, [1, 2, 9]), float), [5.0, 0, 0])

    def test_nan_family(self):
        xj, lj = self._j()
        for op in ("mean", "variance", "standard_deviation"):
            out = np.asarray(getattr(tmeas, op)(xj, lj, [1, 2, 9]), float)
            assert np.isfinite(out[0]) and np.isnan(out[1:]).all(), op
            assert np.isnan(float(np.asarray(
                getattr(tmeas, op)(xj, lj, 2))))
        assert np.isnan(float(np.asarray(tmeas.median(xj, lj, 2))))
        com = tmeas.center_of_mass(xj, lj, [1, 2])
        assert np.isfinite(com[0]).all() and np.isnan(com[1]).all()

    def test_minmax_scalar_raises_list_zerofills(self):
        xj, lj = self._j()
        for op in ("minimum", "maximum", "minimum_position",
                   "maximum_position"):
            with pytest.raises(ValueError):
                getattr(tmeas, op)(xj, lj, 2)
        np.testing.assert_allclose(
            np.asarray(tmeas.minimum(xj, lj, [1, 2]), float), [2.0, 0.0])
        assert tmeas.maximum_position(xj, lj, [1, 2]) == [(1, 0), (0, 0)]

    def test_extrema_matches_minmax_semantics(self):
        xj, lj = self._j()
        with pytest.raises(ValueError):
            tmeas.extrema(xj, lj, 2)
        mn, mx, mnp, mxp = tmeas.extrema(xj, lj, [1, 2])
        np.testing.assert_allclose(np.asarray(mn, float), [2.0, 0.0])
        np.testing.assert_allclose(np.asarray(mx, float), [3.0, 0.0])
        assert mnp == [(0, 1), (0, 0)] and mxp == [(1, 0), (0, 0)]

    def test_all_background_index_none(self):
        import jax.numpy as jnp

        xj = jnp.asarray(self.x)
        lab0 = jnp.zeros_like(jnp.asarray(self.labels))
        assert float(np.asarray(tmeas.sum(xj, lab0))) == 0.0
        assert np.isnan(float(np.asarray(tmeas.mean(xj, lab0))))
        assert np.isnan(float(np.asarray(tmeas.median(xj, lab0))))
        with pytest.raises(ValueError):
            tmeas.minimum(xj, lab0)
        with pytest.raises(ValueError):
            tmeas.minimum_position(xj, lab0)
