"""special / stats / interpolate / numpy gap-fillers vs scipy & numpy."""

import numpy as np
import pytest
import scipy.special as sp_special
import scipy.stats as sp_stats
from scipy.interpolate import RegularGridInterpolator as SpRGI, interpn as sp_interpn

import cupyimg_tpu.scipy.special as tspecial
import cupyimg_tpu.scipy.stats as tstats
import cupyimg_tpu.scipy.interpolate as tinterp
import cupyimg_tpu.numpy as tnp


class TestSpecial:
    def test_entr(self):
        x = np.array([-1.0, 0.0, 0.5, 1.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(tspecial.entr(x)), sp_special.entr(x), rtol=1e-12
        )

    def test_kl_div(self):
        x = np.array([0.0, 0.0, 0.5, 1.0, 2.0, 1.0])
        y = np.array([0.0, 1.0, 0.5, 2.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(tspecial.kl_div(x, y)), sp_special.kl_div(x, y),
            rtol=1e-12,
        )

    def test_rel_entr(self):
        x = np.array([0.0, 0.0, 0.5, 1.0, 2.0])
        y = np.array([0.0, 1.0, 0.5, 2.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(tspecial.rel_entr(x, y)), sp_special.rel_entr(x, y),
            rtol=1e-12,
        )

    @pytest.mark.parametrize("func", ["huber", "pseudo_huber"])
    def test_huber(self, func):
        delta = np.array([-1.0, 0.0, 1.0, 2.0])
        r = np.array([0.5, 3.0, -1.5, 0.1])
        np.testing.assert_allclose(
            np.asarray(getattr(tspecial, func)(delta, r)),
            getattr(sp_special, func)(delta, r),
            rtol=1e-12,
        )


class TestStats:
    def test_entropy(self):
        pk = np.array([0.2, 0.3, 0.5])
        np.testing.assert_allclose(
            float(tstats.entropy(pk)), sp_stats.entropy(pk), rtol=1e-12
        )

    def test_relative_entropy(self):
        pk = np.array([0.2, 0.3, 0.5])
        qk = np.array([0.1, 0.5, 0.4])
        np.testing.assert_allclose(
            float(tstats.entropy(pk, qk, base=2)),
            sp_stats.entropy(pk, qk, base=2),
            rtol=1e-12,
        )


class TestInterpolate:
    def _setup(self):
        points = (np.linspace(0, 4, 5), np.linspace(0, 5, 6),
                  np.linspace(0, 6, 7))
        rng = np.random.RandomState(0)
        values = rng.randn(5, 6, 7)
        xi = rng.uniform(0, 4, size=(20, 3)) * np.array([1.0, 1.2, 1.4])
        return points, values, xi

    @pytest.mark.parametrize("method", ["linear", "nearest"])
    def test_rgi(self, method):
        points, values, xi = self._setup()
        got = tinterp.RegularGridInterpolator(points, values, method=method)(
            xi
        )
        exp = SpRGI(points, values, method=method)(xi)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12,
                                   atol=1e-12)

    def test_out_of_bounds_fill(self):
        points, values, xi = self._setup()
        xi = xi.copy()
        xi[0] = [-1.0, 10.0, 3.0]
        got = tinterp.RegularGridInterpolator(
            points, values, bounds_error=False, fill_value=-7.0
        )(xi)
        exp = SpRGI(points, values, bounds_error=False, fill_value=-7.0)(xi)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    def test_bounds_error(self):
        points, values, xi = self._setup()
        xi = xi.copy()
        xi[0] = [-1.0, 0.0, 0.0]
        with pytest.raises(ValueError):
            tinterp.RegularGridInterpolator(points, values)(xi)

    def test_interpn(self):
        points, values, xi = self._setup()
        got = tinterp.interpn(points, values, xi)
        exp = sp_interpn(points, values, xi)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)


class TestNumpy:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("sizes", [(10, 4), (4, 10), (5, 5)])
    @pytest.mark.parametrize("func", ["convolve", "correlate"])
    def test_convolve_correlate(self, func, sizes, mode):
        rng = np.random.RandomState(0)
        a = rng.randn(sizes[0])
        v = rng.randn(sizes[1])
        got = getattr(tnp, func)(a, v, mode)
        exp = getattr(np, func)(a, v, mode)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-12)

    def test_correlate_complex(self):
        rng = np.random.RandomState(1)
        a = rng.randn(8) + 1j * rng.randn(8)
        v = rng.randn(3) + 1j * rng.randn(3)
        got = tnp.correlate(a, v, "full")
        exp = np.correlate(a, v, "full")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)

    def test_convolve_int_dtype(self):
        a = np.array([1, 2, 3], dtype=np.int32)
        v = np.array([0, 1, 2], dtype=np.int32)
        got = tnp.convolve(a, v)
        exp = np.convolve(a, v)
        assert np.asarray(got).dtype.kind == "i"
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_gradient(self):
        x = np.random.RandomState(2).randn(6, 7)
        for g, e in zip(tnp.gradient(x), np.gradient(x)):
            np.testing.assert_allclose(np.asarray(g), e, rtol=1e-12)

    def test_histogram(self):
        x = np.random.RandomState(3).randn(100)
        gh, ge = tnp.histogram(x, bins=10)
        eh, ee = np.histogram(x, bins=10)
        np.testing.assert_array_equal(np.asarray(gh), eh)
        np.testing.assert_allclose(np.asarray(ge), ee, rtol=1e-12)

    def test_ravel_multi_index(self):
        idx = (np.array([0, 1, 2]), np.array([2, 1, 0]))
        np.testing.assert_array_equal(
            np.asarray(tnp.ravel_multi_index(idx, (3, 4))),
            np.ravel_multi_index(idx, (3, 4)),
        )

    def test_apply_along_axis(self):
        x = np.random.RandomState(4).randn(4, 5)
        got = tnp.apply_along_axis(lambda r: r.sum(), 1, x)
        np.testing.assert_allclose(
            np.asarray(got), np.apply_along_axis(lambda r: r.sum(), 1, x),
            rtol=1e-12,
        )

    def test_ndim_and_quantile(self):
        assert tnp.ndim([[1, 2]]) == 2
        x = np.random.RandomState(5).rand(50)
        np.testing.assert_allclose(
            float(tnp.quantile(x, 0.3)), np.quantile(x, 0.3), rtol=1e-12
        )
