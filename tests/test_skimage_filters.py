"""skimage.filters + feature.corner tests (scipy/analytic/property
oracles)."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.ndimage as sndi

import cupyimg_tpu.skimage.filters as filters
import cupyimg_tpu.skimage.feature.corner as corner


def _img(shape=(32, 33), seed=0):
    return np.random.RandomState(seed).rand(*shape)


class TestEdges:
    def test_sobel_h_on_ramp(self):
        """A vertical ramp has constant row derivative."""
        r, c = np.mgrid[0:16, 0:16]
        x = r.astype(np.float64)
        out = np.asarray(filters.sobel_h(x))
        # convolve-oriented derivative [1, 0, -1]: increasing ramp -> +2
        np.testing.assert_allclose(out[2:-2, 2:-2], 2.0, atol=1e-10)
        out_v = np.asarray(filters.sobel_v(x))
        np.testing.assert_allclose(out_v[2:-2, 2:-2], 0.0, atol=1e-10)

    @pytest.mark.parametrize("name", ["sobel", "scharr", "prewitt", "farid"])
    def test_magnitude_rotation_invariant_on_edge(self, name):
        x = np.zeros((20, 20))
        x[:, 10:] = 1.0
        fn = getattr(filters, name)
        mag_v = np.asarray(fn(x))
        mag_h = np.asarray(fn(x.T))
        np.testing.assert_allclose(mag_v, mag_h.T, atol=1e-12)

    def test_roberts_on_diagonal_edge(self):
        x = np.tri(10)
        out = np.asarray(filters.roberts(x))
        assert out.max() > 0.5

    def test_laplace_matches_ndimage(self):
        x = _img()
        got = np.asarray(filters.laplace(x))
        # reference laplace uses the uft.laplacian impulse: the negated
        # ndimage laplacian (center +2*ndim)
        exp = -sndi.laplace(x)
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_mask(self):
        x = _img()
        mask = np.zeros(x.shape, bool)
        mask[8:20, 8:20] = True
        out = np.asarray(filters.sobel(x, mask=mask))
        assert (out[~np.asarray(
            sndi.binary_erosion(mask, np.ones((3, 3))))] == 0).all()


class TestGaussianMedian:
    def test_gaussian_matches_ndimage(self):
        x = _img()
        got = np.asarray(filters.gaussian(x, 1.5, multichannel=False))
        exp = sndi.gaussian_filter(x, 1.5, mode="nearest")
        np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-12)

    def test_difference_of_gaussians_bandpass(self):
        x = _img((64, 64), 1)
        out = np.asarray(filters.difference_of_gaussians(x, 1, 4))
        exp = sndi.gaussian_filter(x, 1, mode="nearest") - \
            sndi.gaussian_filter(x, 4, mode="nearest")
        np.testing.assert_allclose(out, exp, rtol=1e-8, atol=1e-10)

    def test_median_matches_ndimage(self):
        x = _img()
        got = np.asarray(filters.median(x))
        exp = sndi.median_filter(x, footprint=np.ones((3, 3), bool),
                                 mode="nearest")
        np.testing.assert_array_equal(got, exp)

    def test_unsharp_sharpens(self):
        x = sndi.gaussian_filter(_img((40, 40), 2), 2)
        out = np.asarray(filters.unsharp_mask(x, radius=2, amount=1.0))
        assert out.std() > x.std()


class TestGaborWindowLPI:
    def test_gabor_kernel_dc(self):
        """Zero-frequency, zero-offset kernel has positive DC gain."""
        g = np.asarray(filters.gabor_kernel(0.1))
        assert abs(g.sum().imag) < 1e-8

    def test_gabor_filters_texture(self):
        c = np.cos(2 * np.pi * 0.2 * np.arange(32))
        x = np.outer(np.ones(32), c)
        real_match, _ = filters.gabor(x, frequency=0.2, theta=0)
        real_off, _ = filters.gabor(x, frequency=0.05, theta=0)
        assert np.abs(np.asarray(real_match)).mean() > \
            np.abs(np.asarray(real_off)).mean()

    def test_window_hann(self):
        from scipy.signal import get_window

        w = np.asarray(filters.window("hann", 16))
        exp = get_window("hann", 16, fftbins=False)
        np.testing.assert_allclose(w, exp, atol=1e-12)

    def test_window_2d_isotropic(self):
        w = np.asarray(filters.window("hann", (17, 17)))
        assert w.shape == (17, 17)
        assert w[8, 8] == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(w, w.T, atol=1e-10)

    # ported from the reference suite
    # (cupyimg/skimage/filters/tests/test_window.py)

    @pytest.mark.parametrize("size", [5, 6])
    @pytest.mark.parametrize("ndim", [2, 3, 4])
    def test_window_shape_isotropic(self, size, ndim):
        w = np.asarray(filters.window("hann", (size,) * ndim))
        assert w.ndim == ndim
        assert w.shape[1:] == w.shape[:-1]
        for i in range(1, ndim - 1):
            np.testing.assert_allclose(
                w.sum(axis=0), w.sum(axis=i), atol=1e-6
            )

    @pytest.mark.parametrize("shape", [(8, 16), (16, 8), (2, 3, 4)])
    def test_window_shape_anisotropic(self, shape):
        assert np.asarray(filters.window("hann", shape)).shape == shape

    @pytest.mark.parametrize("shape", [(17, 33), (17, 97)])
    def test_window_anisotropic_amplitude(self, shape):
        # the warp stretches the window to cover each axis' range, so
        # the two center profiles should have similar mean amplitude
        w = np.asarray(filters.window(("tukey", 0.8), shape))
        profile_w = w[w.shape[0] // 2, :]
        profile_h = w[:, w.shape[1] // 2]
        assert abs(profile_w.mean() - profile_h.mean()) < 0.01

    @pytest.mark.parametrize("wintype", [16, "triang", ("tukey", 0.8)])
    def test_window_type(self, wintype):
        w = np.asarray(filters.window(wintype, (9, 9)))
        assert w.ndim == 2 and w.shape == (9, 9)
        np.testing.assert_allclose(
            w.sum(axis=0), w.sum(axis=1), atol=1e-6
        )

    @pytest.mark.parametrize("size", [10, 11])
    def test_window_1d_even_odd(self, size):
        from scipy.signal import get_window

        w = np.asarray(filters.window("hann", size))
        np.testing.assert_allclose(
            w, get_window("hann", size, fftbins=False), atol=1e-6
        )

    def test_window_invalid_shape(self):
        with pytest.raises(ValueError):
            filters.window(10, shape=(-5, 10))
        with pytest.raises(ValueError):
            filters.window(10, shape=(1.3, 2.0))

    def test_lpi_wiener_smooths(self):
        x = _img((16, 16), 3)

        def impulse(r, c):
            return np.exp(-(np.asarray(r) ** 2 + np.asarray(c) ** 2) / 2)

        out = np.asarray(filters.wiener(x, impulse))
        assert out.shape == x.shape


class TestThresholds:
    def setup_method(self):
        rng = np.random.RandomState(0)
        # clear bimodal image
        self.x = np.concatenate(
            [rng.normal(0.2, 0.05, 500), rng.normal(0.8, 0.05, 500)]
        ).reshape(20, 50)

    @pytest.mark.parametrize(
        "name",
        ["threshold_otsu", "threshold_yen", "threshold_isodata",
         "threshold_li", "threshold_minimum", "threshold_triangle"],
    )
    def test_bimodal_separation(self, name):
        t = float(getattr(filters, name)(self.x))
        assert 0.3 < t < 0.7, name

    def test_threshold_mean(self):
        t = float(filters.threshold_mean(self.x))
        np.testing.assert_allclose(t, self.x.mean(), rtol=1e-10)

    def test_multiotsu_three_classes(self):
        rng = np.random.RandomState(1)
        x = np.concatenate(
            [rng.normal(0.15, 0.03, 400), rng.normal(0.5, 0.03, 400),
             rng.normal(0.85, 0.03, 400)]
        )
        t = np.asarray(filters.threshold_multiotsu(x.reshape(30, 40)))
        assert t.shape == (2,)
        assert 0.2 < t[0] < 0.45
        assert 0.55 < t[1] < 0.8

    def test_niblack_sauvola_shapes(self):
        x = _img()
        tn = np.asarray(filters.threshold_niblack(x, window_size=7))
        ts = np.asarray(filters.threshold_sauvola(x, window_size=7))
        assert tn.shape == x.shape and ts.shape == x.shape
        # niblack with k=0 is the local mean
        t0 = np.asarray(filters.threshold_niblack(x, window_size=7, k=0))
        exp = sndi.uniform_filter(x, 7, mode="mirror")
        np.testing.assert_allclose(t0, exp, rtol=1e-8, atol=1e-10)

    def test_threshold_local_mean(self):
        x = _img()
        t = np.asarray(filters.threshold_local(x, 7, method="mean"))
        exp = sndi.uniform_filter(x, 7, mode="reflect")
        np.testing.assert_allclose(t, exp, rtol=1e-8, atol=1e-10)

    def test_hysteresis(self):
        x = np.array([[0.0, 0.4, 0.9, 0.4, 0.0, 0.4, 0.0]])
        out = np.asarray(filters.apply_hysteresis_threshold(x, 0.3, 0.8))
        np.testing.assert_array_equal(
            out, [[False, True, True, True, False, False, False]]
        )

    def test_try_all(self):
        fig, ax = filters.try_all_threshold(self.x, verbose=False)
        assert len(ax) >= 8


class TestRidges:
    def _line_image(self):
        x = np.zeros((40, 40))
        x[20, 5:35] = 1.0
        return sndi.gaussian_filter(x, 1)

    @pytest.mark.parametrize("name", ["meijering", "sato", "frangi"])
    def test_ridge_response_on_line(self, name):
        x = self._line_image()
        out = np.asarray(
            getattr(filters, name)(x, sigmas=[1, 2], black_ridges=False)
        )
        on_ridge = out[20, 10:30].mean()
        off_ridge = out[5, 10:30].mean()
        assert on_ridge > 5 * (off_ridge + 1e-12), name

    def test_hessian_background_one(self):
        x = self._line_image()
        out = np.asarray(filters.hessian(x, sigmas=[1], black_ridges=False))
        assert (out[0:5] == 1.0).all()


class TestCorner:
    def test_hessian_eigvals_2x2_analytic(self):
        a = np.random.RandomState(0).rand(5, 5)
        b = np.random.RandomState(1).rand(5, 5)
        d = np.random.RandomState(2).rand(5, 5)
        got = corner._symmetric_eigvals_2x2(
            *(np.asarray(v) for v in (a, b, d))
        )
        for i in range(5):
            for j in range(5):
                e = np.linalg.eigvalsh([[a[i, j], b[i, j]],
                                        [b[i, j], d[i, j]]])
                np.testing.assert_allclose(
                    [float(got[0][i, j]), float(got[1][i, j])],
                    e[::-1], rtol=1e-10,
                )

    def test_hessian_eigvals_3x3_analytic(self):
        rng = np.random.RandomState(3)
        vals = [rng.rand(4, 4) for _ in range(6)]
        got = corner._symmetric_eigvals_3x3(*[np.asarray(v) for v in vals])
        a, b, c, d, e, f = vals
        for i in range(4):
            for j in range(4):
                M = np.array(
                    [[a[i, j], b[i, j], c[i, j]],
                     [b[i, j], d[i, j], e[i, j]],
                     [c[i, j], e[i, j], f[i, j]]]
                )
                ev = np.linalg.eigvalsh(M)[::-1]
                np.testing.assert_allclose(
                    [float(g[i, j]) for g in got], ev, rtol=1e-8, atol=1e-8
                )

    def test_corner_harris_finds_corner(self):
        x = np.zeros((30, 30))
        x[10:20, 10:20] = 1.0
        resp = np.asarray(corner.corner_harris(x))
        # threshold_rel default changed to None (skimage 0.18 parity):
        # filter weak border ripples explicitly
        peaks = np.asarray(
            corner.corner_peaks(resp, min_distance=2, threshold_rel=0.1)
        )
        assert len(peaks) >= 4
        for p in peaks:
            assert 8 <= p[0] <= 21 and 8 <= p[1] <= 21

    def test_shi_tomasi_range(self):
        x = _img((20, 20), 5)
        resp = np.asarray(corner.corner_shi_tomasi(x))
        assert resp.shape == x.shape

    def test_structure_tensor_constant_image(self):
        x = np.ones((16, 16))
        Arr, Arc, Acc = corner.structure_tensor(x, sigma=1)
        # interior only: 'constant' border mode creates edge gradients that
        # the gaussian smears ~truncate*sigma+1 pixels inward
        np.testing.assert_allclose(np.asarray(Arr)[7:9, 7:9], 0, atol=1e-12)

    def test_shape_index_sphere(self):
        """A gaussian blob cap has shape index near +1 at its center."""
        r, c = np.mgrid[-10:11, -10:11]
        x = np.exp(-(r ** 2 + c ** 2) / 20.0)
        s = np.asarray(corner.shape_index(x, sigma=1))
        assert s[10, 10] > 0.9


class TestPeak:
    def test_peak_local_max_basic(self):
        from cupyimg_tpu.skimage.feature.peak import peak_local_max

        x = np.zeros((20, 20))
        x[5, 5] = 1.0
        x[15, 14] = 2.0
        coords = np.asarray(peak_local_max(x, min_distance=2))
        assert coords.shape == (2, 2)
        np.testing.assert_array_equal(coords[0], [15, 14])  # sorted by value
        np.testing.assert_array_equal(coords[1], [5, 5])

    def test_min_distance_suppression(self):
        from cupyimg_tpu.skimage.feature.corner import corner_peaks

        x = np.zeros((20, 20))
        x[5, 5] = 2.0
        x[5, 7] = 1.0  # within min_distance of the stronger one
        coords = np.asarray(corner_peaks(x, min_distance=3))
        assert coords.shape[0] == 1
        np.testing.assert_array_equal(coords[0], [5, 5])

    def test_threshold_rel(self):
        from cupyimg_tpu.skimage.feature.peak import peak_local_max

        x = np.zeros((10, 10))
        x[2, 2] = 0.1
        x[7, 7] = 1.0
        coords = np.asarray(peak_local_max(x, threshold_rel=0.5))
        assert coords.shape == (1, 2)


def test_threshold_otsu_exact_formula_plateau():
    """Near-plateau criterion from fuzzing: the between-class variance
    numerator for the upper class must include the split bin, exactly
    like skimage's reversed-cumsum mean2 (off by one bin, the argmax
    lands ~8 bins away on bimodal data)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(81)
    x = None
    for _ in range(15):
        x = np.concatenate([rng.normal(0.3, 0.05, 300),
                            rng.normal(0.7, 0.08, 500)]).reshape(40, 20)
    got = float(np.asarray(filters.threshold_otsu(jnp.asarray(x))))
    counts, edges = np.histogram(x.ravel(), 256)
    centers = (edges[:-1] + edges[1:]) / 2
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    csum = np.cumsum(counts * centers)
    m1 = csum / np.where(w1 == 0, 1, w1)
    m2 = (np.cumsum((counts * centers)[::-1])
          / np.maximum(np.cumsum(counts[::-1]), 1))[::-1]
    v12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    exp = centers[:-1][np.argmax(v12)]
    np.testing.assert_allclose(got, exp, rtol=1e-12)


class TestThresholdLocalGeneric:
    """method='generic' goes beyond the reference (which raises,
    reference thresholding.py:236) via ndimage.generic_filter."""

    def test_generic_mean_equals_mean_method(self):
        from cupyimg_tpu.skimage.filters import threshold_local

        x = np.random.RandomState(0).rand(24, 25)
        got = threshold_local(jnp.asarray(x), 5, method="generic",
                              param=lambda v: jnp.mean(v), offset=0.01)
        ref = threshold_local(jnp.asarray(x), 5, method="mean",
                              offset=0.01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)

    def test_generic_vs_scipy_generic_filter(self):
        import scipy.ndimage as sndi
        from cupyimg_tpu.skimage.filters import threshold_local

        x = np.random.RandomState(1).rand(16, 18)
        got = threshold_local(
            jnp.asarray(x), 3, method="generic",
            param=lambda v: jnp.max(v) - jnp.min(v),
        )
        exp = sndi.generic_filter(
            x, lambda v: v.max() - v.min(), size=(3, 3), mode="reflect"
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12,
                                   atol=1e-12)

    def test_generic_requires_callable(self):
        from cupyimg_tpu.skimage.filters import threshold_local

        with pytest.raises(ValueError):
            threshold_local(jnp.zeros((8, 8)), 3, method="generic",
                            param=3)
