"""skimage.exposure + skimage.metrics tests (property/known-value
oracles; no skimage on this machine)."""

import numpy as np
import pytest

import cupyimg_tpu.skimage.exposure as exposure
import cupyimg_tpu.skimage.metrics as metrics


class TestExposure:
    def test_histogram_float(self):
        rng = np.random.RandomState(0)
        x = rng.rand(50, 50)
        hist, centers = exposure.histogram(x, nbins=10)
        eh, ee = np.histogram(x, bins=10, range=(x.min(), x.max()))
        np.testing.assert_array_equal(np.asarray(hist), eh)
        np.testing.assert_allclose(
            np.asarray(centers), (ee[:-1] + ee[1:]) / 2, rtol=1e-12
        )

    def test_histogram_int_bins_per_value(self):
        x = np.array([1, 1, 2, 5], dtype=np.uint8)
        hist, centers = exposure.histogram(x)
        np.testing.assert_array_equal(np.asarray(centers),
                                      np.arange(1, 6))
        np.testing.assert_array_equal(np.asarray(hist), [2, 1, 0, 0, 1])

    def test_equalize_hist_flattens(self):
        rng = np.random.RandomState(1)
        x = rng.beta(0.5, 3.0, size=(100, 100))
        out = np.asarray(exposure.equalize_hist(x, nbins=256))
        # equalized CDF should be ~linear above the first bin (the lowest
        # value maps to its own CDF, not 0 — standard equalize_hist)
        h, _ = np.histogram(out, bins=10, range=(0, 1))
        assert h[2:].std() / h[2:].mean() < 0.12
        assert out.min() >= 0 and out.max() <= 1

    def test_rescale_intensity_float(self):
        x = np.array([0.25, 0.5, 1.0])
        out = np.asarray(exposure.rescale_intensity(x))
        np.testing.assert_allclose(out, [0.0, 1 / 3, 1.0], rtol=1e-12)

    def test_rescale_intensity_out_range(self):
        x = np.array([0.0, 0.5, 1.0])
        out = np.asarray(exposure.rescale_intensity(x, out_range=(10, 20)))
        np.testing.assert_allclose(out, [10, 15, 20], rtol=1e-12)

    def test_rescale_intensity_uint8(self):
        x = np.array([0, 128, 255], np.uint8) // 2
        out = np.asarray(exposure.rescale_intensity(x, in_range="dtype"))
        assert out.dtype == np.uint8

    def test_adjust_gamma_identity_and_sqrt(self):
        x = np.random.RandomState(2).rand(10, 10)
        np.testing.assert_allclose(
            np.asarray(exposure.adjust_gamma(x, 1.0)), x, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(exposure.adjust_gamma(x, 0.5)), np.sqrt(x),
            rtol=1e-10,
        )

    def test_adjust_gamma_uint8(self):
        x = np.arange(0, 256, 17, dtype=np.uint8)
        out = np.asarray(exposure.adjust_gamma(x, 2.0))
        exp = (((x / 255.0) ** 2) * 255).astype(np.uint8)
        np.testing.assert_array_equal(out, exp)

    def test_adjust_log(self):
        x = np.random.RandomState(3).rand(8, 8)
        out = np.asarray(exposure.adjust_log(x, 1))
        np.testing.assert_allclose(out, np.log2(1 + x), rtol=1e-10)

    def test_adjust_sigmoid(self):
        x = np.random.RandomState(4).rand(8, 8)
        out = np.asarray(exposure.adjust_sigmoid(x, 0.5, 10))
        exp = 1 / (1 + np.exp(10 * (0.5 - x)))
        np.testing.assert_allclose(out, exp, rtol=1e-10)

    def test_cumulative_distribution(self):
        x = np.random.RandomState(5).rand(30, 30)
        cdf, centers = exposure.cumulative_distribution(x, nbins=16)
        c = np.asarray(cdf)
        assert c[-1] == pytest.approx(1.0)
        assert (np.diff(c) >= 0).all()

    def test_is_low_contrast(self):
        assert exposure.is_low_contrast(np.full((10, 10), 0.5))
        x = np.linspace(0, 1, 100).reshape(10, 10)
        assert not exposure.is_low_contrast(x)

    def test_match_histograms(self):
        rng = np.random.RandomState(6)
        src = rng.beta(2, 5, (64, 64))
        ref = rng.beta(5, 2, (64, 64))
        out = np.asarray(exposure.match_histograms(src, ref))
        # matched quantiles: sorted values should be close to ref's
        np.testing.assert_allclose(
            np.quantile(out, [0.1, 0.5, 0.9]),
            np.quantile(ref, [0.1, 0.5, 0.9]),
            atol=0.02,
        )

    def test_match_histograms_multichannel(self):
        rng = np.random.RandomState(7)
        src = rng.rand(16, 16, 3)
        ref = rng.rand(16, 16, 3) * 0.5
        out = np.asarray(
            exposure.match_histograms(src, ref, multichannel=True)
        )
        assert out.shape == src.shape
        assert out.max() <= ref.max() + 1e-6

    def test_equalize_adapthist_properties(self):
        rng = np.random.RandomState(8)
        # low-contrast image with a gradient
        base = np.linspace(0.3, 0.5, 64)[:, None] * np.ones((64, 64))
        x = np.clip(base + rng.rand(64, 64) * 0.05, 0, 1)
        out = np.asarray(exposure.equalize_adapthist(x, kernel_size=16))
        assert out.shape == x.shape
        assert out.min() >= 0 and out.max() <= 1
        # contrast must increase substantially
        assert out.std() > 2 * x.std()

    def test_equalize_adapthist_color(self):
        rng = np.random.RandomState(9)
        x = rng.rand(32, 32, 3) * 0.3
        out = np.asarray(exposure.equalize_adapthist(x, kernel_size=8))
        assert out.shape == x.shape
        assert out.max() <= 1.0


class TestMetrics:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.a = rng.rand(32, 32)
        self.b = np.clip(self.a + rng.randn(32, 32) * 0.1, 0, 1)

    def test_mse(self):
        got = float(metrics.mean_squared_error(self.a, self.b))
        np.testing.assert_allclose(got, np.mean((self.a - self.b) ** 2),
                                   rtol=1e-10)

    def test_nrmse(self):
        got = float(metrics.normalized_root_mse(self.a, self.b))
        exp = np.sqrt(np.mean((self.a - self.b) ** 2)) / np.sqrt(
            np.mean(self.a ** 2)
        )
        np.testing.assert_allclose(got, exp, rtol=1e-10)

    def test_psnr(self):
        got = float(
            metrics.peak_signal_noise_ratio(self.a, self.b, data_range=1.0)
        )
        exp = 10 * np.log10(1.0 / np.mean((self.a - self.b) ** 2))
        np.testing.assert_allclose(got, exp, rtol=1e-10)

    def test_ssim_identity(self):
        s = float(metrics.structural_similarity(self.a, self.a,
                                                data_range=1.0))
        assert s == pytest.approx(1.0)

    def test_ssim_decreases_with_noise(self):
        s1 = float(metrics.structural_similarity(self.a, self.b,
                                                 data_range=1.0))
        worse = np.clip(self.a + np.random.RandomState(1).randn(32, 32) * 0.3,
                        0, 1)
        s2 = float(metrics.structural_similarity(self.a, worse,
                                                 data_range=1.0))
        assert 0 < s2 < s1 < 1

    def test_ssim_known_value(self):
        """SSIM of an image vs itself + constant shift c:
        analytic: (2*mu*(mu+c)+C1)/(mu^2+(mu+c)^2+C1) * (2*v+C2)/(2*v+C2)."""
        x = self.a
        c = 0.1
        y = x + c
        s = float(metrics.structural_similarity(x, y, data_range=1.0))
        # luminance term only penalty; structure/contrast identical
        assert 0.9 < s < 1.0

    def test_ssim_full(self):
        s, S = metrics.structural_similarity(self.a, self.b, data_range=1.0,
                                             full=True)
        assert np.asarray(S).shape == self.a.shape

    def test_ssim_gaussian_weights(self):
        s = float(
            metrics.structural_similarity(
                self.a, self.b, data_range=1.0, gaussian_weights=True
            )
        )
        assert 0 < s < 1

    def test_ssim_multichannel(self):
        a = np.stack([self.a] * 3, -1)
        b = np.stack([self.b] * 3, -1)
        s = float(
            metrics.structural_similarity(a, b, data_range=1.0,
                                          multichannel=True)
        )
        s_single = float(
            metrics.structural_similarity(self.a, self.b, data_range=1.0)
        )
        np.testing.assert_allclose(s, s_single, rtol=1e-10)
