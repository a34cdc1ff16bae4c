"""skimage.registration tests (exact Fourier-shift oracles)."""

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.skimage.registration as reg
from cupyimg_tpu.skimage.registration._masked_phase_cross_correlation import (
    cross_correlate_masked,
)


def _smooth(seed=0, n=64):
    rng = np.random.RandomState(seed)
    return sndi.gaussian_filter(rng.rand(n, n), 2)


def _fourier_shift(img, shift):
    F = np.fft.fftn(img)
    freqs = [
        np.fft.fftfreq(n).reshape(
            [-1 if i == ax else 1 for i in range(img.ndim)]
        )
        for ax, n in enumerate(img.shape)
    ]
    phase = sum(s * f for s, f in zip(shift, freqs))
    return np.real(np.fft.ifftn(F * np.exp(-2j * np.pi * phase)))


class TestPhaseCrossCorrelation:
    def test_integer_shift(self):
        ref = _smooth()
        mov = np.roll(ref, (5, -3), axis=(0, 1))
        shifts, error, phase = reg.phase_cross_correlation(ref, mov)
        np.testing.assert_array_equal(np.asarray(shifts), [-5.0, 3.0])
        assert float(error) < 1e-5
        assert abs(float(phase)) < 1e-4

    @pytest.mark.parametrize("shift", [(1.25, -2.75), (-0.4, 0.6)])
    def test_subpixel_shift(self, shift):
        ref = _smooth()
        mov = _fourier_shift(ref, shift)
        shifts, _, _ = reg.phase_cross_correlation(
            ref, mov, upsample_factor=20
        )
        np.testing.assert_allclose(
            np.asarray(shifts), [-shift[0], -shift[1]], atol=0.05
        )

    def test_fourier_space_input(self):
        ref = _smooth()
        mov = np.roll(ref, (2, 1), axis=(0, 1))
        shifts = reg.phase_cross_correlation(
            np.fft.fftn(ref),
            np.fft.fftn(mov),
            space="fourier",
            return_error=False,
        )
        np.testing.assert_array_equal(np.asarray(shifts), [-2.0, -1.0])

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            reg.phase_cross_correlation(
                np.zeros((8, 8)), np.zeros((9, 9))
            )

    def test_bad_space_raises(self):
        with pytest.raises(ValueError):
            reg.phase_cross_correlation(
                np.zeros((8, 8)), np.zeros((8, 8)), space="hyperbolic"
            )

    def test_nan_raises(self):
        a = _smooth()
        b = a.copy()
        b[3, 3] = np.nan
        with pytest.raises(ValueError):
            reg.phase_cross_correlation(a, b)

    def test_masked_dispatch(self):
        ref = _smooth()
        mov = np.roll(ref, (5, -3), axis=(0, 1))
        mask = np.ones_like(ref, bool)
        mask[:, :10] = False
        sh = reg.phase_cross_correlation(
            ref, mov, reference_mask=mask, moving_mask=mask
        )
        np.testing.assert_allclose(np.asarray(sh), [-5.0, 3.0])

    def test_1d_axis_no_shift(self):
        ref = _smooth()[0:1]  # single row
        mov = np.roll(ref, 4, axis=1)
        shifts = reg.phase_cross_correlation(
            ref, mov, return_error=False
        )
        assert float(np.asarray(shifts)[0]) == 0.0


class TestCrossCorrelateMasked:
    def test_autocorrelation_peak(self):
        x = _smooth(3, 32)
        m = np.ones_like(x, bool)
        out = np.asarray(
            cross_correlate_masked(x, x, m, m, axes=(0, 1), mode="full")
        )
        # peak of NCC of an image with itself is 1 at zero displacement
        assert out.max() == pytest.approx(1.0, abs=1e-6)
        idx = np.unravel_index(np.argmax(out), out.shape)
        assert idx == (31, 31)

    def test_same_mode_shape(self):
        x = _smooth(4, 32)
        m = np.ones_like(x, bool)
        out = cross_correlate_masked(
            x, x, m, m, axes=(0, 1), mode="same"
        )
        assert out.shape == x.shape

    def test_range(self):
        a = _smooth(5, 32)
        b = _smooth(6, 32)
        m = np.ones_like(a, bool)
        out = np.asarray(cross_correlate_masked(a, b, m, m))
        assert out.min() >= -1 and out.max() <= 1

    def test_bad_mode(self):
        with pytest.raises(ValueError):
            cross_correlate_masked(
                np.zeros((4, 4)),
                np.zeros((4, 4)),
                np.ones((4, 4)),
                np.ones((4, 4)),
                mode="bogus",
            )


class TestOpticalFlow:
    def test_tvl1_uniform_translation(self):
        ref = _smooth()
        mov = _fourier_shift(ref, (1.25, -2.75))
        flow = np.asarray(reg.optical_flow_tvl1(ref, mov))
        inner = flow[:, 16:-16, 16:-16].reshape(2, -1).mean(1)
        np.testing.assert_allclose(inner, (1.25, -2.75), atol=0.1)

    def test_ilk_uniform_translation(self):
        ref = _smooth()
        mov = _fourier_shift(ref, (1.25, -2.75))
        flow = np.asarray(
            reg.optical_flow_ilk(ref, mov, radius=7, num_warp=5)
        )
        inner = flow[:, 16:-16, 16:-16].reshape(2, -1).mean(1)
        np.testing.assert_allclose(inner, (1.25, -2.75), atol=0.1)

    def test_ilk_gaussian_window(self):
        ref = _smooth()
        mov = _fourier_shift(ref, (0.5, 0.5))
        flow = np.asarray(
            reg.optical_flow_ilk(
                ref, mov, radius=7, num_warp=3, gaussian=True
            )
        )
        inner = flow[:, 16:-16, 16:-16].reshape(2, -1).mean(1)
        np.testing.assert_allclose(inner, (0.5, 0.5), atol=0.1)

    def test_zero_flow_for_identical_images(self):
        ref = _smooth()
        flow = np.asarray(reg.optical_flow_tvl1(ref, ref))
        assert np.abs(flow).max() < 1e-2

    def test_shape_and_dtype(self):
        ref = _smooth()
        flow = reg.optical_flow_ilk(
            ref, ref, radius=3, num_warp=1, dtype=np.float32
        )
        assert flow.shape == (2,) + ref.shape
        assert flow.dtype == np.float32

    def test_input_validation(self):
        with pytest.raises(ValueError):
            reg.optical_flow_tvl1(np.zeros((8, 8)), np.zeros((9, 9)))
        with pytest.raises(ValueError):
            reg.optical_flow_ilk(
                np.zeros((8, 8)), np.zeros((8, 8)), dtype=np.int32
            )
