"""Compiled signal / FFT paths on the real TPU vs scipy oracles.

FFT-domain convolution (ops/pallas_fft.py fused pipeline, jnp.fft
fallback) needs complex intermediates, which the dev relay may not
support (and a failed complex op poisons the process — see conftest);
those tests depend on ``complex_ok``.  The polyphase upfirdn family is
real-only and always runs.

Reference paths: cupyimg/scipy/signal/signaltools.py:437-985 (fft/oa
conv), _upfirdn.py (external fast_upfirdn CUDA dep, here first-party).
"""

import functools

import numpy as np
import pytest
import scipy.signal as ssig

import jax.numpy as jnp

import cupyimg_tpu.scipy.signal as sig

from _tpu_helpers import assert_close


@functools.lru_cache(maxsize=4)
def _data(shape, seed=0):
    x = np.random.RandomState(seed).randn(*shape).astype(np.float32)
    return x, jnp.asarray(x)


class TestFFTConv:
    def test_fftconvolve_2d(self, complex_ok):
        x, xg = _data((1024, 1100))
        k, kg = _data((31, 31), seed=1)
        got = sig.fftconvolve(xg, kg, mode="same")
        want = ssig.fftconvolve(x.astype(np.float64),
                                k.astype(np.float64), mode="same")
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    def test_oaconvolve_2d(self, complex_ok):
        x, xg = _data((1024, 1100))
        k, kg = _data((31, 31), seed=1)
        got = sig.oaconvolve(xg, kg, mode="same")
        want = ssig.oaconvolve(x.astype(np.float64),
                               k.astype(np.float64), mode="same")
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    def test_fftconvolve_1d_full(self, complex_ok):
        x, xg = _data((1 << 20,))
        k, kg = _data((257,), seed=2)
        got = sig.fftconvolve(xg, kg, mode="full")
        want = ssig.fftconvolve(x.astype(np.float64),
                                k.astype(np.float64), mode="full")
        assert_close(got, want, rtol=1e-4, atol=5e-2)

    def test_hilbert(self, complex_ok):
        x, xg = _data((1 << 18,))
        got = sig.hilbert(xg)
        want = ssig.hilbert(x.astype(np.float64))
        assert_close(got, want, rtol=1e-4, atol=1e-3)

    def test_resample_fft(self, complex_ok):
        x, xg = _data((1 << 16,))
        got = sig.resample(xg, 3 * (1 << 14))
        want = ssig.resample(x.astype(np.float64), 3 * (1 << 14))
        assert_close(got, want, rtol=1e-4, atol=1e-3)


class TestFourierNdimage:
    def test_fourier_gaussian_roundtrip(self, complex_ok):
        import cupyimg_tpu.scipy.ndimage as ndi
        import scipy.ndimage as sndi

        x, xg = _data((512, 640))
        f = jnp.fft.fft2(xg)
        got = jnp.fft.ifft2(ndi.fourier_gaussian(f, sigma=2.0)).real
        fs = np.fft.fft2(x.astype(np.float64))
        want = np.fft.ifft2(sndi.fourier_gaussian(fs, sigma=2.0)).real
        assert_close(got, want, rtol=1e-4, atol=1e-3)


class TestUpfirdn:
    @pytest.mark.parametrize("up,down", [(1, 1), (2, 3), (7, 4)])
    def test_upfirdn(self, up, down):
        x, xg = _data((100000,))
        h, hg = _data((101,), seed=3)
        got = sig.upfirdn(hg, xg, up=up, down=down)
        want = ssig.upfirdn(h.astype(np.float64), x.astype(np.float64),
                            up=up, down=down)
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    @pytest.mark.parametrize("padtype", ["constant", "mean", "line"])
    def test_resample_poly(self, padtype):
        x, xg = _data((100000,))
        got = sig.resample_poly(xg, 2, 3, padtype=padtype)
        want = ssig.resample_poly(x.astype(np.float64), 2, 3,
                                  padtype=padtype)
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    def test_convolve_direct_1d(self):
        x, xg = _data((100000,))
        k, kg = _data((65,), seed=4)
        got = sig.convolve(xg, kg, mode="same", method="direct")
        want = ssig.convolve(x.astype(np.float64), k.astype(np.float64),
                             mode="same", method="direct")
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    def test_convolve_fft_1d_routes_oa(self):
        # method='fft' on long 1-D signals rides blocked overlap-add
        # (the full-size XLA TPU FFT measures ~100x slower at 4M pts);
        # values must still match the plain fft result
        x, xg = _data((300000,))
        k, kg = _data((301,), seed=5)
        got = sig.convolve(xg, kg, mode="same", method="fft")
        want = ssig.convolve(x.astype(np.float64), k.astype(np.float64),
                             mode="same", method="fft")
        assert_close(got, want, rtol=1e-4, atol=1e-2)

    def test_choose_conv_method_1d_costs(self):
        # the 1-D direct model uses the lane-rotation per-tap cost, not
        # the 2-D Pallas engine's: long-kernel 1-D goes to fft
        big = jnp.zeros(1 << 22, jnp.float32)
        k = jnp.zeros(257, jnp.float32)
        assert sig.choose_conv_method(big, k) == "fft"
        assert sig.choose_conv_method(
            jnp.zeros(1000, jnp.float32), jnp.zeros(15, jnp.float32)
        ) == "direct"
