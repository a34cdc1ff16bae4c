"""scipy.signal subset vs scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sps

import cupyimg_tpu.scipy.signal as tsig


def _rand(shape, dtype=np.float64, seed=0):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind == "c":
        return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(dtype)
    if np.dtype(dtype).kind in "iu":
        return rng.randint(-20, 20, size=shape).astype(dtype)
    return rng.randn(*shape).astype(dtype)


class TestUpfirdn:
    @pytest.mark.parametrize("up,down", [(1, 1), (3, 1), (1, 3), (2, 3),
                                         (7, 2)])
    @pytest.mark.parametrize("len_h", [1, 2, 5, 12])
    def test_basic(self, up, down, len_h):
        x = _rand((31,))
        h = _rand((len_h,), seed=1)
        got = tsig.upfirdn(h, x, up, down)
        exp = sps.upfirdn(h, x, up, down)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-12)

    def test_axis(self):
        x = _rand((4, 20))
        h = _rand((5,), seed=2)
        for axis in (0, 1):
            got = tsig.upfirdn(h, x, 2, 3, axis=axis)
            exp = sps.upfirdn(h, x, 2, 3, axis=axis)
            np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                       atol=1e-12)

    def test_complex(self):
        x = _rand((15,), np.complex128)
        h = _rand((4,), np.complex128, seed=3)
        got = tsig.upfirdn(h, x, 3, 2)
        exp = sps.upfirdn(h, x, 3, 2)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   atol=1e-12)


class TestConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("method", ["direct", "fft"])
    @pytest.mark.parametrize("func", ["convolve", "correlate"])
    def test_1d(self, func, method, mode):
        x = _rand((20,))
        y = _rand((7,), seed=1)
        got = getattr(tsig, func)(x, y, mode=mode, method=method)
        exp = getattr(sps, func)(x, y, mode=mode, method=method)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("func", ["convolve", "correlate"])
    def test_2d(self, func, mode):
        x = _rand((12, 13))
        y = _rand((4, 5), seed=2)
        got = getattr(tsig, func)(x, y, mode=mode, method="direct")
        exp = getattr(sps, func)(x, y, mode=mode, method="direct")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    @pytest.mark.parametrize("func", ["convolve", "correlate"])
    def test_complex(self, func):
        x = _rand((14,), np.complex128)
        y = _rand((5,), np.complex128, seed=3)
        for method in ("direct", "fft"):
            got = getattr(tsig, func)(x, y, method=method)
            exp = getattr(sps, func)(x, y, method=method)
            np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                       atol=1e-10, err_msg=method)

    def test_int_exact(self):
        x = _rand((15,), np.int32)
        y = _rand((4,), np.int32, seed=4)
        got = tsig.convolve(x, y)
        exp = sps.convolve(x, y)
        assert np.asarray(got).dtype.kind in "i"
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_valid_swap(self, mode):
        x = _rand((5,))
        y = _rand((12,), seed=5)
        got = tsig.correlate(x, y, mode=mode, method="direct")
        exp = sps.correlate(x, y, mode=mode, method="direct")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_auto(self):
        x = _rand((100,))
        y = _rand((80,), seed=6)
        got = tsig.convolve(x, y, method="auto")
        exp = sps.convolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-9)

    def test_choose_conv_method_returns_valid(self):
        x = _rand((1000,))
        y = _rand((500,), seed=7)
        assert tsig.choose_conv_method(x, y) in ("fft", "direct")


class TestFFTConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_1d(self, mode):
        x = _rand((50,))
        y = _rand((13,), seed=1)
        got = tsig.fftconvolve(x, y, mode=mode)
        exp = sps.fftconvolve(x, y, mode=mode)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_2d(self):
        x = _rand((24, 25))
        y = _rand((6, 7), seed=2)
        got = tsig.fftconvolve(x, y)
        exp = sps.fftconvolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_axes(self):
        x = _rand((4, 30))
        y = _rand((4, 8), seed=3)
        got = tsig.fftconvolve(x, y, axes=[1])
        exp = sps.fftconvolve(x, y, axes=[1])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_complex(self):
        x = _rand((20,), np.complex128)
        y = _rand((20,), np.complex128, seed=4)
        got = tsig.fftconvolve(x, y)
        exp = sps.fftconvolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)


class TestOAConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_long_signal(self, mode):
        x = _rand((500,))
        y = _rand((17,), seed=1)
        got = tsig.oaconvolve(x, y, mode=mode)
        exp = sps.oaconvolve(x, y, mode=mode)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_2d(self):
        x = _rand((200, 10))
        y = _rand((11, 10), seed=2)
        got = tsig.oaconvolve(x, y)
        exp = sps.oaconvolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_equal_shapes_fallback(self):
        x = _rand((32,))
        y = _rand((32,), seed=3)
        got = tsig.oaconvolve(x, y)
        exp = sps.oaconvolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_swapped(self):
        x = _rand((17,))
        y = _rand((500,), seed=4)
        got = tsig.oaconvolve(x, y)
        exp = sps.oaconvolve(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)


class TestConvolve2d:
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("func", ["convolve2d", "correlate2d"])
    def test_modes(self, func, mode, boundary):
        x = _rand((13, 14))
        y = _rand((4, 3), seed=1)
        got = getattr(tsig, func)(x, y, mode=mode, boundary=boundary,
                                  fillvalue=0.5)
        exp = getattr(sps, func)(x, y, mode=mode, boundary=boundary,
                                 fillvalue=0.5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_complex(self):
        x = _rand((10, 11), np.complex128)
        y = _rand((3, 4), np.complex128, seed=2)
        got = tsig.correlate2d(x, y)
        exp = sps.correlate2d(x, y)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)


class TestWienerHilbert:
    def test_wiener(self):
        x = _rand((16, 17))
        got = tsig.wiener(x, 5)
        exp = sps.wiener(x, 5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_wiener_noise(self):
        x = _rand((30,))
        got = tsig.wiener(x, 5, noise=0.5)
        exp = sps.wiener(x, 5, noise=0.5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    @pytest.mark.parametrize("n", [16, 17])
    def test_hilbert(self, n):
        x = _rand((n,))
        got = tsig.hilbert(x)
        exp = sps.hilbert(x)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_hilbert_axis(self):
        x = _rand((8, 20))
        got = tsig.hilbert(x, axis=1)
        exp = sps.hilbert(x, axis=1)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)

    def test_hilbert2(self):
        x = _rand((12, 13))
        got = tsig.hilbert2(x)
        exp = sps.hilbert2(x)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                   atol=1e-10)


class TestResample:
    @pytest.mark.parametrize("num", [16, 32, 50, 63])
    def test_resample_real(self, num):
        x = _rand((48,))
        got = tsig.resample(x, num)
        exp = sps.resample(x, num)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_resample_complex(self):
        x = _rand((40,), np.complex128)
        got = tsig.resample(x, 25)
        exp = sps.resample(x, 25)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_resample_window(self):
        x = _rand((36,))
        got = tsig.resample(x, 24, window="hamming")
        exp = sps.resample(x, 24, window="hamming")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_resample_axis(self):
        x = _rand((6, 30))
        got = tsig.resample(x, 20, axis=1)
        exp = sps.resample(x, 20, axis=1)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    @pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 5), (7, 3)])
    def test_resample_poly(self, up, down):
        x = _rand((53,))
        got = tsig.resample_poly(x, up, down)
        exp = sps.resample_poly(x, up, down)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    @pytest.mark.parametrize(
        "padtype",
        ["constant", "mean", "median", "minimum", "maximum", "line",
         "edge", "wrap", "symmetric", "reflect", "smooth", "antisymmetric",
         "antireflect"],
    )
    def test_resample_poly_padtypes(self, padtype):
        x = _rand((40,))
        got = tsig.resample_poly(x, 3, 2, padtype=padtype)
        exp = sps.resample_poly(x, 3, 2, padtype=padtype)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)

    def test_resample_poly_axis(self):
        x = _rand((5, 40))
        got = tsig.resample_poly(x, 2, 3, axis=1)
        exp = sps.resample_poly(x, 2, 3, axis=1)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8,
                                   atol=1e-9)


class TestMxFFT:
    """MXU matmul-FFT path (ops/mxfft) forced on the CPU tier."""


    def _force(self, monkeypatch):
        from cupyimg_tpu.core.config import config
        monkeypatch.setattr(config, "use_mxfft", "1")

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_fftconvolve_2d_mxfft(self, mode, monkeypatch):
        self._force(monkeypatch)
        rs = np.random.RandomState(11)
        x = rs.randn(120, 130).astype(np.float32)
        k = rs.randn(17, 9).astype(np.float32)
        got = tsig.fftconvolve(jnp.asarray(x), jnp.asarray(k),
                                 mode=mode)
        exp = sps.fftconvolve(x.astype(np.float64),
                               k.astype(np.float64), mode=mode)
        assert np.abs(np.asarray(got, np.float64) - exp).max() < 1e-3

    def test_fftconvolve_1d_and_axes_mxfft(self, monkeypatch):
        self._force(monkeypatch)
        rs = np.random.RandomState(12)
        x = rs.randn(5, 1000).astype(np.float32)
        k = rs.randn(5, 101).astype(np.float32)
        got = tsig.fftconvolve(jnp.asarray(x), jnp.asarray(k),
                                 mode="same", axes=[1])
        exp = sps.fftconvolve(x.astype(np.float64),
                               k.astype(np.float64), mode="same",
                               axes=[1])
        assert np.abs(np.asarray(got, np.float64) - exp).max() < 1e-3

    def test_mxfft_falls_back_unfactorable(self, monkeypatch):
        self._force(monkeypatch)
        from cupyimg_tpu.ops import mxfft
        # prime full-length => can_handle False on CPU (no 64-rounding)
        assert not mxfft.can_handle(97)
        rs = np.random.RandomState(13)
        x = rs.randn(89).astype(np.float32)
        k = rs.randn(9).astype(np.float32)   # full len 97, prime
        got = tsig.fftconvolve(jnp.asarray(x), jnp.asarray(k))
        exp = sps.fftconvolve(x.astype(np.float64),
                               k.astype(np.float64))
        assert np.abs(np.asarray(got, np.float64) - exp).max() < 1e-3

    def test_mxfft_f64_stays_on_reference_path(self, monkeypatch):
        self._force(monkeypatch)
        rs = np.random.RandomState(14)
        x = rs.randn(64, 64)
        k = rs.randn(7, 7)
        got = tsig.fftconvolve(jnp.asarray(x), jnp.asarray(k),
                                 mode="same")
        exp = sps.fftconvolve(x, k, mode="same")
        assert np.abs(np.asarray(got) - exp).max() < 1e-10


def test_choose_conv_method_measure_returns_times():
    """measure=True returns (method, times) like scipy."""
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(128))
    y = jnp.asarray(np.random.RandomState(1).rand(17))
    method, times = tsig.choose_conv_method(x, y, measure=True)
    assert method in ("fft", "direct")
    assert set(times) == {"fft", "direct"}
    assert all(t > 0 for t in times.values())
