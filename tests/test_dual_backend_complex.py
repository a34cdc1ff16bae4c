"""Complex-dtype dual-backend tier (reference README.md:154-158: complex
support is a headline extension over scipy/cupy of its era; scipy >= 1.6
now provides the oracle directly)."""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing


def _cimg(shape=(14, 15), seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) + 1j * rng.rand(*shape)).astype(np.complex128)


@pytest.mark.parametrize("mode", ["reflect", "constant", "wrap"])
@pytest.mark.parametrize("op", ["correlate", "convolve"])
def test_complex_correlate_convolve(op, mode):
    w = np.random.RandomState(1).rand(3, 4)

    @testing.numpy_cupyimg_allclose(rtol=1e-10, atol=1e-10,
                                    scipy_name="scp")
    def run(xp, scp):
        x = xp.asarray(_cimg())
        return getattr(scp.ndimage, op)(x, xp.asarray(w), mode=mode,
                                        cval=0.0)

    run()


def test_complex_weights_correlate_conjugate():
    # complex weights: correlate uses conj(weights) (scipy semantics)
    wc = _cimg((3, 3), seed=2)

    @testing.numpy_cupyimg_allclose(rtol=1e-10, atol=1e-10,
                                    scipy_name="scp")
    def run(xp, scp):
        x = xp.asarray(_cimg(seed=3))
        return scp.ndimage.correlate(x, xp.asarray(wc))

    run()


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("fn", ["shift", "zoom"])
def test_complex_interpolation(fn, order):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        x = xp.asarray(_cimg(seed=4))
        if fn == "shift":
            return scp.ndimage.shift(x, (1.3, -0.7), order=order)
        return scp.ndimage.zoom(x, 1.4, order=order)

    run()


def test_complex_affine():
    # offset -0.31 (not -0.3): with -0.3 the source column for output
    # (5, 14) lands EXACTLY on the domain edge 14.0 and last-ulp
    # rounding decides in/out of domain differently per backend
    m = np.array([[0.95, 0.1], [-0.08, 1.05]])

    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        x = xp.asarray(_cimg(seed=5))
        return scp.ndimage.affine_transform(x, xp.asarray(m),
                                            offset=(0.5, -0.31), order=1)

    run()


@pytest.mark.parametrize("fn", ["fourier_gaussian", "fourier_uniform",
                                "fourier_shift"])
def test_complex_fourier(fn):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(6)
        fx = np.fft.fftn(rng.rand(16, 18))
        arg = {"fourier_gaussian": 2.0, "fourier_uniform": 5,
               "fourier_shift": (1.5, -2.5)}[fn]
        return getattr(scp.ndimage, fn)(xp.asarray(fx), arg)

    run()


def test_complex_fftconvolve():
    import cupyimg_tpu.scipy.signal as csig
    import scipy.signal as ssig

    x = _cimg((64, 60), seed=7)
    k = _cimg((7, 9), seed=8)
    import jax.numpy as jnp

    got = np.asarray(csig.fftconvolve(jnp.asarray(x), jnp.asarray(k),
                                      mode="same"))
    exp = ssig.fftconvolve(x, k, mode="same")
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_complex_uniform_and_gaussian_filter():
    @testing.numpy_cupyimg_allclose(rtol=1e-10, atol=1e-10,
                                    scipy_name="scp")
    def run(xp, scp):
        x = xp.asarray(_cimg(seed=9))
        return scp.ndimage.uniform_filter(x, 3)

    run()

    @testing.numpy_cupyimg_allclose(rtol=1e-10, atol=1e-10,
                                    scipy_name="scp")
    def run2(xp, scp):
        x = xp.asarray(_cimg(seed=10))
        return scp.ndimage.gaussian_filter(x, 1.5)

    run2()
