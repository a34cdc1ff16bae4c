"""ndimage filters vs scipy.ndimage (oracle at test time).

Mirrors the reference's direct-vs-SciPy tier
(cupyimg/scipy/ndimage/tests/test_ndimage_vs_scipy.py:24-52 approach):
parametrize over shape x size x mode x origin x dtype, call scipy on the
same inputs, compare at upstream tolerances.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import cupyimg_tpu.scipy.ndimage as tndi

MODES = ["reflect", "constant", "nearest", "mirror", "wrap"]


def _rand(shape, dtype, seed=0):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind == "c":
        x = rng.randn(*shape) + 1j * rng.randn(*shape)
    elif np.dtype(dtype).kind in "iu":
        x = rng.randint(-30, 30, size=shape)
    else:
        x = rng.randn(*shape)
    return x.astype(dtype)


class TestCorrelateConvolve:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("ksize", [(1, 3), (3, 3), (2, 4), (5, 1)])
    @pytest.mark.parametrize("func", ["correlate", "convolve"])
    def test_2d_vs_scipy(self, func, ksize, mode):
        x = _rand((13, 17), np.float64)
        w = _rand(ksize, np.float64, seed=1)
        got = getattr(tndi, func)(x, w, mode=mode, cval=1.5)
        exp = getattr(ndi, func)(x, w, mode=mode, cval=1.5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("origin", [-1, 0, 1])
    @pytest.mark.parametrize("func", ["correlate", "convolve"])
    def test_origin(self, func, origin):
        x = _rand((20,), np.float64)
        w = _rand((4,), np.float64, seed=2)
        got = getattr(tndi, func)(x, w, origin=origin)
        exp = getattr(ndi, func)(x, w, origin=origin)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    @pytest.mark.parametrize("dtype", [np.int32, np.uint8, np.float32])
    @pytest.mark.parametrize("func", ["correlate", "convolve"])
    def test_dtypes(self, func, dtype):
        x = _rand((11, 12), dtype)
        w = _rand((3, 3), np.float64, seed=3)
        got = getattr(tndi, func)(x, w, mode="nearest")
        exp = getattr(ndi, func)(x, w, mode="nearest")
        assert np.asarray(got).dtype == exp.dtype
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-6, atol=1e-6)

    def test_3d(self):
        x = _rand((8, 9, 10), np.float64)
        w = _rand((3, 1, 2), np.float64, seed=4)
        got = tndi.correlate(x, w, mode="mirror")
        exp = ndi.correlate(x, w, mode="mirror")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12, atol=1e-12)

    def test_complex(self):
        x = _rand((10, 11), np.complex128)
        w = _rand((3, 3), np.complex128, seed=5)
        # scipy.ndimage has no complex support; oracle = explicit sum.
        got = np.asarray(tndi.correlate(x, w, mode="nearest"))
        exp = ndi.correlate(x.real, w.real.copy(), mode="nearest").astype(
            complex
        )
        exp += ndi.correlate(x.imag, w.imag.copy(), mode="nearest")
        exp += 1j * (
            ndi.correlate(x.imag, w.real.copy(), mode="nearest")
            - ndi.correlate(x.real, w.imag.copy(), mode="nearest")
        )
        # correlate conjugates complex weights (numpy.correlate convention)
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_sparse_weights_static_skip(self):
        """Zero taps in concrete weights must not affect the result
        (replaces the reference's use_weights_mask path)."""
        x = _rand((16, 16), np.float64)
        w = np.zeros((5, 5))
        w[0, 0] = 1.2
        w[4, 2] = -0.5
        got = tndi.correlate(x, w, use_weights_mask=True)
        exp = ndi.correlate(x, w)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    def test_conv_path_large_kernel(self):
        """Kernels above the tap threshold route through lax.conv."""
        import jax.numpy as jnp

        x = _rand((40, 40), np.float32)
        w = _rand((7, 7), np.float32, seed=6)
        got = tndi.correlate(x, jnp.asarray(w), mode="reflect",
                             dtype_mode="float")
        exp = ndi.correlate(x.astype(np.float64), w.astype(np.float64),
                            mode="reflect")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-4)


class TestCorrelate1d:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("ksize", [1, 2, 3, 6])
    @pytest.mark.parametrize("origin", [0, 1])
    @pytest.mark.parametrize("func", ["correlate1d", "convolve1d"])
    def test_vs_scipy(self, func, ksize, mode, origin):
        if origin >= (ksize + 1) // 2 and func == "convolve1d":
            pytest.skip("invalid origin for size")
        if ksize // 2 + origin >= ksize:
            pytest.skip("invalid origin for size")
        x = _rand((7, 30), np.float64)
        w = _rand((ksize,), np.float64, seed=7)
        got = getattr(tndi, func)(x, w, axis=-1, mode=mode, cval=-2.0,
                                  origin=origin)
        exp = getattr(ndi, func)(x, w, axis=-1, mode=mode, cval=-2.0,
                                 origin=origin)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    def test_axis0(self):
        x = _rand((12, 5), np.float64)
        w = _rand((3,), np.float64, seed=8)
        got = tndi.correlate1d(x, w, axis=0)
        exp = ndi.correlate1d(x, w, axis=0)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    def test_full_crop_false(self):
        """crop=False 'full' extension (reference filters.py:213-438)."""
        x = _rand((20,), np.float64)
        w = _rand((5,), np.float64, seed=9)
        got = np.asarray(
            tndi.convolve1d(x, w, mode="constant", cval=0.0, crop=False)
        )
        exp = np.convolve(x, w, mode="full")
        np.testing.assert_allclose(got, exp, rtol=1e-12)


class TestSeparable:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("size", [2, 3, 5])
    def test_uniform_filter(self, size, mode):
        x = _rand((20, 21), np.float64)
        got = tndi.uniform_filter(x, size=size, mode=mode, cval=3.0)
        exp = ndi.uniform_filter(x, size=size, mode=mode, cval=3.0)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10, atol=1e-12)

    def test_uniform_filter_3d_benchmark_config(self):
        x = _rand((16, 17, 18), np.float32)
        got = tndi.uniform_filter(x, size=5)
        exp = ndi.uniform_filter(x, size=5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    def test_uniform_filter_int(self):
        x = _rand((15, 15), np.int32)
        got = tndi.uniform_filter(x, size=3)
        exp = ndi.uniform_filter(x, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("order", [0, 1, 2, 3])
    @pytest.mark.parametrize("mode", MODES)
    def test_gaussian_filter1d(self, order, mode):
        x = _rand((40,), np.float64)
        got = tndi.gaussian_filter1d(x, 2.3, order=order, mode=mode, cval=1.0)
        exp = ndi.gaussian_filter1d(x, 2.3, order=order, mode=mode, cval=1.0)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("sigma", [0.5, 1.5, (1.0, 2.0)])
    def test_gaussian_filter(self, sigma):
        x = _rand((20, 24), np.float64)
        got = tndi.gaussian_filter(x, sigma)
        exp = ndi.gaussian_filter(x, sigma)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10, atol=1e-12)

    def test_gaussian_truncate_radius(self):
        x = _rand((30,), np.float64)
        got = tndi.gaussian_filter1d(x, 1.0, truncate=2.0)
        exp = ndi.gaussian_filter1d(x, 1.0, truncate=2.0)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)


class TestDerivatives:
    @pytest.mark.parametrize("axis", [0, 1, -1])
    @pytest.mark.parametrize("func", ["prewitt", "sobel"])
    def test_prewitt_sobel(self, func, axis):
        x = _rand((14, 16), np.float64)
        got = getattr(tndi, func)(x, axis=axis)
        exp = getattr(ndi, func)(x, axis=axis)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12)

    def test_laplace(self):
        x = _rand((14, 16), np.float64)
        np.testing.assert_allclose(
            np.asarray(tndi.laplace(x)), ndi.laplace(x), rtol=1e-12
        )

    def test_gaussian_laplace(self):
        x = _rand((14, 16), np.float64)
        np.testing.assert_allclose(
            np.asarray(tndi.gaussian_laplace(x, 1.5)),
            ndi.gaussian_laplace(x, 1.5),
            rtol=1e-10,
            atol=1e-12,
        )

    def test_gaussian_gradient_magnitude(self):
        x = _rand((14, 16), np.float64)
        np.testing.assert_allclose(
            np.asarray(tndi.gaussian_gradient_magnitude(x, 1.5)),
            ndi.gaussian_gradient_magnitude(x, 1.5),
            rtol=1e-10,
            atol=1e-12,
        )

    def test_generic_laplace_custom(self):
        x = _rand((10, 11), np.float64)

        def d2(inp, axis, output, mode, cval):
            return tndi.correlate1d(
                inp, np.array([1.0, -2.0, 1.0]), axis, output, mode, cval
            )

        def d2_sp(inp, axis, output, mode, cval):
            return ndi.correlate1d(
                inp, np.array([1.0, -2.0, 1.0]), axis, output, mode, cval
            )

        np.testing.assert_allclose(
            np.asarray(tndi.generic_laplace(x, d2)),
            ndi.generic_laplace(x, d2_sp),
            rtol=1e-12,
        )


class TestMinMax:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("size", [2, 3, (3, 5)])
    @pytest.mark.parametrize("func", ["minimum_filter", "maximum_filter"])
    def test_separable(self, func, size, mode):
        x = _rand((18, 19), np.float64)
        got = getattr(tndi, func)(x, size=size, mode=mode, cval=0.5)
        exp = getattr(ndi, func)(x, size=size, mode=mode, cval=0.5)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("func", ["minimum_filter", "maximum_filter"])
    def test_footprint(self, func):
        x = _rand((18, 19), np.float64)
        fp = np.array([[1, 0, 1], [0, 1, 0], [1, 1, 0]], bool)
        got = getattr(tndi, func)(x, footprint=fp)
        exp = getattr(ndi, func)(x, footprint=fp)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("origin", [-1, 0, 1])
    @pytest.mark.parametrize("func", ["minimum_filter", "maximum_filter"])
    def test_footprint_origin(self, func, origin):
        x = _rand((18, 19), np.float64)
        fp = np.array([[1, 0, 1], [0, 1, 0], [1, 1, 0]], bool)
        got = getattr(tndi, func)(x, footprint=fp, origin=origin)
        exp = getattr(ndi, func)(x, footprint=fp, origin=origin)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("size", [2, 3, 5])
    @pytest.mark.parametrize("origin", [-1, 0, 1])
    @pytest.mark.parametrize("func", ["minimum_filter1d", "maximum_filter1d"])
    def test_1d(self, func, size, origin):
        if size // 2 + origin < 0 or size // 2 + origin >= size:
            pytest.skip("invalid origin")
        x = _rand((6, 25), np.float64)
        got = getattr(tndi, func)(x, size, axis=-1, origin=origin)
        exp = getattr(ndi, func)(x, size, axis=-1, origin=origin)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_int_dtype(self):
        x = _rand((12, 13), np.int32)
        got = tndi.maximum_filter(x, size=3)
        exp = ndi.maximum_filter(x, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)


class TestRank:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("size", [3, (3, 5)])
    def test_median(self, size, mode):
        x = _rand((17, 18), np.float64)
        got = tndi.median_filter(x, size=size, mode=mode, cval=0.1)
        exp = ndi.median_filter(x, size=size, mode=mode, cval=0.1)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("rank", [0, 2, 5, -2])
    def test_rank(self, rank):
        x = _rand((15, 16), np.float64)
        got = tndi.rank_filter(x, rank, size=3)
        exp = ndi.rank_filter(x, rank, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("percentile", [0, 25, 50, 75, 100, -25])
    def test_percentile(self, percentile):
        x = _rand((15, 16), np.float64)
        got = tndi.percentile_filter(x, percentile, size=3)
        exp = ndi.percentile_filter(x, percentile, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_footprint(self):
        x = _rand((15, 16), np.float64)
        fp = np.array([[1, 0, 1], [1, 1, 0], [0, 1, 1]], bool)
        got = tndi.median_filter(x, footprint=fp)
        exp = ndi.median_filter(x, footprint=fp)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_median_int(self):
        x = _rand((13, 14), np.int32)
        got = tndi.median_filter(x, size=3)
        exp = ndi.median_filter(x, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)


class TestGenericFilter:
    """generic_filter/generic_filter1d — absent in the reference
    (its filters.py:62 TODO); jnp-traceable callback contract."""

    def test_mean_matches_scipy(self):
        import jax.numpy as jnp

        x = np.random.RandomState(0).rand(20, 21)
        got = np.asarray(
            tndi.generic_filter(x, jnp.mean, size=3, mode="nearest")
        )
        exp = ndi.generic_filter(x, np.mean, size=3, mode="nearest")
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_footprint_and_extra_args(self):
        import jax.numpy as jnp

        x = np.random.RandomState(1).rand(16, 17)
        fp = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
        got = np.asarray(
            tndi.generic_filter(
                x,
                lambda w, p: jnp.sum(w**p),
                footprint=fp,
                mode="mirror",
                extra_arguments=(2,),
            )
        )
        exp = ndi.generic_filter(
            x,
            lambda w, p: np.sum(w**p),
            footprint=fp,
            mode="mirror",
            extra_arguments=(2,),
        )
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_generic_filter1d(self):
        x = np.random.RandomState(2).rand(12, 30)

        def f1(iline):
            return (iline[:-2] + iline[1:-1] + iline[2:]) / 3

        got = np.asarray(
            tndi.generic_filter1d(x, f1, 3, axis=1, mode="reflect")
        )
        exp = ndi.uniform_filter1d(x, 3, axis=1, mode="reflect")
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_wrong_line_length_raises(self):
        with pytest.raises(RuntimeError):
            tndi.generic_filter1d(
                np.zeros((4, 8)), lambda l: l, 3, axis=1
            )


def test_symmetric_fold_matches_scipy_int_truncation():
    """Symmetric 1-d kernels fold pairs scipy-style; integer truncation
    amplifies last-ulp accumulation-order differences to +-1, so the
    knife-edge case from fuzzing is pinned here."""
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    x = (rng.rand(10, 4, 10) * 50).astype(np.int32)
    sig = (0.651821334896423, 1.27756594638148, 0.4843048984600131)
    got = np.asarray(tndi.gaussian_filter(jnp.asarray(x), sig,
                                          mode="reflect", cval=1.0))
    exp = ndi.gaussian_filter(x, sig, mode="reflect", cval=1.0)
    np.testing.assert_array_equal(got, exp)


def test_antisymmetric_fold_parity():
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    x = rng.randn(17, 18)
    w = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    got = np.asarray(tndi.correlate1d(jnp.asarray(x), jnp.asarray(w),
                                      axis=1, mode="mirror"))
    exp = ndi.correlate1d(x, w, axis=1, mode="mirror")
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)
