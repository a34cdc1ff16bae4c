"""Reference scipy.signal signaltools suite port.

Mirrors the semantic ground of
/root/reference/cupyimg/scipy/signal/tests/test_signaltools.py (itself
adapted from upstream SciPy), rewritten against the in-env scipy.signal
oracle: every numeric expectation here is computed by scipy at test time
rather than hard-coded, which covers the same cases with a stronger
check.  Literal regression vectors are kept only where they pin a
specific historical bug (gh-5897 input swapping).
"""

import numpy as np
import pytest
import scipy.signal as ssig

import jax.numpy as jnp

import cupyimg_tpu.scipy.signal as tsig


def _assert_close(got, exp, **kw):
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), **kw)


def _rand(shape, dtype=np.float64, seed=0):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind == "c":
        return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(dtype)
    if np.dtype(dtype).kind in "iub":
        return rng.randint(0, 5, size=shape).astype(dtype)
    return rng.randn(*shape).astype(dtype)


# ---------------------------------------------------------------------------
# convolve
# ---------------------------------------------------------------------------


class TestConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize(
        "na,nb", [(6, 3), (3, 4), (3, 3), (1, 1), (9, 6)]
    )
    def test_1d_vs_scipy(self, mode, na, nb):
        a = _rand((na,), seed=na)
        b = _rand((nb,), seed=nb + 17)
        got = tsig.convolve(jnp.asarray(a), jnp.asarray(b), mode=mode)
        exp = ssig.convolve(a, b, mode=mode)
        _assert_close(got, exp, rtol=1e-10, atol=1e-12)

    def test_basic_ints(self):
        got = tsig.convolve(jnp.asarray([3, 4, 5, 6, 5, 4]),
                            jnp.asarray([1, 2, 3]))
        np.testing.assert_array_equal(
            np.asarray(got), [3, 10, 22, 28, 32, 32, 23, 12]
        )

    def test_complex(self):
        x = np.array([1 + 1j, 2 + 1j, 3 + 1j])
        y = np.array([1 + 1j, 2 + 1j])
        got = tsig.convolve(jnp.asarray(x), jnp.asarray(y))
        _assert_close(got, ssig.convolve(x, y), rtol=1e-12)

    def test_zero_rank(self):
        got = tsig.convolve(jnp.asarray(1289), jnp.asarray(4567))
        assert int(got) == 1289 * 4567

    def test_single_element(self):
        got = tsig.convolve(jnp.asarray([4967]), jnp.asarray([3920]))
        np.testing.assert_array_equal(np.asarray(got), [4967 * 3920])

    def test_broadcastable_fft_vs_direct(self):
        a = jnp.arange(27.0).reshape(3, 3, 3)
        b = jnp.arange(3.0)
        for i in range(3):
            b_shape = [1, 1, 1]
            b_shape[i] = 3
            x = tsig.convolve(a, b.reshape(b_shape), method="direct")
            y = tsig.convolve(a, b.reshape(b_shape), method="fft")
            _assert_close(x, y, rtol=1e-8, atol=1e-8)

    def test_2d_arrays(self):
        a = np.array([[1, 2, 3], [3, 4, 5]])
        b = np.array([[2, 3, 4], [4, 5, 6]])
        got = tsig.convolve(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_array_equal(np.asarray(got), ssig.convolve(a, b))

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_input_swapping_3d(self, mode):
        # gh-5897: convolve(small, big) must equal scipy's result for
        # both argument orders, complex included
        small = np.arange(8.0).reshape(2, 2, 2)
        big = 1j * np.arange(27.0).reshape(3, 3, 3)
        big += np.arange(27.0)[::-1].reshape(3, 3, 3)
        for x, y in ((small, big), (big, small)):
            got = tsig.convolve(jnp.asarray(x), jnp.asarray(y), mode)
            exp = ssig.convolve(x, y, mode)
            _assert_close(got, exp, rtol=1e-12, atol=1e-12)

    def test_valid_mode2(self):
        # gh-5897 literal vectors
        a = jnp.asarray([1, 2, 3, 6, 5, 3])
        b = jnp.asarray([2, 3, 4, 5, 3, 4, 2, 2, 1])
        expected = [70, 78, 73, 65]
        np.testing.assert_array_equal(
            np.asarray(tsig.convolve(a, b, "valid")), expected
        )
        np.testing.assert_array_equal(
            np.asarray(tsig.convolve(b, a, "valid")), expected
        )
        ac = jnp.asarray([1 + 5j, 2 - 1j, 3 + 0j])
        bc = jnp.asarray([2 - 3j, 1 + 0j])
        expc = [2 - 3j, 8 - 10j]
        _assert_close(tsig.convolve(ac, bc, "valid"), expc, rtol=1e-12)
        _assert_close(tsig.convolve(bc, ac, "valid"), expc, rtol=1e-12)

    def test_invalid_params(self):
        a = jnp.asarray([3.0, 4.0, 5.0])
        b = jnp.asarray([1.0, 2.0, 3.0])
        for kw in (
            {"mode": "spam"},
            {"mode": "eggs", "method": "fft"},
            {"mode": "ham", "method": "direct"},
            {"mode": "full", "method": "bacon"},
            {"mode": "same", "method": "bacon"},
        ):
            with pytest.raises(ValueError):
                tsig.convolve(a, b, **kw)

    def test_invalid_shapes(self):
        a = jnp.arange(1, 7).reshape((2, 3))
        b = jnp.arange(-6, 0).reshape((3, 2))
        with pytest.raises(ValueError):
            tsig.convolve(a, b, mode="valid")
        with pytest.raises(ValueError):
            tsig.convolve(b, a, mode="valid")

    def test_mismatched_dims(self):
        for args in (([1], 2), (1, [2]), ([1], [[2]]), ([3], 2)):
            with pytest.raises(ValueError):
                tsig.convolve(*args, method="direct")
        for args in (([1], 2), (1, [2])):
            with pytest.raises(ValueError):
                tsig.convolve(*args, method="fft")

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize(
        "t1,t2",
        [
            ("float32", "float32"),
            ("float32", "float64"),
            ("float64", "float64"),
            ("int32", "int32"),
            ("int32", "float64"),
            ("uint8", "uint8"),
            ("bool", "bool"),
            ("bool", "float64"),
            ("complex64", "complex64"),
            ("complex128", "float64"),
            ("complex128", "complex128"),
            ("float16", "float16"),
        ],
    )
    def test_method_dtype_consistency(self, mode, t1, t2):
        # fft and direct must produce the same dtype and agree numerically
        n = 40
        rng = np.random.RandomState(42)
        base_i = rng.choice([0, 1], size=n)
        base_f = rng.randn(n)

        def mk(t):
            k = np.dtype(t).kind
            if k in "iub":
                return base_i.astype(t)
            if k == "c":
                return (base_f + 0.5j * base_f).astype(t)
            return base_f.astype(t)

        x1, x2 = mk(t1), mk(t2)
        res = {
            m: tsig.convolve(jnp.asarray(x1), jnp.asarray(x2),
                             method=m, mode=mode)
            for m in ("fft", "direct")
        }
        assert res["fft"].dtype == res["direct"].dtype
        if t1 == "bool" and t2 == "bool":
            assert tsig.choose_conv_method(
                jnp.asarray(x1), jnp.asarray(x2)
            ) == "direct"
            return
        if "float16" in (t1, t2):
            kw = {"rtol": 1e-3, "atol": 1e-3}
        elif {"complex64", "float32"} & {t1, t2}:
            kw = {"rtol": 1e-4, "atol": 1e-5}
        else:
            kw = {"rtol": 1e-5, "atol": 1e-8}
        _assert_close(res["fft"], res["direct"], **kw)

    def test_method_large_int_exact(self):
        # large-int inputs must stay exact (routed to direct when the
        # fft float64 round-trip would lose bits); int64 needs the x64
        # switch the test conftest enables
        for n in [10, 14, 20, 26]:
            z = jnp.asarray([2 ** n], dtype=jnp.int64)
            fft = tsig.convolve(z, z, method="fft")
            direct = tsig.convolve(z, z, method="direct")
            assert int(fft[0]) == int(direct[0]) == 2 ** (2 * n)


# ---------------------------------------------------------------------------
# convolve2d / correlate2d
# ---------------------------------------------------------------------------


class TestConvolve2d:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    @pytest.mark.parametrize("fillvalue", [0, 1])
    def test_vs_scipy(self, mode, boundary, fillvalue):
        if boundary != "fill" and fillvalue != 0:
            pytest.skip("fillvalue only used with fill")
        a = _rand((5, 7), seed=3)
        b = _rand((3, 4), seed=4)
        got = tsig.convolve2d(jnp.asarray(a), jnp.asarray(b), mode,
                              boundary, fillvalue)
        exp = ssig.convolve2d(a, b, mode, boundary, fillvalue)
        _assert_close(got, exp, rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
    def test_correlate2d_vs_scipy(self, mode, boundary):
        a = _rand((6, 5), seed=5)
        b = _rand((2, 3), seed=6)
        got = tsig.correlate2d(jnp.asarray(a), jnp.asarray(b), mode,
                               boundary)
        exp = ssig.correlate2d(a, b, mode, boundary)
        _assert_close(got, exp, rtol=1e-10, atol=1e-12)

    def test_complex_vs_scipy(self):
        a = _rand((4, 6), np.complex128, seed=7)
        b = _rand((3, 3), np.complex128, seed=8)
        for f_t, f_s in ((tsig.convolve2d, ssig.convolve2d),
                         (tsig.correlate2d, ssig.correlate2d)):
            got = f_t(jnp.asarray(a), jnp.asarray(b), "same")
            _assert_close(got, f_s(a, b, "same"), rtol=1e-10, atol=1e-12)

    def test_valid_mode_swapped(self):
        # gh-5897 literal vectors
        e = jnp.asarray([[1, 2, 3], [3, 4, 5]])
        f = jnp.asarray([[2, 3, 4, 5, 6, 7, 8], [4, 5, 6, 7, 8, 9, 10]])
        expected = [[62, 80, 98, 116, 134]]
        np.testing.assert_array_equal(
            np.asarray(tsig.convolve2d(e, f, "valid")), expected
        )
        np.testing.assert_array_equal(
            np.asarray(tsig.convolve2d(f, e, "valid")), expected
        )

    def test_fillvalue(self):
        a = np.array([[1, 2, 3], [3, 4, 5]])
        b = np.array([[2, 3, 4], [4, 5, 6]])
        got = tsig.convolve2d(jnp.asarray(a), jnp.asarray(b), "full",
                              "fill", 1)
        np.testing.assert_array_equal(
            np.asarray(got), ssig.convolve2d(a, b, "full", "fill", 1)
        )

    def test_fillvalue_errors(self):
        with pytest.raises(ValueError):
            tsig.convolve2d([[1]], [[1, 2]], fillvalue=1j)
        with pytest.raises(ValueError):
            tsig.convolve2d([[1]], [[1, 2]], fillvalue=[1, 2])
        with pytest.raises(ValueError):
            tsig.convolve2d([[1]], [[1, 2]], fillvalue=[])

    def test_invalid_boundary(self):
        with pytest.raises(ValueError):
            tsig.convolve2d([[1]], [[1, 2]], boundary="spam")

    def test_invalid_dims(self):
        with pytest.raises(ValueError):
            tsig.convolve2d(3, 4)
        with pytest.raises(ValueError):
            tsig.convolve2d([3], [4])
        with pytest.raises(ValueError):
            tsig.convolve2d([[[3]]], [[[4]]])

    def test_invalid_shapes(self):
        a = jnp.arange(1, 7).reshape((2, 3))
        b = jnp.arange(-6, 0).reshape((3, 2))
        with pytest.raises(ValueError):
            tsig.convolve2d(a, b, mode="valid")
        with pytest.raises(ValueError):
            tsig.convolve2d(b, a, mode="valid")

    def test_consistency_convolve_funcs(self):
        a = np.arange(5.0)
        b = np.array([3.2, 1.4, 3])
        for mode in ["full", "valid", "same"]:
            _assert_close(
                tsig.convolve(jnp.asarray(a), jnp.asarray(b), mode=mode),
                np.convolve(a, b, mode=mode), rtol=1e-12,
            )
            _assert_close(
                jnp.squeeze(
                    tsig.convolve2d(jnp.asarray(a[None]),
                                    jnp.asarray(b[None]), mode=mode)
                ),
                np.convolve(a, b, mode=mode), rtol=1e-12,
            )


# ---------------------------------------------------------------------------
# fftconvolve / oaconvolve
# ---------------------------------------------------------------------------


class TestFFTConvolve:
    @pytest.mark.parametrize("axes", [None, [0], [-1], [0, 1], [-2, -1]])
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_2d_real(self, axes, mode):
        a = _rand((7, 11), seed=11)
        b = _rand((4, 5), seed=12)
        if axes is not None and len(axes) < 2:
            # shapes must match on non-convolved axes
            b = _rand((7, 11), seed=12)
        kw = {} if axes is None else {"axes": axes}
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b), mode=mode,
                               **kw)
        exp = ssig.fftconvolve(a, b, mode=mode, **kw)
        _assert_close(got, exp, rtol=1e-9, atol=1e-10)

    @pytest.mark.parametrize("axes", [None, [0, 1]])
    def test_2d_complex(self, axes):
        a = _rand((6, 8), np.complex128, seed=13)
        b = _rand((3, 5), np.complex128, seed=14)
        kw = {} if axes is None else {"axes": axes}
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b), **kw)
        _assert_close(got, ssig.fftconvolve(a, b, **kw), rtol=1e-9,
                      atol=1e-10)

    def test_valid_mode_ignore_nonaxes(self):
        # in "valid" the non-convolved axes may violate the size rule
        a = _rand((4, 20), seed=15)
        b = _rand((4, 5), seed=16)
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b), "valid",
                               axes=[1])
        _assert_close(got, ssig.fftconvolve(a, b, "valid", axes=[1]),
                      rtol=1e-9, atol=1e-10)

    def test_empty(self):
        assert tsig.fftconvolve(jnp.asarray([]), jnp.asarray([])).size == 0

    def test_zero_rank(self):
        got = tsig.fftconvolve(jnp.asarray(5.0), jnp.asarray(2.0))
        assert float(got) == pytest.approx(10.0)

    def test_single_element(self):
        got = tsig.fftconvolve(jnp.asarray([5.0]), jnp.asarray([2.0]))
        _assert_close(got, [10.0], rtol=1e-12)

    @pytest.mark.parametrize(
        "n", [1, 2, 3, 4, 5, 13, 29, 61, 100, 127, 128, 129]
    )
    def test_many_sizes(self, n):
        # prime and power-of-two lengths exercise the padded-size chooser
        a = _rand((n,), seed=n)
        b = _rand((n,), seed=n + 1)
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b))
        _assert_close(got, ssig.fftconvolve(a, b), rtol=1e-9, atol=1e-10)

    def test_3d_axes_subset(self):
        a = _rand((3, 6, 8), seed=21)
        b = _rand((3, 4, 5), seed=22)
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b),
                               axes=[1, 2])
        _assert_close(got, ssig.fftconvolve(a, b, axes=[1, 2]),
                      rtol=1e-9, atol=1e-10)

    def test_random_data_vs_direct(self):
        a = _rand((123,), seed=31)
        b = _rand((45,), seed=32)
        got = tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b))
        exp = np.convolve(a, b)
        _assert_close(got, exp, rtol=1e-9, atol=1e-10)


class TestOAConvolve:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    @pytest.mark.parametrize(
        "na,nb", [(50, 6), (6, 50), (60, 60), (128, 29), (1000, 11)]
    )
    def test_1d(self, mode, na, nb):
        a = _rand((na,), seed=na)
        b = _rand((nb,), seed=nb + 5)
        got = tsig.oaconvolve(jnp.asarray(a), jnp.asarray(b), mode=mode)
        exp = ssig.oaconvolve(a, b, mode=mode)
        _assert_close(got, exp, rtol=1e-9, atol=1e-10)

    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_2d(self, mode):
        a = _rand((30, 27), seed=41)
        b = _rand((5, 8), seed=42)
        got = tsig.oaconvolve(jnp.asarray(a), jnp.asarray(b), mode=mode)
        _assert_close(got, ssig.oaconvolve(a, b, mode=mode), rtol=1e-9,
                      atol=1e-10)

    @pytest.mark.parametrize("axes", [[0], [1]])
    def test_2d_axes(self, axes):
        a = _rand((30, 4), seed=43)
        b = _rand((30, 4), seed=44)
        got = tsig.oaconvolve(jnp.asarray(a), jnp.asarray(b), axes=axes)
        _assert_close(got, ssig.oaconvolve(a, b, axes=axes), rtol=1e-9,
                      atol=1e-10)

    def test_empty(self):
        assert tsig.oaconvolve(jnp.asarray([]), jnp.asarray([])).size == 0

    def test_zero_rank(self):
        got = tsig.oaconvolve(jnp.asarray(3.0), jnp.asarray(4.0))
        assert float(got) == pytest.approx(12.0)

    def test_single_element(self):
        got = tsig.oaconvolve(jnp.asarray([3.0]), jnp.asarray([4.0]))
        _assert_close(got, [12.0], rtol=1e-12)

    def test_equal_to_fftconvolve_when_no_splitting(self):
        a = _rand((20,), seed=45)
        b = _rand((18,), seed=46)
        _assert_close(
            tsig.oaconvolve(jnp.asarray(a), jnp.asarray(b)),
            tsig.fftconvolve(jnp.asarray(a), jnp.asarray(b)),
            rtol=1e-9, atol=1e-10,
        )


class TestAllFreqConvolves:
    @pytest.mark.parametrize("conv", ["fftconvolve", "oaconvolve"])
    def test_invalid_shapes(self, conv):
        fn = getattr(tsig, conv)
        a = jnp.arange(1, 7).reshape((2, 3))
        b = jnp.arange(-6, 0).reshape((3, 2))
        with pytest.raises(ValueError):
            fn(a, b, mode="valid")

    @pytest.mark.parametrize("conv", ["fftconvolve", "oaconvolve"])
    def test_mismatched_dims(self, conv):
        fn = getattr(tsig, conv)
        for a, b in (([1], 2), (1, [2]), ([3], [[2]])):
            with pytest.raises(ValueError):
                fn(a, b)

    @pytest.mark.parametrize("conv", ["fftconvolve", "oaconvolve"])
    def test_invalid_flags(self, conv):
        fn = getattr(tsig, conv)
        a = jnp.asarray([1.0, 2.0, 3.0])
        b = jnp.asarray([4.0, 5.0])
        with pytest.raises(ValueError):
            fn(a, b, mode="chips")
        with pytest.raises(ValueError):
            fn(a, b, mode="full", axes=[2])
        with pytest.raises(ValueError):
            fn(a, b, mode="full", axes=[0, 0])


# ---------------------------------------------------------------------------
# correlate
# ---------------------------------------------------------------------------


REAL_DTYPES = [np.float32, np.float64, np.int32, np.uint8]
COMPLEX_DTYPES = [np.complex64, np.complex128]


class TestCorrelate:
    @pytest.mark.parametrize("dt", REAL_DTYPES)
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_rank1_real(self, dt, mode):
        a = _rand((10,), dt, seed=51)
        b = _rand((8,), dt, seed=52)
        got = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode)
        exp = ssig.correlate(a, b, mode)
        rtol = 1e-5 if np.dtype(dt).itemsize <= 4 else 1e-10
        _assert_close(got, exp, rtol=rtol, atol=1e-5)

    @pytest.mark.parametrize("dt", REAL_DTYPES)
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_rank3_real(self, dt, mode):
        a = _rand((4, 5, 6), dt, seed=53)
        b = _rand((2, 3, 4), dt, seed=54)
        got = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode)
        exp = ssig.correlate(a, b, mode)
        rtol = 1e-5 if np.dtype(dt).itemsize <= 4 else 1e-10
        _assert_close(got, exp, rtol=rtol, atol=1e-5)

    @pytest.mark.parametrize("dt", COMPLEX_DTYPES)
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_rank1_complex(self, dt, mode):
        a = _rand((10,), dt, seed=55)
        b = _rand((8,), dt, seed=56)
        got = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode)
        exp = ssig.correlate(a, b, mode)
        rtol = 1e-4 if dt == np.complex64 else 1e-10
        _assert_close(got, exp, rtol=rtol, atol=1e-6)

    @pytest.mark.parametrize("dt", COMPLEX_DTYPES)
    @pytest.mark.parametrize("mode", ["full", "same"])
    def test_swapped_complex(self, dt, mode):
        # conjugate-and-reverse semantics under input swapping
        a = _rand((6,), dt, seed=57)
        b = _rand((10,), dt, seed=58)
        got = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode)
        exp = ssig.correlate(a, b, mode)
        rtol = 1e-4 if dt == np.complex64 else 1e-10
        _assert_close(got, exp, rtol=rtol, atol=1e-6)

    def test_rank0(self):
        a = jnp.asarray(2.0 + 1j)
        b = jnp.asarray(3.0 - 2j)
        got = tsig.correlate(a, b)
        exp = ssig.correlate(np.asarray(2.0 + 1j), np.asarray(3.0 - 2j))
        _assert_close(got, exp, rtol=1e-12)

    def test_invalid_shapes(self):
        a = jnp.arange(1, 7).reshape((2, 3))
        b = jnp.arange(-6, 0).reshape((3, 2))
        with pytest.raises(ValueError):
            tsig.correlate(a, b, mode="valid")

    def test_invalid_params(self):
        a = jnp.asarray([3.0, 4.0, 5.0])
        b = jnp.asarray([1.0, 2.0, 3.0])
        with pytest.raises(ValueError):
            tsig.correlate(a, b, mode="spam")
        with pytest.raises(ValueError):
            tsig.correlate(a, b, mode="same", method="bacon")

    def test_mismatched_dims(self):
        with pytest.raises(ValueError):
            tsig.correlate([1], 2, method="direct")
        with pytest.raises(ValueError):
            tsig.correlate([1], [[2]])

    @pytest.mark.parametrize("dt", [np.float64, np.complex128])
    def test_fft_matches_direct(self, dt):
        a = _rand((100,), dt, seed=59)
        b = _rand((41,), dt, seed=60)
        for mode in ("full", "same", "valid"):
            x = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode,
                               method="direct")
            y = tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode,
                               method="fft")
            _assert_close(x, y, rtol=1e-8, atol=1e-8)


class TestCorrelate2d:
    def test_consistency_correlate_funcs(self):
        a = np.arange(5.0)
        b = np.array([3.2, 1.4, 3.0])
        for mode in ["full", "valid", "same"]:
            _assert_close(
                tsig.correlate(jnp.asarray(a), jnp.asarray(b), mode=mode),
                np.correlate(a, b, mode=mode), rtol=1e-12,
            )
            _assert_close(
                jnp.squeeze(
                    tsig.correlate2d(jnp.asarray(a[None]),
                                     jnp.asarray(b[None]), mode=mode)
                ),
                np.correlate(a, b, mode=mode), rtol=1e-12,
            )
        # valid mode with swapped inputs matches scipy
        a2 = _rand((5, 7), seed=61)
        b2 = _rand((7, 11), seed=62)
        _assert_close(
            tsig.correlate2d(jnp.asarray(a2), jnp.asarray(b2), "valid"),
            ssig.correlate2d(a2, b2, "valid"), rtol=1e-10,
        )
        _assert_close(
            tsig.correlate2d(jnp.asarray(b2), jnp.asarray(a2), "valid"),
            ssig.correlate2d(b2, a2, "valid"), rtol=1e-10,
        )

    def test_complex_input(self):
        a = _rand((4, 4), np.complex128, seed=63)
        b = _rand((2, 2), np.complex128, seed=64)
        _assert_close(
            tsig.correlate2d(jnp.asarray(a), jnp.asarray(b)),
            ssig.correlate2d(a, b), rtol=1e-10, atol=1e-12,
        )

    def test_invalid_shapes(self):
        a = jnp.arange(1, 7).reshape((2, 3))
        b = jnp.arange(-6, 0).reshape((3, 2))
        with pytest.raises(ValueError):
            tsig.correlate2d(a, b, mode="valid")


def test_choose_conv_method():
    for mode in ["valid", "same", "full"]:
        for ndim in [1, 2]:
            n, k = 30, 22
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.randn(*((n,) * ndim)))
            h = jnp.asarray(rng.randn(*((k,) * ndim)))
            method = tsig.choose_conv_method(x, h, mode=mode)
            assert method in ("fft", "direct")
            method_try, times = tsig.choose_conv_method(x, h, mode=mode,
                                                        measure=True)
            assert method_try in ("fft", "direct")
            assert isinstance(times, dict)
            assert "fft" in times and "direct" in times

    x = jnp.asarray([2 ** 25], dtype=jnp.int32)
    h = jnp.asarray([2 ** 25], dtype=jnp.int32)
    # product overflows float64's integer range -> must pick direct
    assert tsig.choose_conv_method(x, h) == "direct"


# ---------------------------------------------------------------------------
# wiener
# ---------------------------------------------------------------------------


class TestWiener:
    def test_basic_vs_scipy(self):
        g = np.random.RandomState(10).randn(256, 256)
        got = tsig.wiener(jnp.asarray(g), 5)
        exp = ssig.wiener(g, 5)
        _assert_close(got, exp, rtol=1e-8, atol=1e-10)

    def test_1d_and_noise_kw(self):
        g = np.random.RandomState(11).randn(200)
        got = tsig.wiener(jnp.asarray(g), 7, noise=0.5)
        exp = ssig.wiener(g, 7, noise=0.5)
        _assert_close(got, exp, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# resample / resample_poly
# ---------------------------------------------------------------------------


class TestResample:
    def test_basic(self):
        # downsampling a sine is still sampled from the same sine
        x = np.sin(2 * np.pi * np.arange(100) / 16.0)
        got = tsig.resample(jnp.asarray(x), 25)
        exp = ssig.resample(x, 25)
        _assert_close(got, exp, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("N", [32, 50])
    @pytest.mark.parametrize("num", [16, 25, 64])
    @pytest.mark.parametrize("window", [None, "hamming"])
    def test_rfft_windows(self, N, num, window):
        x = np.random.RandomState(12).randn(N)
        kw = {} if window is None else {"window": window}
        got = tsig.resample(jnp.asarray(x), num, **kw)
        exp = ssig.resample(x, num, **kw)
        _assert_close(got, exp, rtol=1e-8, atol=1e-9)

    @pytest.mark.parametrize("nx", [1, 2, 3, 5, 8])
    @pytest.mark.parametrize("ny", [1, 2, 3, 5, 8])
    def test_dc(self, nx, ny):
        x = np.ones(nx)
        got = tsig.resample(jnp.asarray(x), ny)
        _assert_close(got, np.ones(ny), rtol=1e-7, atol=1e-7)

    @pytest.mark.parametrize(
        "padtype",
        ["mean", "median", "minimum", "maximum", "line", "constant"],
    )
    def test_poly_padtypes(self, padtype):
        x = np.random.RandomState(13).randn(60)
        got = tsig.resample_poly(jnp.asarray(x), 2, 3, padtype=padtype)
        exp = ssig.resample_poly(x, 2, 3, padtype=padtype)
        _assert_close(got, exp, rtol=1e-8, atol=1e-10)

    def test_poly_vs_scipy_2d_axis(self):
        x = np.random.RandomState(14).randn(12, 60)
        for axis in (0, 1):
            got = tsig.resample_poly(jnp.asarray(x), 3, 2, axis=axis)
            exp = ssig.resample_poly(x, 3, 2, axis=axis)
            _assert_close(got, exp, rtol=1e-8, atol=1e-10)

    def test_output_float32(self):
        x = np.arange(10, dtype=np.float32)
        h = np.array([1, 1, 1], dtype=np.float32)
        got = tsig.resample_poly(jnp.asarray(x), 1, 2,
                                 window=jnp.asarray(h))
        assert got.dtype == jnp.float32

    def test_mutable_window(self):
        # a user window array must not be modified in place
        impulse = np.zeros(3)
        window = np.random.RandomState(15).randn(2)
        window_orig = window.copy()
        tsig.resample_poly(jnp.asarray(impulse), 5, 1,
                           window=jnp.asarray(window))
        np.testing.assert_array_equal(window, window_orig)

    def test_resample_methods_match_scipy(self):
        # sanity sweep over up/down pairs
        x = np.random.RandomState(16).randn(97)
        for up, down in [(2, 1), (1, 2), (3, 7), (7, 3), (5, 5)]:
            got = tsig.resample_poly(jnp.asarray(x), up, down)
            exp = ssig.resample_poly(x, up, down)
            _assert_close(got, exp, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# hilbert / hilbert2
# ---------------------------------------------------------------------------


class TestHilbert:
    def test_bad_args(self):
        with pytest.raises(ValueError):
            tsig.hilbert(jnp.asarray([1.0 + 0.0j]))
        with pytest.raises(ValueError):
            tsig.hilbert(jnp.arange(8.0), N=0)

    def test_hilbert_theoretical(self):
        # the analytic signal of cos is cos + i sin
        decimal = 6
        pi = np.pi
        t = np.arange(0, 2 * pi, pi / 256)
        a0 = np.sin(t)
        a = jnp.asarray(np.cos(t))
        h = np.asarray(tsig.hilbert(a))
        np.testing.assert_almost_equal(h.imag, a0, decimal)
        np.testing.assert_almost_equal(np.abs(h), np.ones(t.shape), 4)

    def test_hilbert_axisN(self):
        a = np.arange(18.0).reshape(3, 6)
        # test axis
        aa = np.asarray(tsig.hilbert(jnp.asarray(a), axis=-1))
        exp = ssig.hilbert(a, axis=-1)
        _assert_close(aa, exp, rtol=1e-10, atol=1e-12)
        aan = np.asarray(tsig.hilbert(jnp.asarray(a), N=20, axis=-1))
        assert aan.shape == (3, 20)
        _assert_close(aan, ssig.hilbert(a, N=20, axis=-1), rtol=1e-10,
                      atol=1e-12)

    def test_vs_scipy_1d(self):
        x = np.random.RandomState(17).randn(101)
        _assert_close(tsig.hilbert(jnp.asarray(x)), ssig.hilbert(x),
                      rtol=1e-9, atol=1e-10)


class TestHilbert2:
    def test_bad_args(self):
        x = jnp.asarray([[1.0 + 0.0j]])
        with pytest.raises(ValueError):
            tsig.hilbert2(x)
        x = jnp.arange(24.0).reshape(2, 3, 4)
        with pytest.raises(ValueError):
            tsig.hilbert2(x)
        with pytest.raises(ValueError):
            tsig.hilbert2(jnp.ones((8, 8)), N=0)
        with pytest.raises(ValueError):
            tsig.hilbert2(jnp.ones((8, 8)), N=(2, 0))
        with pytest.raises(ValueError):
            tsig.hilbert2(jnp.ones((8, 8)), N=(2,))

    def test_vs_scipy(self):
        x = np.random.RandomState(18).randn(16, 20)
        _assert_close(tsig.hilbert2(jnp.asarray(x)), ssig.hilbert2(x),
                      rtol=1e-9, atol=1e-10)
