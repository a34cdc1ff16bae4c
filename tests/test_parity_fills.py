"""Tests for API-parity fill-ins: time.repeat, _misc, numpy shims,
shared-utils decorators, clear_border, PiecewiseAffineTransform,
clip/map_histogram, get_dH2, testing decorators."""

import os
import tempfile
import warnings

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu
import cupyimg_tpu.testing as testing
from cupyimg_tpu.time import repeat
from cupyimg_tpu._misc import (
    convolve_separable,
    cache_source,
    get_hlo,
    PerformanceWarning,
)


class TestTimeRepeat:
    def test_basic(self):
        r = repeat(
            lambda x: jnp.sum(x * x),
            (jnp.ones(256),),
            n_repeat=5,
            n_warmup=1,
        )
        assert r.cpu_times.shape == (5,)
        assert r.device_times.shape[0] == 1
        assert "CPU" in r.to_str()

    def test_validation(self):
        with pytest.raises(ValueError):
            repeat(42)
        with pytest.raises(ValueError):
            repeat(lambda: 0, args=[1])
        with pytest.raises(ValueError):
            repeat(lambda: 0, kwargs=[1])

    def test_max_duration(self):
        r = repeat(
            lambda x: x + 1,
            (jnp.ones(8),),
            n_repeat=100000,
            n_warmup=1,
            max_duration=0.05,
        )
        assert r.cpu_times.size < 100000


class TestMisc:
    def test_convolve_separable_matches_sequential(self):
        import cupyimg_tpu.scipy.ndimage as tndi

        x = np.random.RandomState(0).rand(16, 17)
        w = np.array([1.0, 2.0, 1.0])
        got = np.asarray(convolve_separable(x, w))
        exp = np.asarray(
            tndi.convolve1d(tndi.convolve1d(x, w, axis=0), w, axis=1)
        )
        np.testing.assert_allclose(got, exp, atol=1e-12)

    def test_convolve_separable_per_axis_filters(self):
        x = np.random.RandomState(1).rand(10, 11)
        w0 = np.array([1.0, 1.0])
        w1 = np.array([1.0, 2.0, 1.0])
        got = np.asarray(convolve_separable(x, [w0, w1]))
        import cupyimg_tpu.scipy.ndimage as tndi

        exp = np.asarray(
            tndi.convolve1d(tndi.convolve1d(x, w0, axis=0), w1, axis=1)
        )
        np.testing.assert_allclose(got, exp, atol=1e-12)
        with pytest.raises(ValueError):
            convolve_separable(x, [w0])

    def test_cache_source_and_hlo(self):
        with cache_source(tempfile.mkdtemp()) as dump:
            path = dump("sq", lambda v: v * v, jnp.ones(4))
            assert os.path.exists(path + ".jaxpr.txt")
            assert os.path.exists(path + ".hlo.txt")
        text = get_hlo(lambda v: v + 1, jnp.ones(3))
        assert "HloModule" in text or "module" in text

    def test_performance_warning_is_userwarning(self):
        assert issubclass(PerformanceWarning, UserWarning)


class TestNumpyShims:
    def test_modules(self):
        import cupyimg_tpu.numpy.core as nc
        import cupyimg_tpu.numpy.lib as nl
        from cupyimg_tpu.numpy.core.numeric import convolve
        from cupyimg_tpu.numpy.lib.histograms import histogram

        np.testing.assert_allclose(
            np.asarray(convolve([1, 2, 3], [0, 1, 0.5])),
            np.convolve([1, 2, 3], [0, 1, 0.5]),
        )
        h, e = histogram(np.arange(10), bins=5)
        hn, en = np.histogram(np.arange(10), bins=5)
        np.testing.assert_array_equal(np.asarray(h), hn)
        assert nc.ndim([[1, 2]]) == 2
        assert hasattr(nl, "apply_along_axis")


class TestSharedUtils:
    def test_deprecate_kwarg(self):
        from cupyimg_tpu.skimage._shared.utils import deprecate_kwarg

        @deprecate_kwarg({"old": "new"}, removed_version="1.0")
        def f(new=1):
            return new

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert f(old=5) == 5
            assert any("deprecated" in str(x.message) for x in w)

    def test_deprecated_decorator(self):
        from cupyimg_tpu.skimage._shared.utils import (
            deprecated,
            skimage_deprecation,
        )

        @deprecated(alt_func="new_func")
        def oldf():
            return 42

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert oldf() == 42
            assert any(
                issubclass(x.category, skimage_deprecation) for x in w
            )

    def test_check_random_state(self):
        from cupyimg_tpu.skimage._shared.utils import check_random_state

        assert isinstance(
            check_random_state(3), np.random.RandomState
        )
        rs = np.random.RandomState(0)
        assert check_random_state(rs) is rs
        with pytest.raises(ValueError):
            check_random_state("bogus")

    def test_expected_warnings(self):
        from cupyimg_tpu.skimage._shared import expected_warnings

        with expected_warnings(["boo"]):
            warnings.warn("boo hoo")
        with pytest.raises(ValueError):
            with expected_warnings(["never emitted"]):
                pass


class TestClearBorder:
    def test_basic(self):
        a = np.zeros((6, 6), int)
        a[0:2, 0:2] = 1
        a[3:5, 3:5] = 2
        from cupyimg_tpu.skimage.segmentation import clear_border

        out = np.asarray(clear_border(a))
        assert (out[0:2, 0:2] == 0).all()
        assert (out[3:5, 3:5] == 2).all()

    def test_buffer_size(self):
        from cupyimg_tpu.skimage.segmentation import clear_border

        a = np.zeros((8, 8), int)
        a[1:3, 1:3] = 1  # inside the buffer_size=1 shell (width 2)
        out = np.asarray(clear_border(a, buffer_size=1))
        assert (out == 0).all()
        out = np.asarray(clear_border(a, buffer_size=0))
        assert (out[1:3, 1:3] == 1).all()
        with pytest.raises(ValueError):
            clear_border(a, buffer_size=10)

    def test_mask(self):
        from cupyimg_tpu.skimage.segmentation import clear_border

        a = np.zeros((6, 6), int)
        a[3:5, 3:5] = 2
        mask = np.ones((6, 6), bool)
        mask[3, 3] = False
        out = np.asarray(clear_border(a, mask=mask))
        assert (out == 0).all()
        with pytest.raises(TypeError):
            clear_border(a, mask=mask.astype(int))

    def test_bgval(self):
        from cupyimg_tpu.skimage.segmentation import clear_border

        a = np.zeros((5, 5), int)
        a[0, 0] = 3
        out = np.asarray(clear_border(a, bgval=7))
        assert out[0, 0] == 7


class TestPiecewiseAffine:
    def test_translation_roundtrip(self):
        from cupyimg_tpu.skimage.transform import (
            PiecewiseAffineTransform,
        )

        src = np.array(
            [[0, 0], [0, 10], [10, 10], [10, 0], [5, 5]], float
        )
        dst = src + np.array([2.0, 3.0])
        t = PiecewiseAffineTransform()
        assert t.estimate(src, dst)
        pts = np.array([[1.0, 1.0], [5.0, 7.0]])
        out = np.asarray(t(pts))
        np.testing.assert_allclose(out, pts + [2, 3], atol=1e-8)
        back = np.asarray(t.inverse(out))
        np.testing.assert_allclose(back, pts, atol=1e-8)

    def test_outside_mesh_is_minus_one(self):
        from cupyimg_tpu.skimage.transform import (
            PiecewiseAffineTransform,
        )

        src = np.array([[0, 0], [0, 4], [4, 4], [4, 0]], float)
        t = PiecewiseAffineTransform()
        t.estimate(src, src * 2)
        out = np.asarray(t(np.array([[100.0, 100.0]])))
        np.testing.assert_array_equal(out, [[-1, -1]])

    def test_estimate_transform_name(self):
        from cupyimg_tpu.skimage.transform import estimate_transform

        src = np.array(
            [[0, 0], [0, 10], [10, 10], [10, 0]], float
        )
        t = estimate_transform("piecewise-affine", src, src + 1)
        np.testing.assert_allclose(
            np.asarray(t(np.array([[2.0, 2.0]]))), [[3, 3]],
            atol=1e-8,
        )


class TestAdapthistHelpers:
    def test_clip_histogram(self):
        from cupyimg_tpu.skimage.exposure._adapthist import (
            clip_histogram,
        )

        h = np.array([10, 50, 3, 0, 7], float)
        out = np.asarray(clip_histogram(h, 20))
        assert out.sum() == pytest.approx(h.sum())
        assert (out <= 20).all()

    def test_map_histogram(self):
        from cupyimg_tpu.skimage.exposure._adapthist import (
            map_histogram,
        )

        h = np.array([10, 50, 3, 0, 7], float)
        out = np.asarray(map_histogram(h, 0, 255, h.sum()))
        assert out[-1] == 255
        assert (np.diff(out) >= 0).all()


class TestGetDH2:
    def test_consistent_with_naive_formula(self):
        from cupyimg_tpu.skimage.color.delta_e import get_dH2

        rng = np.random.RandomState(0)
        lab1 = rng.rand(5, 3) * 100
        lab2 = rng.rand(5, 3) * 100
        a1, b1 = lab1[:, 1], lab1[:, 2]
        a2, b2 = lab2[:, 1], lab2[:, 2]
        C1 = np.hypot(a1, b1)
        C2 = np.hypot(a2, b2)
        naive = (a1 - a2) ** 2 + (b1 - b2) ** 2 - (C1 - C2) ** 2
        np.testing.assert_allclose(
            np.asarray(get_dH2(lab1, lab2)), naive, rtol=1e-10
        )


class TestSplinePrefilterExports:
    def test_poles_and_kernel(self):
        import cupyimg_tpu.scipy.ndimage as ndi

        poles = ndi.get_poles(3)
        assert poles == (-0.2679491924311228,)
        assert ndi.get_gain(poles) == pytest.approx(6.0)
        k = ndi.get_raw_spline1d_kernel(3, "mirror")
        x = np.random.RandomState(0).rand(32, 4)
        got = np.asarray(k(jnp.asarray(x)))
        exp = sndi.spline_filter1d(x, order=3, axis=0, mode="mirror")
        np.testing.assert_allclose(got, exp, atol=1e-9)


class TestTestingDecorators:
    def test_allclose_decorator(self):
        @testing.numpy_cupyimg_allclose(scipy_name="scp")
        def f(xp, scp):
            return scp.ndimage.uniform_filter(
                xp.asarray(np.arange(64.0).reshape(8, 8)), 3
            )

        f()

    def test_array_equal_decorator(self):
        @testing.numpy_cupyimg_array_equal()
        def f(xp):
            return xp.arange(5)

        f()

    def test_raises_decorator(self):
        @testing.numpy_cupyimg_raises()
        def f(xp):
            raise ValueError("both fail")

        f()

    def test_mismatch_detected(self):
        @testing.numpy_cupyimg_allclose()
        def f(xp):
            return (
                xp.ones(3)
                if xp.__name__ == "jax.numpy"
                else xp.zeros(3)
            )

        with pytest.raises(AssertionError):
            f()

    def test_for_dtypes(self):
        seen = []

        @testing.for_dtypes([np.float32, np.int32])
        def f(dtype):
            seen.append(dtype)

        f()
        assert seen == [np.float32, np.int32]


class TestSignatureParityFills:
    """Reference-signature parity: gray2rgb(alpha=), pyramid
    preserve_range=, ensure_spacing(coord=) (reference
    colorconv.py:992, pyramids.py:35, _shared/coord.py:7)."""

    def test_gray2rgb_alpha_true(self):
        from cupyimg_tpu.skimage.color import gray2rgb

        g = np.arange(12, dtype=np.uint8).reshape(3, 4)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = np.asarray(gray2rgb(g, alpha=True))
            assert any(
                issubclass(x.category, FutureWarning) for x in w
            )
        assert out.shape == (3, 4, 4)
        assert (out[..., 3] == 255).all()
        np.testing.assert_array_equal(out[..., :3], np.stack([g] * 3, -1))

    def test_gray2rgb_rgb_passthrough(self):
        from cupyimg_tpu.skimage.color import gray2rgb

        rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        rgba = np.arange(32, dtype=np.uint8).reshape(2, 4, 4)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            np.testing.assert_array_equal(np.asarray(gray2rgb(rgb)), rgb)
            assert any("Pass-through" in str(x.message) for x in w)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            np.testing.assert_array_equal(
                np.asarray(gray2rgb(rgba, alpha=False)), rgba[..., :3]
            )
            out = np.asarray(gray2rgb(rgb, alpha=True))
        assert out.shape == (2, 4, 4) and (out[..., 3] == 255).all()

    def test_pyramid_preserve_range(self):
        from cupyimg_tpu.skimage.transform import (
            pyramid_reduce,
            pyramid_expand,
            pyramid_gaussian,
            pyramid_laplacian,
        )

        img = (np.arange(1024) % 251).astype(np.uint8).reshape(32, 32)
        for fn in (pyramid_reduce, pyramid_expand):
            a = np.asarray(fn(img, preserve_range=True))
            b = np.asarray(fn(img, preserve_range=False))
            assert a.max() > 2.0 and b.max() <= 1.0
            np.testing.assert_allclose(a / 255.0, b, rtol=1e-5, atol=1e-6)
        for gen in (pyramid_gaussian, pyramid_laplacian):
            la = list(gen(img, max_layer=2, preserve_range=True))
            lb = list(gen(img, max_layer=2, preserve_range=False))
            assert len(la) == len(lb) == 3
            for x, y in zip(la, lb):
                np.testing.assert_allclose(
                    np.asarray(x) / 255.0, np.asarray(y),
                    rtol=1e-4, atol=1e-6,
                )

    def test_ensure_spacing_coord_kwarg(self):
        from cupyimg_tpu.skimage._shared.coord import ensure_spacing

        pts = (np.arange(100).reshape(50, 2) % 17).astype(float)
        out = np.asarray(ensure_spacing(coord=pts, spacing=1.0))
        d = np.max(np.abs(out[:, None, :] - out[None, :, :]), -1)
        off = ~np.eye(len(out), dtype=bool)
        assert (d[off] >= 1.0).all()
