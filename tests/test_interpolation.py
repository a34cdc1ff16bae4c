"""ndimage interpolation vs scipy.ndimage (orders 0-5, all modes)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import cupyimg_tpu.scipy.ndimage.interpolation as tinterp

MODES = [
    "constant",
    "grid-constant",
    "nearest",
    "mirror",
    "reflect",
    "grid-mirror",
    "wrap",
    "grid-wrap",
]
ORDERS = [0, 1, 2, 3, 4, 5]


def _img(shape, dtype=np.float64, seed=0):
    rng = np.random.RandomState(seed)
    if np.dtype(dtype).kind == "c":
        return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(dtype)
    return rng.randn(*shape).astype(dtype)


class TestSplineFilter:
    @pytest.mark.parametrize("order", [2, 3, 4, 5])
    @pytest.mark.parametrize("mode", ["mirror", "reflect", "grid-wrap",
                                      "nearest", "constant", "wrap"])
    def test_spline_filter1d(self, order, mode):
        x = _img((24,))
        got = tinterp.spline_filter1d(x, order, mode=mode,
                                      allow_float32=False)
        exp = ndi.spline_filter1d(x, order, mode=mode)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("order", [2, 3, 5])
    def test_spline_filter_nd(self, order):
        x = _img((12, 15))
        got = tinterp.spline_filter(x, order, allow_float32=False)
        exp = ndi.spline_filter(x, order)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    def test_small_signal(self):
        x = _img((5,))
        got = tinterp.spline_filter1d(x, 3, allow_float32=False)
        exp = ndi.spline_filter1d(x, 3)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    def test_axis(self):
        x = _img((8, 9))
        for axis in (0, 1):
            got = tinterp.spline_filter1d(x, 3, axis=axis,
                                          allow_float32=False)
            exp = ndi.spline_filter1d(x, 3, axis=axis)
            np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9,
                                       atol=1e-9)


class TestMapCoordinates:
    @pytest.mark.parametrize("order", ORDERS)
    @pytest.mark.parametrize("mode", MODES)
    def test_vs_scipy_2d(self, order, mode):
        x = _img((12, 13))
        rng = np.random.RandomState(5)
        # coordinates spanning inside and outside the domain
        coords = np.stack(
            [
                rng.uniform(-4, 16, size=(7, 9)),
                rng.uniform(-4, 17, size=(7, 9)),
            ]
        )
        got = tinterp.map_coordinates(
            x, coords, order=order, mode=mode, cval=1.5, allow_float32=False
        )
        exp = ndi.map_coordinates(x, coords, order=order, mode=mode, cval=1.5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_interior_exact(self, order):
        x = _img((10, 11))
        rng = np.random.RandomState(6)
        coords = np.stack(
            [rng.uniform(2, 7, size=(20,)), rng.uniform(2, 8, size=(20,))]
        )
        got = tinterp.map_coordinates(x, coords, order=order,
                                      allow_float32=False)
        exp = ndi.map_coordinates(x, coords, order=order)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    def test_integer_output_rounds(self):
        x = (np.arange(20).reshape(4, 5)).astype(np.int32)
        coords = np.array([[0.5, 1.2], [0.5, 2.8]])
        got = tinterp.map_coordinates(x, coords, order=1, output=np.int32,
                                      allow_float32=False)
        exp = ndi.map_coordinates(x, coords, order=1, output=np.int32)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_3d(self):
        x = _img((6, 7, 8))
        rng = np.random.RandomState(7)
        coords = rng.uniform(-1, 8, size=(3, 11))
        got = tinterp.map_coordinates(x, coords, order=3, mode="mirror",
                                      allow_float32=False)
        exp = ndi.map_coordinates(x, coords, order=3, mode="mirror")
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-7, atol=1e-7)

    def test_complex(self):
        x = _img((9, 10), np.complex128)
        rng = np.random.RandomState(8)
        coords = rng.uniform(0, 8, size=(2, 15))
        got = tinterp.map_coordinates(x, coords, order=1, allow_float32=False)
        exp = ndi.map_coordinates(x.real, coords, order=1) + 1j * (
            ndi.map_coordinates(x.imag, coords, order=1)
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)


class TestAffine:
    @pytest.mark.parametrize("order", [0, 1, 3])
    @pytest.mark.parametrize("mode", ["constant", "nearest", "mirror",
                                      "grid-wrap"])
    def test_full_matrix(self, order, mode):
        x = _img((14, 15))
        matrix = np.array([[0.9, 0.15], [-0.1, 1.1]])
        offset = [0.7, -1.3]
        got = tinterp.affine_transform(
            x, matrix, offset, order=order, mode=mode, cval=0.5,
            allow_float32=False,
        )
        exp = ndi.affine_transform(x, matrix, offset, order=order, mode=mode,
                                   cval=0.5)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("order", ORDERS)
    def test_diagonal_matrix_separable_path(self, order):
        x = _img((14, 15))
        got = tinterp.affine_transform(
            x, np.array([0.8, 1.3]), [1.0, -0.5], output_shape=(17, 12),
            order=order, mode="reflect", allow_float32=False,
        )
        exp = ndi.affine_transform(
            x, np.array([0.8, 1.3]), [1.0, -0.5], output_shape=(17, 12),
            order=order, mode="reflect",
        )
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    def test_homogeneous_matrix(self):
        x = _img((10, 11))
        m = np.eye(3)
        m[:2, :2] = [[1.05, 0.0], [0.1, 0.95]]
        m[:2, 2] = [0.3, -0.2]
        got = tinterp.affine_transform(x, m, order=1, allow_float32=False)
        exp = ndi.affine_transform(x, m, order=1)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)


class TestShiftZoomRotate:
    @pytest.mark.parametrize("order", ORDERS)
    @pytest.mark.parametrize("mode", MODES)
    def test_shift(self, order, mode):
        x = _img((13, 14))
        got = tinterp.shift(x, (1.7, -2.3), order=order, mode=mode, cval=2.0,
                            allow_float32=False)
        exp = ndi.shift(x, (1.7, -2.3), order=order, mode=mode, cval=2.0)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("mode", ["mirror", "reflect", "grid-mirror",
                                      "grid-wrap", "nearest"])
    @pytest.mark.parametrize("sh", [7.5, -7.5, 4.5, -12.5])
    def test_shift_order0_halfinteger_far(self, sh, mode):
        # Order-0 rounds half up; far-out-of-domain half-integer
        # coordinates must fold in scipy's tie direction (the premap fold
        # is not abs()).  |shift| > n exercises multi-period folds.
        x = np.arange(5, dtype=np.float64)
        got = tinterp.shift(x, sh, order=0, mode=mode, allow_float32=False)
        exp = ndi.shift(x, sh, order=0, mode=mode)
        np.testing.assert_allclose(np.asarray(got), exp)

    @pytest.mark.parametrize("order", [0, 1, 3, 5])
    @pytest.mark.parametrize("zoom_factor", [0.5, 1.0, 1.7, (2.0, 0.8)])
    def test_zoom(self, order, zoom_factor):
        x = _img((12, 13))
        got = tinterp.zoom(x, zoom_factor, order=order, allow_float32=False)
        exp = ndi.zoom(x, zoom_factor, order=order)
        assert np.asarray(got).shape == exp.shape
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("mode", ["grid-constant", "reflect"])
    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_zoom_grid_mode(self, order, mode):
        x = _img((11, 12))
        got = tinterp.zoom(x, 1.6, order=order, mode=mode, grid_mode=True,
                           allow_float32=False)
        exp = ndi.zoom(x, 1.6, order=order, mode=mode, grid_mode=True)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("reshape", [True, False])
    @pytest.mark.parametrize("angle", [30.0, -77.0, 90.0])
    def test_rotate(self, angle, reshape):
        x = _img((13, 16))
        got = tinterp.rotate(x, angle, reshape=reshape, order=1,
                             allow_float32=False)
        exp = ndi.rotate(x, angle, reshape=reshape, order=1)
        assert np.asarray(got).shape == exp.shape
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-7, atol=1e-7)

    def test_rotate_3d(self):
        x = _img((6, 10, 11))
        got = tinterp.rotate(x, 40.0, axes=(1, 2), order=1,
                             allow_float32=False)
        exp = ndi.rotate(x, 40.0, axes=(1, 2), order=1)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-7, atol=1e-7)

    @pytest.mark.parametrize("prefilter", [False, True])
    @pytest.mark.parametrize("mode", ["constant", "nearest", "mirror",
                                      "grid-wrap"])
    @pytest.mark.parametrize("order", [0, 2, 3, 5])
    def test_rotate_3d_per_plane(self, order, mode, prefilter):
        # scipy rotates each plane with the 2-D affine; with
        # prefilter=False and order >= 2 that differs from embedding the
        # rotation in an ndim identity matrix (no off-plane spline taps)
        x = _img((5, 14, 15))
        got = tinterp.rotate(x, 23.0, axes=(1, 2), reshape=False,
                             order=order, mode=mode, cval=1.5,
                             prefilter=prefilter, allow_float32=False)
        exp = ndi.rotate(x, 23.0, axes=(1, 2), reshape=False, order=order,
                         mode=mode, cval=1.5, prefilter=prefilter)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5,
                                   atol=2e-5)

    def test_rotate_3d_axes02_reshape(self):
        x = _img((9, 5, 12))
        got = tinterp.rotate(x, -31.0, axes=(-1, 0), reshape=True, order=3,
                             allow_float32=False)
        exp = ndi.rotate(x, -31.0, axes=(-1, 0), reshape=True, order=3)
        assert np.asarray(got).shape == exp.shape
        np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5,
                                   atol=2e-5)

    @pytest.mark.parametrize("order", [2, 3, 4, 5])
    def test_nearest_extrapolates_oob(self, order):
        # mode='nearest' with order >= 2: scipy keeps the raw coordinate
        # and clamps each spline tap, so out-of-domain points extrapolate
        x = _img((9,))
        coords = np.linspace(-6.0, 14.0, 101)[None]
        got = tinterp.map_coordinates(x, coords, order=order,
                                      mode="nearest", prefilter=False,
                                      allow_float32=False)
        exp = ndi.map_coordinates(x, coords, order=order, mode="nearest",
                                  prefilter=False)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12,
                                   atol=1e-12)

    def test_zoom_int_output(self):
        x = (np.arange(110).reshape(10, 11) % 17).astype(np.uint8)
        got = tinterp.zoom(x, 1.5, order=1, allow_float32=False)
        exp = ndi.zoom(x, 1.5, order=1)
        np.testing.assert_array_equal(np.asarray(got), exp)


class TestSeparableCoordsProbe:
    """map_coordinates detects mgrid-style separable coordinate grids and
    routes them through the per-axis engine (TPU-gated; gate patched)."""

    @pytest.fixture(autouse=True)
    def pretend_tpu(self, monkeypatch):
        import jax

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        yield

    def test_separable_grid_matches_scipy(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        x = rng.rand(60, 62, 64).astype(np.float32)
        g = np.mgrid[0:60, 0:62, 0:64].astype(np.float32)
        g = g * np.array([0.83, 1.07, 0.99]).reshape(3, 1, 1, 1) - 0.7
        for order, mode in [(1, "nearest"), (3, "mirror"),
                            (1, "constant"), (0, "grid-wrap")]:
            got = np.asarray(
                tinterp.map_coordinates(
                    jnp.asarray(x), jnp.asarray(g), order=order,
                    mode=mode, cval=0.3,
                )
            )
            exp = ndi.map_coordinates(
                x.astype(np.float64), g.astype(np.float64), order=order,
                mode=mode, cval=0.3,
            )
            assert np.abs(got - exp).max() < 5e-5, (order, mode)

    def test_probe_declines_nonseparable(self):
        import jax.numpy as jnp

        g = np.mgrid[0:64, 0:64, 0:64].astype(np.float32)
        g[0] += 0.01 * g[1]  # couples axes
        sep = tinterp._separable_coords(jnp.asarray(g), 3)
        assert sep is None
        gsep = np.mgrid[0:64, 0:64, 0:64].astype(np.float32) * 1.25
        sep = tinterp._separable_coords(jnp.asarray(gsep), 3)
        assert sep is not None and len(sep) == 3

    def test_traced_coords_cond_path(self):
        """Under an outer jit the probe can't sync: map_coordinates must
        route through the lax.cond dual path and stay scipy-exact for
        BOTH runtime outcomes (separable and dense)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        x = rng.rand(60, 62, 64).astype(np.float32)
        gsep = np.mgrid[0:60, 0:62, 0:64].astype(np.float32) * 1.1 - 0.4
        gden = gsep + rng.rand(*gsep.shape).astype(np.float32) * 0.2

        assert tinterp._separable_coords(jnp.asarray(gsep), 3) is not None

        f = jax.jit(
            lambda a, c: tinterp.map_coordinates(
                a, c, order=1, mode="nearest"
            )
        )
        for g in (gsep, gden):
            got = np.asarray(f(jnp.asarray(x), jnp.asarray(g)))
            exp = ndi.map_coordinates(
                x.astype(np.float64), g.astype(np.float64), order=1,
                mode="nearest",
            )
            assert np.abs(got - exp).max() < 5e-5

    def test_concrete_coords_under_outer_trace(self):
        """Concrete coordinates closed over inside a jitted caller still
        yield traced probe results; the sentinel must route them through
        the cond path instead of raising TracerBoolConversionError."""
        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        x = rng.rand(48, 50, 52).astype(np.float32)
        g = jnp.asarray(
            np.mgrid[0:48, 0:50, 0:52].astype(np.float32) * 1.17
        )

        f = jax.jit(lambda a: tinterp.map_coordinates(a, g, order=1))
        got = np.asarray(f(jnp.asarray(x)))
        exp = ndi.map_coordinates(
            x.astype(np.float64), np.asarray(g, np.float64), order=1
        )
        assert np.abs(got - exp).max() < 5e-5


def test_integer_output_saturates_on_overshoot():
    """Spline overshoot on integer images clamps at the dtype bounds
    (scipy semantics), it does not wrap: shifting a uint8 step edge at
    order 5 overshoots past [0, 255] on both sides."""
    import jax.numpy as jnp

    x = np.zeros((9, 9), np.uint8)
    x[:, 4:] = 255
    got = np.asarray(tinterp.shift(jnp.asarray(x), (0.0, 0.4), order=5))
    exp = ndi.shift(x, (0.0, 0.4), order=5)
    np.testing.assert_array_equal(got, exp)

    xi = np.zeros((9, 9), np.int8)
    xi[:, 4:] = 127
    got = np.asarray(tinterp.shift(jnp.asarray(xi), (0.0, 0.4), order=5))
    exp = ndi.shift(xi, (0.0, 0.4), order=5)
    np.testing.assert_array_equal(got, exp)
