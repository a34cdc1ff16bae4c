"""Compiled interpolation engines on the real TPU vs scipy oracles.

Exercises the GTG / one-hot MXU / warp-gather Pallas samplers
(ops/{gtg_interp,onehot_interp,warp_gather}.py) and the IIR spline
prefilter through the public API (reference kernels:
cupyimg/scipy/ndimage/_interp_kernels.py:277-592).

Coordinates are f32 on TPU (coord_precision='auto'); oracles are scipy's
C-double math.  Data is SMOOTH (gaussian-filtered noise) so f32
coordinate rounding maps to small value errors instead of knife-edge
flips, and transform parameters are irrational-ish so no sample lands
exactly on a half-integer.
"""

import functools

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndi

from _tpu_helpers import assert_close

SHAPE_2D = (1200, 1300)
SHAPE_3D = (102, 110, 120)


@functools.lru_cache(maxsize=4)
def _smooth(shape, seed=0):
    x = np.random.RandomState(seed).randn(*shape)
    x = sndi.gaussian_filter(x, 3.0).astype(np.float32)
    return x, jnp.asarray(x)


MAT_2D = np.array([[0.93137, 0.21143], [-0.19411, 0.95723]])
OFF_2D = np.array([13.4721, -7.2281])


class TestAffine2D:
    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_general_matrix(self, order):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.affine_transform(xg, MAT_2D, OFF_2D, order=order)
        want = sndi.affine_transform(x.astype(np.float64), MAT_2D, OFF_2D,
                                     order=order)
        if order == 0:
            # f32 routing quantization flips round-half-up ties the f64
            # oracle resolves the other way; bound the flip fraction
            # (which tile layout a point lands in shifts WHICH points
            # tie, so the exact set varies with the kernel plan)
            frac = np.mean(np.abs(np.asarray(got) - want) > 1e-6)
            assert frac < 1e-4, f"tap-flip fraction {frac:.2e}"
        else:
            assert_close(got, want, rtol=1e-3, atol=5e-3)

    @pytest.mark.parametrize("mode", ["nearest", "mirror", "grid-wrap"])
    def test_modes(self, mode):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.affine_transform(xg, MAT_2D, OFF_2D, order=1, mode=mode)
        want = sndi.affine_transform(x.astype(np.float64), MAT_2D, OFF_2D,
                                     order=1, mode=mode)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    @pytest.mark.parametrize("order", [1, 3])
    def test_shear_matrix(self, order):
        # a10 == 0: the GTG column routing constant-folds; compiled
        # Mosaic crashed on the shared-ext sublane slice of replicated
        # vectors before the per-tap exact-grid path existed
        x, xg = _smooth(SHAPE_2D)
        m = np.array([[1.0, 0.29731], [0.0, 1.0]])
        got = ndi.affine_transform(xg, m, OFF_2D, order=order)
        want = sndi.affine_transform(x.astype(np.float64), m, OFF_2D,
                                     order=order)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_diagonal_matrix(self):
        x, xg = _smooth(SHAPE_2D)
        m = np.array([1.03317, 0.91229])
        got = ndi.affine_transform(xg, m, offset=(2.317, -1.411), order=1)
        want = sndi.affine_transform(x.astype(np.float64), m,
                                     offset=(2.317, -1.411), order=1)
        assert_close(got, want, rtol=1e-3, atol=5e-3)


class TestTransforms:
    def test_rotate_2d(self):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.rotate(xg, 23.7, reshape=False, order=1)
        want = sndi.rotate(x.astype(np.float64), 23.7, reshape=False,
                           order=1)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_rotate_3d(self):
        x, xg = _smooth(SHAPE_3D)
        got = ndi.rotate(xg, 31.3, axes=(1, 2), reshape=False, order=1)
        want = sndi.rotate(x.astype(np.float64), 31.3, axes=(1, 2),
                           reshape=False, order=1)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_shift_subpixel(self):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.shift(xg, (3.317, -2.411), order=3)
        want = sndi.shift(x.astype(np.float64), (3.317, -2.411), order=3)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_zoom(self, order):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.zoom(xg, 0.7313, order=order)
        want = sndi.zoom(x.astype(np.float64), 0.7313, order=order)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_map_coordinates_warp(self):
        x, xg = _smooth(SHAPE_2D)
        yy, xx = np.meshgrid(
            np.arange(SHAPE_2D[0], dtype=np.float64),
            np.arange(SHAPE_2D[1], dtype=np.float64),
            indexing="ij",
        )
        cy = yy + 5.0 * np.sin(xx / 37.0)
        cx = xx + 4.0 * np.cos(yy / 29.0)
        coords = np.stack([cy, cx])
        got = ndi.map_coordinates(xg, jnp.asarray(coords, np.float32),
                                  order=1)
        want = sndi.map_coordinates(x.astype(np.float64), coords, order=1)
        assert_close(got, want, rtol=1e-3, atol=5e-3)


class TestSpline:
    def test_spline_filter_order3(self):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.spline_filter(xg, order=3, output=np.float32)
        want = sndi.spline_filter(x.astype(np.float64), order=3)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_spline_filter1d_mirror(self):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.spline_filter1d(xg, order=3, axis=0, mode="mirror",
                                  output=np.float32)
        want = sndi.spline_filter1d(x.astype(np.float64), order=3, axis=0,
                                    mode="mirror")
        assert_close(got, want, rtol=1e-3, atol=5e-3)


SHAPE_3D_WIDE = (96, 100, 160)  # last axis >= 128: row-gather batch


class TestPlaneRowGather:
    """Lane-batch row-gather sampler (ops/interp.gather_plane_rows) on
    the real chip: plane-coupled affines with >= 128 identity lanes."""

    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_rotate_wide_batch(self, order):
        x, xg = _smooth(SHAPE_3D_WIDE, seed=3)
        got = ndi.rotate(xg, 19.3, axes=(0, 1), reshape=False, order=order)
        want = sndi.rotate(x.astype(np.float64), 19.3, axes=(0, 1),
                           reshape=False, order=order)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    @pytest.mark.parametrize("mode", ["nearest", "reflect", "grid-wrap"])
    def test_affine_plane_modes(self, mode):
        x, xg = _smooth(SHAPE_3D_WIDE, seed=4)
        M = np.eye(3)
        M[:2, :2] = MAT_2D
        off = np.array([3.3173, -2.4111, 0.0])
        got = ndi.affine_transform(xg, M, off, order=1, mode=mode)
        want = sndi.affine_transform(x.astype(np.float64), M, off,
                                     order=1, mode=mode)
        assert_close(got, want, rtol=1e-3, atol=5e-3)


class TestFusedSplineShift:
    """Prefilter-composed shift FIR (ops/interp.shift_spline_fused) on
    the real chip: one fused separable Pallas pass for order >= 2."""

    @pytest.mark.parametrize("order", [2, 3, 4, 5])
    def test_orders(self, order):
        x, xg = _smooth(SHAPE_2D)
        got = ndi.shift(xg, (2.317, -1.411), order=order, mode="reflect")
        want = sndi.shift(x.astype(np.float64), (2.317, -1.411),
                          order=order, mode="reflect")
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    @pytest.mark.parametrize(
        "mode", ["mirror", "reflect", "grid-mirror", "grid-wrap"]
    )
    def test_modes(self, mode):
        x, xg = _smooth(SHAPE_2D, seed=5)
        got = ndi.shift(xg, (-7.613, 12.221), order=3, mode=mode)
        smode = "reflect" if mode == "grid-mirror" else mode
        want = sndi.shift(x.astype(np.float64), (-7.613, 12.221),
                          order=3, mode=smode)
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_3d(self):
        x, xg = _smooth(SHAPE_3D)
        got = ndi.shift(xg, (1.313, -0.617, 2.911), order=3, mode="mirror")
        want = sndi.shift(x.astype(np.float64), (1.313, -0.617, 2.911),
                          order=3, mode="mirror")
        assert_close(got, want, rtol=1e-3, atol=5e-3)

    def test_integer_shift_delta_kernel(self):
        # integer shifts compose to an off-center delta: exact move
        x, xg = _smooth(SHAPE_2D, seed=6)
        got = ndi.shift(xg, (5.0, -3.0), order=3, mode="grid-wrap")
        want = sndi.shift(x.astype(np.float64), (5.0, -3.0), order=3,
                          mode="grid-wrap")
        assert_close(got, want, rtol=1e-4, atol=1e-4)
