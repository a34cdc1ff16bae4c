"""Pallas one-hot resampling kernels, run on CPU via interpret mode.

The production dispatch is TPU-gated (ops/onehot_interp._dispatch_core);
here the kernels are invoked directly with ``interpret=True`` and
compared against scipy (float64 oracle) — the same contract the XLA
scan core is tested under in test_onehot_interp.py.
"""

import math

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

from cupyimg_tpu.ops import pallas_interp


MAT = np.array([[0.9, 0.12], [-0.15, 0.93]])
OFFSET = (1.5, -2.0)


def _pads_for(matrix, offset, out_shape, in_shape, margin):
    corners = np.array(
        [[0, 0], [0, out_shape[1] - 1], [out_shape[0] - 1, 0],
         [out_shape[0] - 1, out_shape[1] - 1]], dtype=np.float64)
    src = corners @ np.asarray(matrix).T + np.asarray(offset)
    pads = []
    for ax in range(2):
        lo = max(0, int(math.ceil(-src[:, ax].min())) + margin)
        hi = max(0, int(math.ceil(src[:, ax].max()
                                  - (in_shape[ax] - 1))) + margin)
        pads.append((lo, hi))
    return pads


class TestAffinePallas:
    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_matches_scipy_nearest(self, order):
        rng = np.random.RandomState(0)
        x = rng.rand(160, 150).astype(np.float32)
        pads = _pads_for(MAT, OFFSET, (160, 150), x.shape, order + 2)
        xext = np.pad(x, pads, mode="edge")
        mshape = (MAT[0, 0], MAT[0, 1], MAT[1, 0], MAT[1, 1],
                  OFFSET[0], OFFSET[1])
        got = pallas_interp.affine_pallas(
            jnp.asarray(xext), pads[0][0], pads[1][0], mshape,
            order, (160, 150), interpret=True)
        exp = sndi.affine_transform(
            x.astype(np.float64), MAT, offset=OFFSET, order=order,
            mode="nearest", prefilter=False)
        got = np.asarray(got)
        if order == 0:
            # skip rounding-tie points (f32 vs f64 coordinate math)
            ii, jj = np.mgrid[0:160, 0:150]
            r = MAT[0, 0] * ii + MAT[0, 1] * jj + OFFSET[0]
            c = MAT[1, 0] * ii + MAT[1, 1] * jj + OFFSET[1]
            keep = (np.abs(r % 1 - 0.5) > 1e-3) & (
                np.abs(c % 1 - 0.5) > 1e-3)
            np.testing.assert_allclose(got[keep], exp[keep], atol=2e-5)
        else:
            np.testing.assert_allclose(got, exp, atol=2e-4)

    def test_batched_planes(self):
        rng = np.random.RandomState(1)
        x = rng.rand(6, 140, 130).astype(np.float32)
        pads = _pads_for(MAT, OFFSET, (140, 130), (140, 130), 3)
        xext = np.pad(x, [(0, 0)] + pads, mode="edge")
        mshape = (MAT[0, 0], MAT[0, 1], MAT[1, 0], MAT[1, 1],
                  OFFSET[0], OFFSET[1])
        got = pallas_interp.affine_pallas(
            jnp.asarray(xext), pads[0][0], pads[1][0], mshape,
            1, (140, 130), interpret=True)
        assert got.shape == (6, 140, 130)
        for p in range(6):
            exp = sndi.affine_transform(
                x[p].astype(np.float64), MAT, offset=OFFSET, order=1,
                mode="nearest", prefilter=False)
            np.testing.assert_allclose(np.asarray(got[p]), exp,
                                       atol=2e-4)


class TestMapPallas:
    @pytest.mark.parametrize("order", [0, 1, 3])
    def test_matches_scipy(self, order):
        rng = np.random.RandomState(2)
        H, W = 150, 140
        x = rng.rand(H, W).astype(np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        rr = yy + 3 * np.sin(xx / 9.0).astype(np.float32)
        cc = xx + 3 * np.cos(yy / 7.0).astype(np.float32)

        margin = order + 2
        lo0 = int(max(0, -np.floor(rr).min() + margin))
        lo1 = int(max(0, -np.floor(cc).min() + margin))
        hi0 = int(max(0, np.floor(rr).max() - (H - 1) + margin))
        hi1 = int(max(0, np.floor(cc).max() - (W - 1) + margin))
        xext = np.pad(x, [(lo0, hi0 + margin), (lo1, hi1 + margin)],
                      mode="edge")

        if order == 0:
            r0 = np.floor(rr + 0.5)
            c0 = np.floor(cc + 0.5)
        else:
            r0 = np.floor(rr)
            c0 = np.floor(cc)
        if order == 0:
            # order-0 contract: zero fractions (the tap IS the rounded
            # coordinate; ops/onehot_interp passes zeros)
            fr = np.zeros_like(rr)
            fc = np.zeros_like(cc)
        else:
            fr = rr - r0
            fc = cc - c0
        got = pallas_interp.map_pallas(
            jnp.asarray(xext),
            jnp.asarray(r0.astype(np.int32) + lo0),
            jnp.asarray(c0.astype(np.int32) + lo1),
            jnp.asarray(fr), jnp.asarray(fc),
            order, (H, W), 96, 256, interpret=True)
        exp = sndi.map_coordinates(
            x.astype(np.float64), [rr.astype(np.float64),
                                   cc.astype(np.float64)],
            order=order, mode="nearest", prefilter=False)
        np.testing.assert_allclose(np.asarray(got), exp, atol=2e-4)
