"""Fused Pallas rank/median kernel (ops/pallas_stencil.fused_rank_filter)
vs scipy oracles, interpret mode (CPU).

Reference counterpart: rank kernels + optimal median networks,
cupyimg/scipy/ndimage/filters.py:1510-1848, _filters_optimal_medians.py.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

from cupyimg_tpu.ops import pallas_stencil as ps


def _run(x, footprint, origins, rank, mode, cval=0.0):
    return np.asarray(
        ps.fused_rank_filter(
            jnp.asarray(x), footprint, origins, rank, mode, cval,
            interpret=True,
        )
    )


@pytest.mark.parametrize("mode", ["reflect", "nearest", "constant",
                                  "mirror", "wrap"])
@pytest.mark.parametrize("size", [3, 5])
def test_median_2d_modes(mode, size):
    x = np.random.RandomState(0).randn(40, 53).astype(np.float32)
    fp = np.ones((size, size), bool)
    rank = (size * size) // 2
    got = _run(x, fp, (0, 0), rank, mode)
    want = sndi.median_filter(x, size, mode=mode)
    np.testing.assert_array_equal(got, want)


def test_median_3d():
    x = np.random.RandomState(1).randn(20, 21, 35).astype(np.float32)
    fp = np.ones((3, 3, 3), bool)
    got = _run(x, fp, (0, 0, 0), 13, "reflect")
    want = sndi.median_filter(x, 3, mode="reflect")
    np.testing.assert_array_equal(got, want)


def test_rank_nonrect_footprint_origin():
    x = np.random.RandomState(2).randn(30, 41).astype(np.float32)
    fp = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    got = _run(x, fp, (0, 1), 2, "nearest")
    want = sndi.rank_filter(x, 2, footprint=fp, origin=(0, 1),
                            mode="nearest")
    np.testing.assert_array_equal(got, want)


def test_percentile_int32():
    x = np.random.RandomState(3).randint(-50, 50, (32, 45)).astype(
        np.int32)
    fp = np.ones((5, 5), bool)
    got = _run(x, fp, (0, 0), 7, "constant", cval=3.0)
    want = sndi.rank_filter(x, 7, footprint=fp, mode="constant", cval=3.0)
    np.testing.assert_array_equal(got, want)


def test_even_window_origin():
    x = np.random.RandomState(4).randn(24, 33).astype(np.float32)
    fp = np.ones((4, 4), bool)
    got = _run(x, fp, (-1, 0), 8, "reflect")
    want = sndi.rank_filter(x, 8, footprint=fp, origin=(-1, 0),
                            mode="reflect")
    np.testing.assert_array_equal(got, want)
