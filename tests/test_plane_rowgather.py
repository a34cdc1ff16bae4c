"""Row-gather plane sampler (ops/interp.gather_plane_rows).

The lane-batch fast path for plane-coupled nd affines (rotate on
volumes): each tap is a contiguous row DMA.  These tests pin the
routing (path actually taken for wide batches under f32 coords) and
scipy parity across orders/modes on both batch-axis positions.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi
import jax.numpy as jnp

from cupyimg_tpu.core.config import config
import cupyimg_tpu.scipy.ndimage as tndi
import cupyimg_tpu.ops.interp as interp


@pytest.fixture
def f32_coords():
    """Force the f32 coordinate policy so the sampler path used on TPU
    is the one under test (CPU x64 defaults to the f64 dense path)."""
    old = config.coord_precision
    config.coord_precision = "f32"
    yield
    config.coord_precision = old


@pytest.fixture
def spy_calls(monkeypatch):
    calls = []
    orig = interp.gather_plane_rows

    def wrapper(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(interp, "gather_plane_rows", wrapper)
    return calls


def _rot3(angle_deg):
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    M = np.eye(3)
    M[0, 0], M[0, 1], M[1, 0], M[1, 1] = c, -s, s, c
    return M


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
@pytest.mark.parametrize(
    "mode",
    ["constant", "nearest", "reflect", "mirror", "wrap", "grid-wrap",
     "grid-constant", "grid-mirror"],
)
def test_affine_plane_rowgather_vs_scipy(f32_coords, spy_calls, order, mode):
    rng = np.random.RandomState(0)
    x = rng.rand(24, 20, 140).astype(np.float32)
    M = _rot3(23.0)
    off = np.array([3.2, -1.7, 0.0])
    exp = sndi.affine_transform(
        x.astype(np.float64), M, off, order=order, mode=mode, cval=1.5
    )
    got = np.asarray(
        tndi.affine_transform(x, M, off, order=order, mode=mode, cval=1.5)
    )
    assert spy_calls, "row-gather path was not taken"
    np.testing.assert_allclose(got, exp, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("reshape", [False, True])
def test_rotate_plane_rowgather_vs_scipy(f32_coords, spy_calls, order,
                                         reshape):
    rng = np.random.RandomState(1)
    x = rng.rand(40, 30, 130).astype(np.float32)
    exp = sndi.rotate(
        x.astype(np.float64), 31.0, axes=(0, 1), reshape=reshape,
        order=order,
    )
    got = np.asarray(
        tndi.rotate(x, 31.0, axes=(0, 1), reshape=reshape, order=order)
    )
    assert spy_calls, "row-gather path was not taken"
    np.testing.assert_allclose(got, exp, atol=3e-5, rtol=1e-5)


def test_midaxis_batch(f32_coords, spy_calls):
    rng = np.random.RandomState(2)
    a = np.deg2rad(17.0)
    c, s = np.cos(a), np.sin(a)
    M = np.eye(3)
    M[0, 0], M[0, 2], M[2, 0], M[2, 2] = c, -s, s, c
    x = rng.rand(30, 150, 24).astype(np.float32)
    exp = sndi.affine_transform(x.astype(np.float64), M, order=1,
                                mode="reflect")
    got = np.asarray(tndi.affine_transform(x, M, order=1, mode="reflect"))
    assert spy_calls, "row-gather path was not taken"
    np.testing.assert_allclose(got, exp, atol=3e-5, rtol=1e-5)


def test_narrow_batch_falls_back(f32_coords, spy_calls):
    """Batches below the lane threshold keep the GTG/one-hot route."""
    rng = np.random.RandomState(3)
    x = rng.rand(24, 20, 8).astype(np.float32)
    exp = sndi.affine_transform(x.astype(np.float64), _rot3(23.0), order=1)
    got = np.asarray(tndi.affine_transform(x, _rot3(23.0), order=1))
    assert not spy_calls, "row-gather should not engage for 8 lanes"
    np.testing.assert_allclose(got, exp, atol=3e-5, rtol=1e-5)


def test_f64_parity_path_unchanged():
    """Default CPU x64 policy keeps the exact dense path (knife-edge
    coordinate resolution identical to scipy's C-double math)."""
    rng = np.random.RandomState(4)
    x = rng.rand(24, 20, 140)
    exp = sndi.rotate(x, 90.0, axes=(0, 1), reshape=False, order=1)
    got = np.asarray(tndi.rotate(x, 90.0, axes=(0, 1), reshape=False,
                                 order=1))
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)
