"""Gather-transpose-gather affine kernel (ops/gtg_interp.py).

Runs the Pallas kernel in interpret mode on the CPU backend and checks
exact-tap parity against scipy.ndimage.affine_transform (f64 oracle,
prefilter=False so spline-tap arithmetic is isolated from the IIR
stage).  Reference behavior: cupyimg affine kernels,
cupyimg/scipy/ndimage/_interp_kernels.py:178-242, 690-751.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.ndimage as sndi

from cupyimg_tpu.ops import gtg_interp


def _rot(deg):
    th = np.deg2rad(deg)
    return np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    )


def _compare(x, m, off, order, mode, atol):
    out = gtg_interp.affine_gtg_2d(
        jnp.asarray(x), m, off, order, mode, 0.0, x.shape,
        interpret=True,
    )
    if out is None:
        pytest.skip("plan gates reject this transform")
    ref = sndi.affine_transform(
        x.astype(np.float64), m, offset=off, order=order, mode=mode,
        cval=0.0, prefilter=False,
    )
    got = np.asarray(out, dtype=np.float64)
    if mode in ("constant", "grid-constant"):
        # the outer-cval mask is applied by the caller
        # (scipy/ndimage/interpolation.py); compare interior points
        ii, jj = np.mgrid[0 : x.shape[0], 0 : x.shape[1]]
        r = m[0, 0] * ii + m[0, 1] * jj + off[0]
        c = m[1, 0] * ii + m[1, 1] * jj + off[1]
        valid = (
            (r >= 1)
            & (r <= x.shape[0] - 2)
            & (c >= 1)
            & (c <= x.shape[1] - 2)
        )
    else:
        valid = np.ones(x.shape, bool)
    assert valid.any()
    err = np.abs(got - ref)[valid]
    if order == 0:
        # f32 coordinate quantization flips round-half ties that the
        # f64 oracle resolves the other way (shared limitation of all
        # f32 engines here); bound the flip fraction instead
        frac = np.mean(err > 1e-6)
        assert frac < 1e-3, f"tap-flip fraction {frac:.2e}"
    else:
        assert err.max() <= atol, f"max err {err.max():.3e}"


@pytest.fixture(scope="module")
def image():
    return np.random.RandomState(0).rand(420, 390).astype(np.float32)


@pytest.mark.parametrize("deg", [4.0, 33.0, 78.0, -17.0])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_rotation_constant(image, deg, order):
    _compare(
        image, _rot(deg), np.array([5.2, -3.7]), order, "constant",
        2e-4 if order else 1e-5,
    )


@pytest.mark.parametrize("mode", ["nearest", "grid-constant"])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_rotation_modes(image, mode, order):
    if order == 0 and mode == "grid-constant":
        pytest.skip("order-0 grid-constant handled by gather premap")
    _compare(
        image, _rot(23.0), np.array([1.5, 2.5]), order, mode,
        2e-4 if order else 1e-5,
    )


@pytest.mark.parametrize("mode", ["reflect", "mirror", "grid-wrap"])
def test_rotation_fold_modes(image, mode):
    # small angle keeps the excursion below one period for folds
    _compare(image, _rot(6.0), np.array([0.7, -1.2]), 1, mode, 1e-4)


def test_swapped_orientation_near_90(image):
    # |d row / d col| > |d row / d row| exercises the transposed-output
    # path (plan swaps the output axes)
    _compare(image, _rot(87.0), np.array([2.0, 350.0]), 1,
             "constant", 1e-4)


def test_anisotropic_affine(image):
    m = np.array([[0.9, 0.21], [-0.17, 1.08]])
    _compare(image, m, np.array([3.0, -8.0]), 1, "constant", 1e-4)


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize(
    "m",
    [
        np.array([[1.0, 0.29731], [0.0, 1.0]]),      # pure shear, a10 == 0
        np.array([[0.90713, 0.29731], [0.0, 0.91441]]),  # a10 == 0, NP == 2
        np.array([[0.90713, 0.0], [0.29731, 0.91441]]),  # a01 == 0
    ],
)
def test_triangular_matrices(image, m, order):
    # a10 == 0 constant-folds the column routing to sublane-replicated
    # vectors; the kernel must use exact-size per-tap grids there (the
    # shared-ext sublane slice crashes Mosaic on replicated layouts)
    _compare(image, m, np.array([2.0, -3.0]), order, "nearest", 2e-4)


def test_np1_fast_path_downscale(image):
    # |a00| >= 1: single inversion pass (NP=1)
    m = np.array([[1.31, 0.2], [-0.2, 1.31]])
    _compare(image, m, np.array([0.0, 0.0]), 3, "constant", 2e-4)


@pytest.mark.parametrize("order", [1, 3])
def test_minification_short_slab(image, order):
    # scale ~0.6 plans an S0 < 128 slab; the B-stage row window must
    # zero-pad up to the 128-lane gather width
    m = np.array([[0.62, 0.11], [-0.11, 0.62]])
    _compare(image, m, np.array([1.5, -2.5]), order, "nearest", 2e-4)


def test_gates_reject_strong_minification():
    m = np.array([[0.3, 0.1], [-0.1, 0.3]])  # both row slopes < 0.5
    assert gtg_interp.gtg_plan(m, 1, (256, 256)) is None


def test_gates_reject_huge_span():
    m = np.array([[4.0, 3.0], [3.0, 4.0]])  # spans exceed every tile
    assert gtg_interp.gtg_plan(m, 1, (256, 256)) is None


def test_plan_swaps_axes():
    plan = gtg_interp.gtg_plan(_rot(80.0), 1, (300, 200))
    assert plan is not None
    swapped, (a00, _, _, _), _, _, _, oshape, _, _ = plan
    assert swapped and abs(a00) > 0.9 and oshape == (200, 300)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_batched_planes(order):
    x = np.random.RandomState(1).rand(5, 220, 240).astype(np.float32)
    m = _rot(21.0)
    off = np.array([3.2, -1.7])
    out = gtg_interp.affine_gtg_batched2d(
        jnp.asarray(x), m, off, order, "constant", 0.0, x.shape[1:],
        interpret=True,
    )
    assert out is not None
    ref = np.stack(
        [
            sndi.affine_transform(
                x[b].astype(np.float64), m, offset=off, order=order,
                mode="constant", prefilter=False,
            )
            for b in range(x.shape[0])
        ]
    )
    ii, jj = np.mgrid[0 : x.shape[1], 0 : x.shape[2]]
    r = m[0, 0] * ii + m[0, 1] * jj + off[0]
    c = m[1, 0] * ii + m[1, 1] * jj + off[1]
    valid = (
        (r >= 1) & (r <= x.shape[1] - 2)
        & (c >= 1) & (c <= x.shape[2] - 2)
    )
    err = np.abs(np.asarray(out, np.float64) - ref) * valid[None]
    if order == 0:
        assert (err > 1e-6).mean() < 1e-3
    else:
        assert err.max() < 3e-4


def test_batched_swapped_orientation():
    x = np.random.RandomState(2).rand(3, 200, 260).astype(np.float32)
    m = _rot(80.0)
    out = gtg_interp.affine_gtg_batched2d(
        jnp.asarray(x), m, np.array([2.0, 200.0]), 1, "constant",
        0.0, x.shape[1:], interpret=True,
    )
    assert out is not None and out.shape == x.shape
    ref = np.stack(
        [
            sndi.affine_transform(
                x[b].astype(np.float64), m, offset=[2.0, 200.0],
                order=1, mode="constant", prefilter=False,
            )
            for b in range(3)
        ]
    )
    ii, jj = np.mgrid[0:200, 0:260]
    r = m[0, 0] * ii + m[0, 1] * jj + 2.0
    c = m[1, 0] * ii + m[1, 1] * jj + 200.0
    valid = (r >= 1) & (r <= 198) & (c >= 1) & (c <= 258)
    err = np.abs(np.asarray(out, np.float64) - ref) * valid[None]
    assert err.max() < 3e-4
