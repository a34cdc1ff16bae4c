"""Port of the reference skimage.metrics suites
(cupyimg/skimage/metrics/tests/test_structural_similarity.py and
test_simple_metrics.py) onto jnp + cupyimg_tpu.

``skimage.data.camera()`` is not available offline; the module-level
noisy-camera pair is replaced by a deterministic synthetic image with
the same dtype/range characteristics.  The two tests whose oracle is a
hard-coded value of the *real* camera image (IPOL imdiff, legacy
skimage 0.17 mssim) are skipped with that reason, as the reference
itself gates them behind ``with_requires``.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.skimage.metrics import (
    mean_squared_error,
    normalized_root_mse,
    peak_signal_noise_ratio,
    structural_similarity,
)
from cupyimg_tpu.skimage._shared._warnings import expected_warnings

assert_equal = np.testing.assert_array_equal
assert_almost_equal = np.testing.assert_array_almost_equal


def _synthetic_camera():
    """Deterministic uint8 stand-in for skimage.data.camera()."""
    yy, xx = np.mgrid[0:512, 0:512]
    img = (
        128
        + 90 * np.sin(yy / 23.0)
        + 60 * np.cos(xx / 17.0)
        + 40 * np.sin((xx + yy) / 41.0)
    )
    rnd = np.random.RandomState(99)
    img = img + 10 * rnd.rand(512, 512)
    return np.clip(img, 0, 255).astype(np.uint8)


np.random.seed(5)
cam = _synthetic_camera()
sigma = 20.0
noise = sigma * np.random.randn(*cam.shape)
cam_noisy = np.clip(cam.astype(np.float64) + noise, 0, 255).astype(cam.dtype)


# ---------------------------------------------------------------- SSIM


def test_structural_similarity_patch_range():
    N = 51
    rstate = np.random.RandomState(1234)
    X = (rstate.rand(N, N) * 255).astype(np.uint8)
    Y = (rstate.rand(N, N) * 255).astype(np.uint8)

    assert float(structural_similarity(X, Y, win_size=N)) < 0.1
    assert_equal(float(structural_similarity(X, X, win_size=N)), 1)


def test_structural_similarity_image():
    N = 100
    rstate = np.random.RandomState(1234)
    X = (rstate.rand(N, N) * 255).astype(np.uint8)
    Y = (rstate.rand(N, N) * 255).astype(np.uint8)

    S0 = float(structural_similarity(X, X, win_size=3))
    assert_equal(S0, 1)

    S1 = float(structural_similarity(X, Y, win_size=3))
    assert S1 < 0.3

    S2 = float(structural_similarity(X, Y, win_size=11, gaussian_weights=True))
    assert S2 < 0.3

    mssim0, S3 = structural_similarity(X, Y, full=True)
    assert S3.shape == X.shape
    mssim = structural_similarity(X, Y)
    assert_equal(float(mssim0), float(mssim))

    assert_equal(float(structural_similarity(X, X)), 1.0)


@pytest.mark.parametrize("seed", [1, 2, 3, 5, 8, 13])
def test_structural_similarity_grad(seed):
    N = 30
    rnd = np.random.RandomState(seed)
    X = rnd.rand(N, N) * 255
    Y = rnd.rand(N, N) * 255

    f = float(structural_similarity(X, Y, data_range=255))
    g = structural_similarity(X, Y, data_range=255, gradient=True)

    assert f < 0.05
    assert float(g[0]) < 0.05
    assert np.all(np.asarray(g[1]) < 0.05)

    mssim, grad, s = structural_similarity(
        X, Y, data_range=255, gradient=True, full=True
    )
    assert np.all(np.asarray(grad) < 0.05)


def test_structural_similarity_dtype():
    N = 30
    rstate = np.random.RandomState(1234)
    X = rstate.rand(N, N)
    Y = rstate.rand(N, N)

    S1 = float(structural_similarity(X, Y))

    X = (X * 255).astype(np.uint8)
    Y = (X * 255).astype(np.uint8)

    S2 = float(structural_similarity(X, Y))

    assert S1 < 0.15
    assert S2 < 0.15


def test_structural_similarity_multichannel():
    N = 100
    rstate = np.random.RandomState(0)
    X = (rstate.rand(N, N) * 255).astype(np.uint8)
    Y = (rstate.rand(N, N) * 255).astype(np.uint8)

    S1 = structural_similarity(X, Y, win_size=3)

    # replicate across three channels: identical value
    Xc = np.tile(X[..., np.newaxis], (1, 1, 3))
    Yc = np.tile(Y[..., np.newaxis], (1, 1, 3))
    S2 = structural_similarity(Xc, Yc, multichannel=True, win_size=3)
    assert_almost_equal(float(S1), float(S2))

    m, S3 = structural_similarity(Xc, Yc, multichannel=True, full=True)
    assert S3.shape == Xc.shape

    m, grad = structural_similarity(Xc, Yc, multichannel=True, gradient=True)
    assert grad.shape == Xc.shape

    m, grad, S3 = structural_similarity(
        Xc, Yc, multichannel=True, full=True, gradient=True
    )
    assert grad.shape == Xc.shape
    assert S3.shape == Xc.shape

    # fail if win_size exceeds any non-channel dimension
    with pytest.raises(ValueError):
        structural_similarity(Xc, Yc, win_size=7, multichannel=False)


def test_structural_similarity_nD():
    N = 10
    rstate = np.random.RandomState(3)
    for ndim in range(1, 5):
        # the reference builds [N] * 5 regardless of the loop variable
        # (small 1-D randoms would not reliably satisfy the bound)
        xsize = [N] * 5
        X = (rstate.rand(*xsize) * 255).astype(np.uint8)
        Y = (rstate.rand(*xsize) * 255).astype(np.uint8)

        mssim = float(structural_similarity(X, Y, win_size=3))
        assert mssim < 0.05


def test_structural_similarity_multichannel_chelsea():
    # color-image stand-in: three channels of the synthetic camera
    rstate = np.random.RandomState(7)
    Xc = np.stack(
        [
            cam,
            np.roll(cam, 5, axis=0),
            np.roll(cam, -3, axis=1),
        ],
        axis=-1,
    )
    Yc = np.clip(
        Xc.astype(np.float64) + 15.0 * rstate.randn(*Xc.shape), 0, 255
    ).astype(Xc.dtype)

    # multichannel result should be the mean of per-channel results
    mssim = structural_similarity(Xc, Yc, multichannel=True)
    mssim_sep = [
        float(structural_similarity(Yc[..., c], Xc[..., c]))
        for c in range(Xc.shape[-1])
    ]
    assert_almost_equal(float(mssim), np.mean(mssim_sep))

    assert_equal(
        float(structural_similarity(Xc, Xc, multichannel=True)), 1.0
    )


@pytest.mark.skip(
    reason="oracle is an IPOL imdiff value of the real skimage camera "
    "image, unavailable offline"
)
def test_gaussian_structural_similarity_vs_IPOL():
    mssim_IPOL = 0.357959091663361
    mssim = structural_similarity(
        cam, cam_noisy, gaussian_weights=True, use_sample_covariance=False
    )
    assert_almost_equal(float(mssim), mssim_IPOL, decimal=3)


@pytest.mark.skip(
    reason="oracle is the skimage-0.17 mssim of the real camera image, "
    "unavailable offline"
)
def test_mssim_vs_legacy():
    mssim_skimage_0pt17 = 0.3674518327910367
    mssim = structural_similarity(cam, cam_noisy)
    assert_almost_equal(float(mssim), mssim_skimage_0pt17)


def test_mssim_mixed_dtype():
    mssim = structural_similarity(cam, cam_noisy)
    with expected_warnings(["Inputs have mismatched dtype"]):
        mssim_mixed = structural_similarity(
            cam, cam_noisy.astype(np.float32)
        )
    assert_almost_equal(float(mssim), float(mssim_mixed))

    # no warning when the user supplies data_range
    mssim_mixed = structural_similarity(
        cam, cam_noisy.astype(np.float32), data_range=255
    )
    assert_almost_equal(float(mssim), float(mssim_mixed))


def test_invalid_input():
    X = np.zeros((9, 9), dtype=np.double)
    Y = np.zeros((8, 8), dtype=np.double)
    with pytest.raises(ValueError):
        structural_similarity(X, Y)
    with pytest.raises(ValueError):
        structural_similarity(X, X, win_size=X.shape[0] + 1)
    with pytest.raises(ValueError):
        structural_similarity(X, X, K1=-0.1)
    with pytest.raises(ValueError):
        structural_similarity(X, X, K2=-0.1)
    with pytest.raises(ValueError):
        structural_similarity(X, X, sigma=-1.0)


# ------------------------------------------------------- simple metrics


@pytest.mark.skip(
    reason="oracle is an IPOL imdiff value of the real skimage camera "
    "image, unavailable offline"
)
def test_PSNR_vs_IPOL():
    p_IPOL = 22.409353363576034
    p = peak_signal_noise_ratio(cam, cam_noisy)
    assert_almost_equal(float(p), p_IPOL, decimal=4)


def test_PSNR_float():
    p_uint8 = peak_signal_noise_ratio(cam, cam_noisy)
    camf = cam / 255.0
    cam_noisyf = cam_noisy / 255.0
    p_float64 = peak_signal_noise_ratio(camf, cam_noisyf, data_range=1)
    assert_almost_equal(float(p_uint8), float(p_float64), decimal=5)

    # mixed precision inputs
    p_mixed = peak_signal_noise_ratio(
        camf, (cam_noisy.astype(np.float32)) / 255.0, data_range=1
    )
    assert_almost_equal(float(p_mixed), float(p_float64), decimal=4)

    # mismatched dtype warns when data_range is unspecified
    with expected_warnings(["Inputs have mismatched dtype"]):
        p_mixed = peak_signal_noise_ratio(
            camf, (cam_noisy.astype(np.float32)) / 255.0
        )
    assert_almost_equal(float(p_mixed), float(p_float64), decimal=4)


def test_PSNR_errors():
    with pytest.raises(ValueError):
        peak_signal_noise_ratio(cam, cam[:-1, :])


def test_NRMSE():
    x = np.ones(4)
    y = np.asarray([0.0, 2.0, 2.0, 2.0])
    assert_equal(
        float(normalized_root_mse(y, x, normalization="mean")),
        1 / np.mean(y),
    )
    assert_equal(
        float(normalized_root_mse(y, x, normalization="euclidean")),
        1 / np.sqrt(3),
    )
    assert_equal(
        float(normalized_root_mse(y, x, normalization="min-max")),
        1 / (y.max() - y.min()),
    )

    # mixed precision inputs are allowed
    assert_almost_equal(
        float(
            normalized_root_mse(
                y, x.astype(np.float32), normalization="min-max"
            )
        ),
        1 / (y.max() - y.min()),
    )


def test_NRMSE_no_int_overflow():
    camf = cam.astype(np.float32)
    cam_noisyf = cam_noisy.astype(np.float32)
    assert_almost_equal(
        float(mean_squared_error(cam, cam_noisy)),
        float(mean_squared_error(camf, cam_noisyf)),
    )
    assert_almost_equal(
        float(normalized_root_mse(cam, cam_noisy)),
        float(normalized_root_mse(camf, cam_noisyf)),
        decimal=5,
    )


def test_NRMSE_errors():
    x = np.ones(4)
    with pytest.raises(ValueError):
        normalized_root_mse(x[:-1], x)
    with pytest.raises(ValueError):
        normalized_root_mse(x, x, normalization="foo")
