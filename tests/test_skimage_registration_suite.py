"""Port of the reference skimage.registration suites
(cupyimg/skimage/registration/tests/test_phase_cross_correlation.py and
test_tvl1.py) onto jnp + cupyimg_tpu.  ``skimage.data`` images are
replaced by deterministic synthetic stand-ins (textured image for
camera, thresholded smoothed noise for binary_blobs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.scipy.ndimage import fourier_shift, gaussian_filter
from cupyimg_tpu.skimage.registration._phase_cross_correlation import (
    phase_cross_correlation,
    _upsampled_dft,
)
from cupyimg_tpu.skimage.registration import optical_flow_tvl1
from cupyimg_tpu.skimage import img_as_float
from cupyimg_tpu.skimage.transform import warp

assert_allclose = np.testing.assert_allclose

fftn = jnp.fft.fftn
ifftn = jnp.fft.ifftn


def _synthetic_camera():
    yy, xx = np.mgrid[0:256, 0:256]
    rnd = np.random.RandomState(11)
    img = (
        np.sin(yy / 13.0) * 80
        + np.cos(xx / 9.0) * 70
        + np.sin((xx + 2 * yy) / 31.0) * 50
        + rnd.rand(256, 256) * 20
    )
    return jnp.asarray(img.astype(np.float64))


def _binary_blobs(length, n_dim):
    rnd = np.random.RandomState(5)
    vol = rnd.rand(*((length,) * n_dim))
    vol = np.asarray(
        gaussian_filter(jnp.asarray(vol), sigma=length / 16.0)
    )
    return jnp.asarray(vol > np.percentile(vol, 50))


cam = _synthetic_camera()


def test_correlation():
    reference_image = fftn(cam)
    shift = (-7, 12)
    shifted_image = fourier_shift(reference_image, shift)

    # pixel precision
    result, error, diffphase = phase_cross_correlation(
        reference_image, shifted_image, space="fourier"
    )
    assert_allclose(np.asarray(result)[:2], -np.asarray(shift))


def test_subpixel_precision():
    reference_image = fftn(cam)
    subpixel_shift = (-2.4, 1.32)
    shifted_image = fourier_shift(reference_image, subpixel_shift)

    result, error, diffphase = phase_cross_correlation(
        reference_image,
        shifted_image,
        upsample_factor=100,
        space="fourier",
    )
    assert_allclose(
        np.asarray(result)[:2], -np.asarray(subpixel_shift), atol=0.05
    )


def test_real_input():
    reference_image = cam
    subpixel_shift = (-2.4, 1.32)
    shifted_image = fourier_shift(fftn(reference_image), subpixel_shift)
    shifted_image = ifftn(shifted_image)

    result, error, diffphase = phase_cross_correlation(
        reference_image, shifted_image, upsample_factor=100
    )
    assert_allclose(
        np.asarray(result)[:2], -np.asarray(subpixel_shift), atol=0.05
    )


def test_size_one_dimension_input():
    # take a strip of the input image
    reference_image = fftn(cam[:, 15]).reshape((-1, 1))
    subpixel_shift = (-2.4, 4)
    shifted_image = fourier_shift(reference_image, subpixel_shift)

    result, error, diffphase = phase_cross_correlation(
        reference_image,
        shifted_image,
        upsample_factor=20,
        space="fourier",
    )
    assert_allclose(
        np.asarray(result)[:2], -np.asarray((-2.4, 0)), atol=0.05
    )


def test_3d_input():
    phantom = img_as_float(_binary_blobs(length=32, n_dim=3))
    reference_image = fftn(phantom)
    shift = (-2.0, 1.0, 5.0)
    shifted_image = fourier_shift(reference_image, shift)

    result, error, diffphase = phase_cross_correlation(
        reference_image, shifted_image, space="fourier"
    )
    assert_allclose(np.asarray(result), -np.asarray(shift), atol=0.05)

    # subpixel precision for 3-D data
    subpixel_shift = (-2.3, 1.7, 5.4)
    shifted_image = fourier_shift(reference_image, subpixel_shift)
    result, error, diffphase = phase_cross_correlation(
        reference_image,
        shifted_image,
        upsample_factor=100,
        space="fourier",
    )
    assert_allclose(
        np.asarray(result), -np.asarray(subpixel_shift), atol=0.05
    )


def test_unknown_space_input():
    image = jnp.ones((5, 5))
    with pytest.raises(ValueError):
        phase_cross_correlation(image, image, space="frank")


def test_wrong_input():
    # dimensionality mismatch
    image = jnp.ones((5, 5, 1))
    template = jnp.ones((5, 5))
    with pytest.raises(ValueError):
        phase_cross_correlation(template, image)

    # size mismatch
    image = jnp.ones((5, 5))
    template = jnp.ones((4, 4))
    with pytest.raises(ValueError):
        phase_cross_correlation(template, image)


def test_4d_input_pixel():
    phantom = img_as_float(_binary_blobs(length=32, n_dim=4))
    reference_image = fftn(phantom)
    shift = (-2.0, 1.0, 5.0, -3)
    shifted_image = fourier_shift(reference_image, shift)
    result, error, diffphase = phase_cross_correlation(
        reference_image, shifted_image, space="fourier"
    )
    assert_allclose(np.asarray(result), -np.asarray(shift), atol=0.05)


def test_4d_input_subpixel():
    phantom = img_as_float(_binary_blobs(length=32, n_dim=4))
    reference_image = fftn(phantom)
    subpixel_shift = (-2.3, 1.7, 5.4, -3.2)
    shifted_image = fourier_shift(reference_image, subpixel_shift)
    result, error, diffphase = phase_cross_correlation(
        reference_image,
        shifted_image,
        upsample_factor=10,
        space="fourier",
    )
    assert_allclose(
        np.asarray(result), -np.asarray(subpixel_shift), atol=0.05
    )


def test_mismatch_upsampled_region_size():
    with pytest.raises(ValueError):
        _upsampled_dft(
            jnp.ones((4, 4)), upsampled_region_size=[3, 2, 1, 4]
        )


def test_mismatch_offsets_size():
    with pytest.raises(ValueError):
        _upsampled_dft(jnp.ones((4, 4)), 3, axis_offsets=[3, 2, 1, 4])


# ------------------------------------------------------------ TV-L1 flow


def _sin_flow_gen(image0, max_motion=4.5, npics=5):
    """Synthetic ground-truth flow with a sinusoid first component and
    the correspondingly warped image."""
    grid = jnp.stack(
        jnp.meshgrid(
            *[jnp.arange(n) for n in image0.shape], indexing="ij"
        )
    ).astype(jnp.float64)
    gt_flow = jnp.zeros_like(grid)
    gt_flow = gt_flow.at[0, ...].set(
        max_motion
        * jnp.sin(grid[0] / grid[0].max() * npics * np.pi)
    )
    image1 = warp(image0, grid - gt_flow, mode="nearest")
    return gt_flow, image1


def test_2d_motion():
    rnd = np.random.RandomState(0)
    image0 = jnp.asarray(rnd.normal(size=(256, 256)))
    gt_flow, image1 = _sin_flow_gen(image0)
    flow = optical_flow_tvl1(image0, image1, attachment=5)
    # average absolute error less than half a pixel
    assert float(jnp.abs(flow - gt_flow).mean()) < 0.5


@pytest.mark.slow
def test_3d_motion():
    rnd = np.random.RandomState(0)
    # the reference runs 128^3 with max_motion=4.5; at the 64^3 size
    # used here the same *relative* flow magnitude is max_motion=2.5
    image0 = jnp.asarray(rnd.normal(size=(64, 64, 64)))
    gt_flow, image1 = _sin_flow_gen(image0, max_motion=2.5)
    flow = optical_flow_tvl1(image0, image1, attachment=5)
    assert float(jnp.abs(flow - gt_flow).mean()) < 0.5


def test_no_motion_2d():
    rnd = np.random.RandomState(0)
    img = jnp.asarray(rnd.normal(size=(256, 256)))

    flow = optical_flow_tvl1(img, img)

    assert np.all(np.asarray(flow) == 0)


def test_no_motion_3d():
    rnd = np.random.RandomState(0)
    img = jnp.asarray(rnd.normal(size=(64, 64, 64)))

    flow = optical_flow_tvl1(img, img)

    assert np.all(np.asarray(flow) == 0)


def test_optical_flow_dtype():
    rnd = np.random.RandomState(0)
    image0 = jnp.asarray(rnd.normal(size=(256, 256)))
    gt_flow, image1 = _sin_flow_gen(image0)
    flow_f64 = optical_flow_tvl1(
        image0, image1, attachment=5, dtype=np.float64
    )

    assert flow_f64.dtype == np.float64

    flow_f32 = optical_flow_tvl1(
        image0, image1, attachment=5, dtype=np.float32
    )

    assert flow_f32.dtype == np.float32

    # precision does not affect the estimated flow quality
    assert float(jnp.abs(flow_f64 - flow_f32).mean()) < 1e-3


def test_incompatible_shapes():
    rnd = np.random.RandomState(0)
    I0 = jnp.asarray(rnd.normal(size=(256, 256)))
    I1 = jnp.asarray(rnd.normal(size=(128, 256)))
    with pytest.raises(ValueError):
        optical_flow_tvl1(I0, I1)


def test_wrong_dtype():
    rnd = np.random.RandomState(0)
    img = jnp.asarray(rnd.normal(size=(256, 256)))
    with pytest.raises(ValueError):
        optical_flow_tvl1(img, img, dtype=np.int64)
