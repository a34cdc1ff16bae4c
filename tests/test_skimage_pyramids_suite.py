"""Port of the reference skimage.transform pyramid suite
(cupyimg/skimage/transform/tests/test_pyramids.py) onto jnp +
cupyimg_tpu.  ``skimage.data.astronaut()`` is replaced by a
deterministic synthetic RGB image with full [0, 255] range."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.skimage.transform import pyramids

assert_array_equal = np.testing.assert_array_equal
assert_almost_equal = np.testing.assert_almost_equal


def _synthetic_astronaut():
    yy, xx = np.mgrid[0:512, 0:512]
    r = 128 + 80 * np.sin(yy / 19.0) + 47 * np.cos(xx / 31.0)
    g = np.rot90(r)
    b = 255.0 * (yy + xx) / 1022.0
    img = np.stack([r, g, b], axis=-1)
    # hit the exact 0/255 endpoints so ptp() checks see the full range
    img.reshape(-1, 3)[0] = [0, 0, 0]
    img.reshape(-1, 3)[-1] = [255, 255, 255]
    return np.clip(img, 0, 255).astype(np.uint8)


image = jnp.asarray(_synthetic_astronaut())
image_gray = image[..., 0]
_rng = np.random.RandomState(42)


def test_pyramid_reduce_rgb():
    rows, cols, dim = image.shape
    out = pyramids.pyramid_reduce(image, downscale=2, multichannel=True)
    assert_array_equal(out.shape, (rows / 2, cols / 2, dim))


def test_pyramid_reduce_gray():
    rows, cols = image_gray.shape
    out1 = pyramids.pyramid_reduce(
        image_gray, downscale=2, multichannel=False
    )
    assert_array_equal(out1.shape, (rows / 2, cols / 2))
    assert_almost_equal(float(np.ptp(np.asarray(out1))), 1.0, decimal=2)
    out2 = pyramids.pyramid_reduce(
        image_gray, downscale=2, multichannel=False, preserve_range=True
    )
    assert_almost_equal(
        float(np.ptp(np.asarray(out2)))
        / float(np.ptp(np.asarray(image_gray))),
        1.0,
        decimal=2,
    )


def test_pyramid_reduce_nd():
    for ndim in [1, 2, 3, 4]:
        img = jnp.asarray(_rng.randn(*((8,) * ndim)))
        out = pyramids.pyramid_reduce(
            img, downscale=2, multichannel=False
        )
        expected_shape = np.asarray(img.shape) / 2
        assert_array_equal(out.shape, expected_shape)


def test_pyramid_expand_rgb():
    rows, cols, dim = image.shape
    out = pyramids.pyramid_expand(image, upscale=2, multichannel=True)
    assert_array_equal(out.shape, (rows * 2, cols * 2, dim))


def test_pyramid_expand_gray():
    rows, cols = image_gray.shape
    out = pyramids.pyramid_expand(
        image_gray, upscale=2, multichannel=False
    )
    assert_array_equal(out.shape, (rows * 2, cols * 2))


def test_pyramid_expand_nd():
    for ndim in [1, 2, 3, 4]:
        img = jnp.asarray(_rng.randn(*((4,) * ndim)))
        out = pyramids.pyramid_expand(img, upscale=2, multichannel=False)
        expected_shape = np.asarray(img.shape) * 2
        assert_array_equal(out.shape, expected_shape)


def test_build_gaussian_pyramid_rgb():
    rows, cols, dim = image.shape
    pyramid = pyramids.pyramid_gaussian(
        image, downscale=2, multichannel=True
    )
    for layer, out in enumerate(pyramid):
        layer_shape = (rows / 2 ** layer, cols / 2 ** layer, dim)
        assert_array_equal(out.shape, layer_shape)


def test_build_gaussian_pyramid_gray():
    rows, cols = image_gray.shape
    pyramid = pyramids.pyramid_gaussian(
        image_gray, downscale=2, multichannel=False
    )
    for layer, out in enumerate(pyramid):
        layer_shape = (rows / 2 ** layer, cols / 2 ** layer)
        assert_array_equal(out.shape, layer_shape)


def test_build_gaussian_pyramid_nd():
    for ndim in [1, 2, 3, 4]:
        img = jnp.asarray(_rng.randn(*((8,) * ndim)))
        original_shape = np.asarray(img.shape)
        pyramid = pyramids.pyramid_gaussian(
            img, downscale=2, multichannel=False
        )
        for layer, out in enumerate(pyramid):
            layer_shape = original_shape / 2 ** layer
            assert_array_equal(out.shape, layer_shape)


def test_build_laplacian_pyramid_rgb():
    rows, cols, dim = image.shape
    pyramid = pyramids.pyramid_laplacian(
        image, downscale=2, multichannel=True
    )
    for layer, out in enumerate(pyramid):
        layer_shape = (rows / 2 ** layer, cols / 2 ** layer, dim)
        assert_array_equal(out.shape, layer_shape)


def test_build_laplacian_pyramid_nd():
    for ndim in [1, 2, 3, 4]:
        img = jnp.asarray(_rng.randn(*(16,) * ndim))
        original_shape = np.asarray(img.shape)
        pyramid = pyramids.pyramid_laplacian(
            img, downscale=2, multichannel=False
        )
        for layer, out in enumerate(pyramid):
            layer_shape = original_shape / 2 ** layer
            assert_array_equal(out.shape, layer_shape)


def test_laplacian_pyramid_max_layers():
    for downscale in [2, 3, 5, 7]:
        img = jnp.asarray(_rng.randn(32, 8))
        pyramid = pyramids.pyramid_laplacian(
            img, downscale=downscale, multichannel=False
        )
        max_layer = int(np.ceil(math.log(np.max(img.shape), downscale)))
        for layer, out in enumerate(pyramid):
            if layer < max_layer:
                # should not reach size 1 on all axes before the last level
                assert np.max(out.shape) > 1

        # total number of images is max_layer + 1
        assert max_layer == layer

        # final layer should be size 1 on all axes
        assert out.shape == (1, 1)


def test_check_factor():
    with pytest.raises(ValueError):
        pyramids._check_factor(0.99)
    with pytest.raises(ValueError):
        pyramids._check_factor(-2)


@pytest.mark.parametrize(
    "dtype, expected",
    zip(
        ["float32", "float64", "uint8", "int64"],
        ["float32", "float64", "float64", "float64"],
    ),
)
def test_pyramid_gaussian_dtype_support(dtype, expected):
    img = jnp.asarray(_rng.randn(32, 8)).astype(dtype)
    pyramid = pyramids.pyramid_gaussian(img)

    assert all([im.dtype == expected for im in pyramid])
