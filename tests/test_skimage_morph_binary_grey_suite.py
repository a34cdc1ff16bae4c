"""Port of the reference skimage.morphology binary and grey suites
(cupyimg/skimage/morphology/tests/test_binary.py, test_grey.py) onto
jnp + cupyimg_tpu.

Adaptations: ``skimage.data.astronaut()`` is replaced by a synthetic
boolean image; the ``gray_morph_output.npz`` golden (shipped with CPU
skimage, not available offline) is covered instead by a
product-over-selems equivalence check against scipy.ndimage; ``out=``
arguments are rejected by this functional framework, so the
discontiguous-out tests assert that contract.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import scipy.ndimage as sndi

from cupyimg_tpu.skimage.util import img_as_bool, img_as_uint
from cupyimg_tpu.skimage.morphology import binary, grey, selem
from cupyimg_tpu.scipy import ndimage as ndi

assert_array_equal = np.testing.assert_array_equal
assert_allclose = np.testing.assert_allclose


def _synthetic_bw():
    yy, xx = np.mgrid[0:256, 0:256]
    img = (
        np.sin(yy / 7.0) + np.cos(xx / 11.0) + np.sin((xx + yy) / 23.0)
    )
    return jnp.asarray(img > 0.4)


bw_img = _synthetic_bw()


def test_non_square_image():
    strel = selem.square(3)
    binary_res = binary.binary_erosion(bw_img[:100, :200], strel)
    grey_res = img_as_bool(grey.erosion(bw_img[:100, :200], strel))
    assert_array_equal(binary_res, grey_res)


def test_binary_erosion():
    strel = selem.square(3)
    binary_res = binary.binary_erosion(bw_img, strel)
    grey_res = img_as_bool(grey.erosion(bw_img, strel))
    assert_array_equal(binary_res, grey_res)


def test_binary_dilation():
    strel = selem.square(3)
    binary_res = binary.binary_dilation(bw_img, strel)
    grey_res = img_as_bool(grey.dilation(bw_img, strel))
    assert_array_equal(binary_res, grey_res)


def test_binary_closing():
    strel = selem.square(3)
    binary_res = binary.binary_closing(bw_img, strel)
    grey_res = img_as_bool(grey.closing(bw_img, strel))
    assert_array_equal(binary_res, grey_res)


def test_binary_opening():
    strel = selem.square(3)
    binary_res = binary.binary_opening(bw_img, strel)
    grey_res = img_as_bool(grey.opening(bw_img, strel))
    assert_array_equal(binary_res, grey_res)


def test_selem_overflow():
    strel = np.ones((17, 17), dtype=np.uint8)
    img = np.zeros((20, 20), dtype=bool)
    img[2:19, 2:19] = True
    img = jnp.asarray(img)
    binary_res = binary.binary_erosion(img, strel)
    grey_res = img_as_bool(grey.erosion(img, strel))
    assert_array_equal(binary_res, grey_res)


def test_out_argument():
    # the reference writes through `out=`; this functional framework
    # rejects it loudly instead of silently ignoring the buffer
    for func in (binary.binary_erosion, binary.binary_dilation):
        strel = np.ones((3, 3), dtype=np.uint8)
        img = jnp.ones((10, 10))
        out = np.zeros((10, 10))
        with pytest.raises(NotImplementedError):
            func(img, strel, out=out)


binary_functions = [
    binary.binary_erosion,
    binary.binary_dilation,
    binary.binary_opening,
    binary.binary_closing,
]


_DEFAULT_SELEM_IMAGE = jnp.asarray(
    np.array(
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 0, 0, 1, 0, 0],
            [0, 0, 1, 1, 1, 0, 0, 1, 0, 0],
            [0, 0, 1, 1, 1, 0, 0, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        np.uint8,
    )
)


@pytest.mark.parametrize("function", binary_functions)
def test_default_selem(function):
    strel = selem.diamond(radius=1)
    im_expected = function(_DEFAULT_SELEM_IMAGE, strel)
    im_test = function(_DEFAULT_SELEM_IMAGE)
    assert_array_equal(im_expected, im_test)


def test_3d_fallback_default_selem():
    # 3x3x3 cube inside a 7x7x7 image:
    image = np.zeros((7, 7, 7), bool)
    image[2:-2, 2:-2, 2:-2] = 1
    image = jnp.asarray(image)

    opened = binary.binary_opening(image)

    # expect a "hyper-cross" centered in the 5x5x5:
    image_expected = np.zeros((7, 7, 7), dtype=bool)
    image_expected[2:5, 2:5, 2:5] = np.asarray(
        ndi.generate_binary_structure(3, 1)
    )
    assert_array_equal(opened, image_expected)


binary_3d_fallback_functions = [
    binary.binary_opening,
    binary.binary_closing,
]


@pytest.mark.parametrize("function", binary_3d_fallback_functions)
def test_3d_fallback_cube_selem(function):
    image = np.zeros((7, 7, 7), bool)
    image[2:-2, 2:-2, 2:-2] = 1
    image = jnp.asarray(image)

    cube = np.ones((3, 3, 3), dtype=np.uint8)

    new_image = function(image, cube)
    assert_array_equal(new_image, image)


def test_2d_ndimage_equivalence():
    image = np.zeros((9, 9), np.uint16)
    image[2:-2, 2:-2] = 2 ** 14
    image[3:-3, 3:-3] = 2 ** 15
    image[4, 4] = 2 ** 16 - 1
    image = jnp.asarray(image)

    bin_opened = binary.binary_opening(image)
    bin_closed = binary.binary_closing(image)

    strel = ndi.generate_binary_structure(2, 1)
    ndimage_opened = ndi.binary_opening(image, structure=strel)
    ndimage_closed = ndi.binary_closing(image, structure=strel)

    assert_array_equal(bin_opened, ndimage_opened)
    assert_array_equal(bin_closed, ndimage_closed)


def test_binary_output_2d():
    image = np.zeros((9, 9), np.uint16)
    image[2:-2, 2:-2] = 2 ** 14
    image[3:-3, 3:-3] = 2 ** 15
    image[4, 4] = 2 ** 16 - 1
    image = jnp.asarray(image)

    bin_opened = binary.binary_opening(image)
    bin_closed = binary.binary_closing(image)

    np.testing.assert_equal(np.dtype(bin_opened.dtype), np.bool_)
    np.testing.assert_equal(np.dtype(bin_closed.dtype), np.bool_)


def test_binary_output_3d():
    image = np.zeros((9, 9, 9), np.uint16)
    image[2:-2, 2:-2, 2:-2] = 2 ** 14
    image[3:-3, 3:-3, 3:-3] = 2 ** 15
    image[4, 4, 4] = 2 ** 16 - 1
    image = jnp.asarray(image)

    bin_opened = binary.binary_opening(image)
    bin_closed = binary.binary_closing(image)

    np.testing.assert_equal(np.dtype(bin_opened.dtype), np.bool_)
    np.testing.assert_equal(np.dtype(bin_closed.dtype), np.bool_)


# ----------------------------------------------------------------- grey


def test_gray_morphology_vs_ndimage():
    """Stand-in for the reference's gray_morph_output.npz golden (the
    .npz ships with CPU skimage): the same (selem x size x op) product
    checked against scipy.ndimage on a synthetic ubyte image."""
    rng = np.random.RandomState(7)
    image = (rng.rand(30, 31) * 255).astype(np.uint8)
    jimage = jnp.asarray(image)

    pairs = [
        (grey.erosion, sndi.grey_erosion),
        (grey.dilation, sndi.grey_dilation),
        (grey.opening, sndi.grey_opening),
        (grey.closing, sndi.grey_closing),
        (grey.white_tophat, sndi.white_tophat),
        (grey.black_tophat, sndi.black_tophat),
    ]
    for n in range(1, 4):
        for strel_fn in (selem.square, selem.diamond, selem.disk,
                         selem.star):
            s = np.asarray(strel_fn(n)).astype(bool)
            if any(d % 2 == 0 for d in s.shape):
                # even selems use skimage's shifted-origin convention,
                # which scipy's default origin does not reproduce; the
                # eccentric-selem tests cover that convention
                continue
            for ours, ref in pairs:
                got = ours(jimage, jnp.asarray(s))
                want = ref(image, footprint=s)
                assert_array_equal(
                    got, want,
                    err_msg=f"{ours.__name__} {strel_fn.__name__} {n}",
                )


class TestEccentricStructuringElements:
    def setup_method(self):
        black = 255 * np.ones((4, 4), dtype=np.uint8)
        black[1, 1] = 0
        self.black_pixel = jnp.asarray(black)
        self.white_pixel = 255 - self.black_pixel
        self.selems = [
            selem.square(2),
            selem.rectangle(2, 2),
            selem.rectangle(2, 1),
            selem.rectangle(1, 2),
        ]

    def test_dilate_erode_symmetry(self):
        for s in self.selems:
            c = grey.erosion(self.black_pixel, s)
            d = grey.dilation(self.white_pixel, s)
            assert np.all(np.asarray(c) == (255 - np.asarray(d)))

    def test_open_black_pixel(self):
        for s in self.selems:
            grey_open = grey.opening(self.black_pixel, s)
            assert np.all(
                np.asarray(grey_open) == np.asarray(self.black_pixel)
            )

    def test_close_white_pixel(self):
        for s in self.selems:
            grey_close = grey.closing(self.white_pixel, s)
            assert np.all(
                np.asarray(grey_close) == np.asarray(self.white_pixel)
            )

    def test_open_white_pixel(self):
        for s in self.selems:
            assert np.all(
                np.asarray(grey.opening(self.white_pixel, s)) == 0
            )

    def test_close_black_pixel(self):
        for s in self.selems:
            assert np.all(
                np.asarray(grey.closing(self.black_pixel, s)) == 255
            )

    def test_white_tophat_white_pixel(self):
        for s in self.selems:
            tophat = grey.white_tophat(self.white_pixel, s)
            assert_array_equal(tophat, self.white_pixel)

    def test_black_tophat_black_pixel(self):
        for s in self.selems:
            tophat = grey.black_tophat(self.black_pixel, s)
            assert_array_equal(
                tophat, 255 - np.asarray(self.black_pixel)
            )

    def test_white_tophat_black_pixel(self):
        for s in self.selems:
            tophat = grey.white_tophat(self.black_pixel, s)
            assert np.all(np.asarray(tophat) == 0)

    def test_black_tophat_white_pixel(self):
        for s in self.selems:
            tophat = grey.black_tophat(self.white_pixel, s)
            assert np.all(np.asarray(tophat) == 0)


grey_functions = [
    grey.erosion,
    grey.dilation,
    grey.opening,
    grey.closing,
    grey.white_tophat,
    grey.black_tophat,
]


@pytest.mark.parametrize("function", grey_functions)
def test_grey_default_selem(function):
    strel = selem.diamond(radius=1)
    im_expected = function(_DEFAULT_SELEM_IMAGE, strel)
    im_test = function(_DEFAULT_SELEM_IMAGE)
    assert_array_equal(im_expected, im_test)


def test_grey_3d_fallback_default_selem():
    image = np.zeros((7, 7, 7), bool)
    image[2:-2, 2:-2, 2:-2] = 1
    image = jnp.asarray(image)

    opened = grey.opening(image)

    image_expected = np.zeros((7, 7, 7), dtype=bool)
    image_expected[2:5, 2:5, 2:5] = np.asarray(
        ndi.generate_binary_structure(3, 1)
    )
    assert_array_equal(opened, image_expected)


@pytest.mark.parametrize("function", [grey.closing, grey.opening])
def test_grey_3d_fallback_cube_selem(function):
    image = np.zeros((7, 7, 7), bool)
    image[2:-2, 2:-2, 2:-2] = 1
    image = jnp.asarray(image)

    cube = np.ones((3, 3, 3), dtype=np.uint8)

    new_image = function(image, cube)
    assert_array_equal(new_image, image)


def test_3d_fallback_white_tophat():
    image = np.zeros((7, 7, 7), dtype=bool)
    image[2, 2:4, 2:4] = 1
    image[3, 2:5, 2:5] = 1
    image[4, 3:5, 3:5] = 1
    image = jnp.asarray(image)

    new_image = grey.white_tophat(image)
    footprint = np.asarray(ndi.generate_binary_structure(3, 1))
    image_expected = ndi.white_tophat(
        image.astype(jnp.uint8), footprint=footprint
    )
    assert_array_equal(new_image, image_expected)


def test_3d_fallback_black_tophat():
    image = np.ones((7, 7, 7), dtype=bool)
    image[2, 2:4, 2:4] = 0
    image[3, 2:5, 2:5] = 0
    image[4, 3:5, 3:5] = 0
    image = jnp.asarray(image)

    new_image = grey.black_tophat(image)
    footprint = np.asarray(ndi.generate_binary_structure(3, 1))
    image_expected = ndi.black_tophat(
        image.astype(jnp.uint8), footprint=footprint
    )
    assert_array_equal(new_image, image_expected)


def test_grey_2d_ndimage_equivalence():
    image = np.zeros((9, 9), np.uint8)
    image[2:-2, 2:-2] = 128
    image[3:-3, 3:-3] = 196
    image[4, 4] = 255
    image = jnp.asarray(image)

    opened = grey.opening(image)
    closed = grey.closing(image)

    strel = np.asarray(ndi.generate_binary_structure(2, 1))
    ndimage_opened = ndi.grey_opening(image, footprint=strel)
    ndimage_closed = ndi.grey_closing(image, footprint=strel)

    assert_array_equal(opened, ndimage_opened)
    assert_array_equal(closed, ndimage_closed)


# float test images
im = jnp.asarray(
    [[0.55, 0.72, 0.6, 0.54, 0.42],
     [0.65, 0.44, 0.89, 0.96, 0.38],
     [0.79, 0.53, 0.57, 0.93, 0.07],
     [0.09, 0.02, 0.83, 0.78, 0.87],
     [0.98, 0.8, 0.46, 0.78, 0.12]]
)

eroded = jnp.asarray(
    [[0.55, 0.44, 0.54, 0.42, 0.38],
     [0.44, 0.44, 0.44, 0.38, 0.07],
     [0.09, 0.02, 0.53, 0.07, 0.07],
     [0.02, 0.02, 0.02, 0.78, 0.07],
     [0.09, 0.02, 0.46, 0.12, 0.12]]
)

dilated = jnp.asarray(
    [[0.72, 0.72, 0.89, 0.96, 0.54],
     [0.79, 0.89, 0.96, 0.96, 0.96],
     [0.79, 0.79, 0.93, 0.96, 0.93],
     [0.98, 0.83, 0.83, 0.93, 0.87],
     [0.98, 0.98, 0.83, 0.78, 0.87]]
)

opened = jnp.asarray(
    [[0.55, 0.55, 0.54, 0.54, 0.42],
     [0.55, 0.44, 0.54, 0.44, 0.38],
     [0.44, 0.53, 0.53, 0.78, 0.07],
     [0.09, 0.02, 0.78, 0.78, 0.78],
     [0.09, 0.46, 0.46, 0.78, 0.12]]
)

closed = jnp.asarray(
    [[0.72, 0.72, 0.72, 0.54, 0.54],
     [0.72, 0.72, 0.89, 0.96, 0.54],
     [0.79, 0.79, 0.79, 0.93, 0.87],
     [0.79, 0.79, 0.83, 0.78, 0.87],
     [0.98, 0.83, 0.78, 0.78, 0.78]]
)


def test_float():
    assert_allclose(grey.erosion(im), eroded)
    assert_allclose(grey.dilation(im), dilated)
    assert_allclose(grey.opening(im), opened)
    assert_allclose(grey.closing(im), closed)


def test_uint16():
    im16, eroded16, dilated16, opened16, closed16 = map(
        img_as_uint, [im, eroded, dilated, opened, closed]
    )
    assert_allclose(grey.erosion(im16), eroded16)
    assert_allclose(grey.dilation(im16), dilated16)
    assert_allclose(grey.opening(im16), opened16)
    assert_allclose(grey.closing(im16), closed16)


def test_discontiguous_out_array():
    # the reference writes through a strided view; this functional
    # framework rejects `out=` loudly
    image = jnp.asarray(
        np.asarray([[5, 6, 2], [7, 2, 2], [3, 5, 1]], np.uint8)
    )
    out_array = np.zeros((3, 3), np.uint8)
    with pytest.raises(NotImplementedError):
        grey.dilation(image, out=out_array)
    with pytest.raises(NotImplementedError):
        grey.erosion(image, out=out_array)


def test_1d_erosion():
    image = jnp.array([1, 2, 3, 2, 1])
    expected = np.array([1, 1, 2, 1, 1])
    eroded1 = grey.erosion(image)
    assert_array_equal(eroded1, expected)
