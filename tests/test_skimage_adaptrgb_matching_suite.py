"""Ported reference adapt_rgb and histogram_matching suites
(cupyimg/skimage/color/tests/test_adapt_rgb.py,
cupyimg/skimage/exposure/tests/test_histogram_matching.py) with
synthetic images standing in for skimage.data's astronaut/camera/
chelsea."""

from functools import partial

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage import img_as_float, img_as_uint
from cupyimg_tpu.skimage import color, filters, exposure
from cupyimg_tpu.skimage.color.adapt_rgb import (
    adapt_rgb,
    each_channel,
    hsv_value,
)
from cupyimg_tpu.skimage.exposure import histogram_matching


def _color_image():
    rng = np.random.RandomState(5)
    base = rng.rand(60, 70, 3)
    import scipy.ndimage as sndi

    return jnp.asarray(
        np.stack(
            [sndi.gaussian_filter(base[..., c], 2.0) for c in range(3)],
            axis=-1,
        )
    )


def _gray_image():
    rng = np.random.RandomState(6)
    import scipy.ndimage as sndi

    return jnp.asarray(sndi.gaussian_filter(rng.rand(64, 64), 2.0))


COLOR_IMAGE = _color_image()
GRAY_IMAGE = _gray_image()
SIGMA = 3
smooth = partial(filters.gaussian, sigma=SIGMA)


@adapt_rgb(each_channel)
def edges_each(image):
    return filters.sobel(image)


@adapt_rgb(each_channel)
def smooth_each(image, sigma):
    return filters.gaussian(image, sigma)


@adapt_rgb(hsv_value)
def edges_hsv(image):
    return filters.sobel(image)


@adapt_rgb(hsv_value)
def smooth_hsv(image, sigma):
    return filters.gaussian(image, sigma)


@adapt_rgb(hsv_value)
def edges_hsv_uint(image):
    return img_as_uint(filters.sobel(image))


def _close(a, b, atol=1e-6):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_gray_scale_image():
    _close(edges_each(GRAY_IMAGE), filters.sobel(GRAY_IMAGE))


def test_each_channel():
    filtered = np.asarray(edges_each(COLOR_IMAGE))
    for i in range(3):
        expected = img_as_float(filters.sobel(COLOR_IMAGE[:, :, i]))
        _close(filtered[..., i], expected)


def test_each_channel_with_filter_argument():
    filtered = np.asarray(smooth_each(COLOR_IMAGE, SIGMA))
    for i in range(3):
        _close(filtered[..., i], smooth(COLOR_IMAGE[:, :, i]))


def test_hsv_value():
    filtered = edges_hsv(COLOR_IMAGE)
    value = color.rgb2hsv(COLOR_IMAGE)[:, :, 2]
    _close(
        color.rgb2hsv(filtered)[:, :, 2], filters.sobel(value),
        atol=1e-5,
    )


def test_hsv_value_with_filter_argument():
    filtered = smooth_hsv(COLOR_IMAGE, SIGMA)
    value = color.rgb2hsv(COLOR_IMAGE)[:, :, 2]
    _close(color.rgb2hsv(filtered)[:, :, 2], smooth(value), atol=1e-5)


def test_hsv_value_with_non_float_output():
    # the uint16 filter output must be rescaled into the HSV value
    # channel rather than inserted raw
    filtered = edges_hsv_uint(COLOR_IMAGE)
    filtered_value = color.rgb2hsv(filtered)[:, :, 2]
    value = color.rgb2hsv(COLOR_IMAGE)[:, :, 2]
    # usually close to unscaled sobel magnitude (uint16 rounding only)
    _close(
        filtered_value,
        img_as_float(img_as_uint(filters.sobel(value))),
        atol=1e-4,
    )


# ---- histogram matching -------------------------------------------------


@pytest.mark.parametrize(
    "array, template, expected_array",
    [
        (np.arange(10), np.arange(100), np.arange(9, 100, 10)),
        (np.random.RandomState(0).rand(4), np.ones(3), np.ones(4)),
    ],
)
def test_match_array_values(array, template, expected_array):
    matched = histogram_matching._match_cumulative_cdf(
        jnp.asarray(array), jnp.asarray(template)
    )
    np.testing.assert_array_almost_equal(
        np.asarray(matched), expected_array
    )


class TestMatchHistogram:
    image_rgb = np.asarray(_color_image())
    template_rgb = np.asarray(
        np.random.RandomState(7).rand(50, 40, 3)
    )

    @pytest.mark.parametrize(
        "image, reference, multichannel",
        [
            (image_rgb, template_rgb, True),
            (image_rgb[:, :, 0], template_rgb[:, :, 0], False),
        ],
    )
    def test_match_histograms(self, image, reference, multichannel):
        """The matched image's empirical cdf must track the
        reference's at every matched value."""
        matched = np.asarray(
            exposure.match_histograms(
                jnp.asarray(image), jnp.asarray(reference),
                multichannel=multichannel,
            )
        )
        matched_pdf = self._empirical_pdf(matched)
        reference_pdf = self._empirical_pdf(reference)
        for channel in range(len(matched_pdf)):
            ref_values, ref_quantiles = reference_pdf[channel]
            m_values, m_quantiles = matched_pdf[channel]
            for i, mv in enumerate(m_values):
                closest = np.abs(ref_values - mv).argmin()
                np.testing.assert_almost_equal(
                    m_quantiles[i], ref_quantiles[closest], decimal=1
                )

    @pytest.mark.parametrize(
        "image, reference",
        [
            (image_rgb, template_rgb[:, :, 0]),
            (image_rgb[:, :, 0], template_rgb),
        ],
    )
    def test_raises_value_error_on_channels_mismatch(
        self, image, reference
    ):
        with pytest.raises(ValueError):
            exposure.match_histograms(
                jnp.asarray(image), jnp.asarray(reference)
            )

    @classmethod
    def _empirical_pdf(cls, image):
        if image.ndim > 2:
            return [
                cls._channel_pdf(image[..., c])
                for c in range(image.shape[-1])
            ]
        return [cls._channel_pdf(image)]

    @staticmethod
    def _channel_pdf(channel):
        values, counts = np.unique(channel.ravel(), return_counts=True)
        quantiles = np.cumsum(counts).astype(np.float64) / channel.size
        return values, quantiles
