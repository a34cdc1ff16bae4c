"""Reference skimage exposure suite port.

Mirrors /root/reference/cupyimg/skimage/exposure/tests/test_exposure.py.
Bundled-data cases (camera/astronaut/moon) use seeded synthetic images;
the data-specific golden SNR constants there are replaced by the
invariants they certify (shape/range preservation, CDF slope ~ 1,
clip-limit equivalence, border processing, Nd consistency).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage import exposure, util
from cupyimg_tpu.skimage.exposure.exposure import intensity_range
from cupyimg_tpu.skimage.color import rgb2gray
from cupyimg_tpu.skimage.util.dtype import dtype_range


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_array_almost_equal(a, b, decimal=6):
    np.testing.assert_array_almost_equal(
        np.asarray(a), np.asarray(b), decimal=decimal
    )


def _camera_like(shape=(256, 256), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(shape[0] // 8 + 2, shape[1] // 8 + 2))
    up = np.kron(base, np.ones((8, 8)))[: shape[0], : shape[1]]
    return jnp.asarray((up * 220 + 10).astype(np.uint8))


# ---------------------------------------------------------------------------
# integer histograms
# ---------------------------------------------------------------------------


def test_wrong_source_range():
    im = jnp.asarray(np.array([-1, 100], dtype=np.int8))
    with pytest.raises(ValueError):
        exposure.histogram(im, source_range="foobar")


def test_negative_overflow():
    im = jnp.asarray(np.array([-1, 100], dtype=np.int8))
    frequencies, bin_centers = exposure.histogram(im)
    assert_array_equal(bin_centers, np.arange(-1, 101))
    assert int(frequencies[0]) == 1
    assert int(frequencies[-1]) == 1
    assert_array_equal(frequencies[1:-1], 0)


def test_all_negative_image():
    im = jnp.asarray(np.array([-100, -1], dtype=np.int8))
    frequencies, bin_centers = exposure.histogram(im)
    assert_array_equal(bin_centers, np.arange(-100, 0))
    assert int(frequencies[0]) == 1
    assert int(frequencies[-1]) == 1
    assert_array_equal(frequencies[1:-1], 0)


def test_int_range_image():
    im = jnp.asarray(np.array([10, 100], dtype=np.int8))
    frequencies, bin_centers = exposure.histogram(im)
    assert len(bin_centers) == len(frequencies)
    assert int(bin_centers[0]) == 10
    assert int(bin_centers[-1]) == 100


def test_peak_uint_range_dtype():
    im = jnp.asarray(np.array([10, 100], dtype=np.uint8))
    frequencies, bin_centers = exposure.histogram(im, source_range="dtype")
    assert_array_equal(bin_centers, np.arange(0, 256))
    assert int(frequencies[10]) == 1
    assert int(frequencies[100]) == 1
    assert int(frequencies[101]) == 0
    assert frequencies.shape == (256,)


def test_peak_int_range_dtype():
    im = jnp.asarray(np.array([10, 100], dtype=np.int8))
    frequencies, bin_centers = exposure.histogram(im, source_range="dtype")
    assert_array_equal(bin_centers, np.arange(-128, 128))
    assert int(frequencies[128 + 10]) == 1
    assert int(frequencies[128 + 100]) == 1
    assert int(frequencies[128 + 101]) == 0
    assert frequencies.shape == (256,)


def test_flat_uint_range_dtype():
    im = jnp.asarray(np.linspace(0, 255, 256).astype(np.uint8))
    frequencies, bin_centers = exposure.histogram(im, source_range="dtype")
    assert_array_equal(bin_centers, np.arange(0, 256))
    assert frequencies.shape == (256,)


def test_flat_int_range_dtype():
    im = jnp.asarray(np.linspace(-128, 127, 256).astype(np.int8))
    frequencies, bin_centers = exposure.histogram(im, source_range="dtype")
    assert_array_equal(bin_centers, np.arange(-128, 128))
    assert frequencies.shape == (256,)


def test_peak_float_out_of_range_image():
    im = jnp.asarray(np.array([10, 100], dtype=np.float16))
    frequencies, bin_centers = exposure.histogram(im, nbins=90)
    # float bins are offset by half a bin
    assert_array_almost_equal(bin_centers, np.arange(10, 100) + 0.5)


def test_peak_float_out_of_range_dtype():
    im = jnp.asarray(np.array([10, 100], dtype=np.float16))
    frequencies, bin_centers = exposure.histogram(
        im, nbins=10, source_range="dtype"
    )
    np.testing.assert_almost_equal(float(jnp.min(bin_centers)), -0.9, 3)
    np.testing.assert_almost_equal(float(jnp.max(bin_centers)), 0.9, 3)
    assert len(bin_centers) == 10


def test_normalize():
    im = jnp.asarray(np.array([0, 255, 255], dtype=np.uint8))
    frequencies, bin_centers = exposure.histogram(
        im, source_range="dtype", normalize=False
    )
    expected = np.zeros(256)
    expected[0] = 1
    expected[-1] = 2
    assert_array_equal(frequencies, expected)
    frequencies, bin_centers = exposure.histogram(
        im, source_range="dtype", normalize=True
    )
    assert_array_almost_equal(frequencies, expected / 3.0)


# ---------------------------------------------------------------------------
# histogram equalization
# ---------------------------------------------------------------------------


def _test_img_int():
    return _camera_like(seed=1)


def _test_img():
    img = util.img_as_float(_test_img_int())
    return exposure.rescale_intensity(img / 5.0 + 100)


def check_cdf_slope(cdf):
    """Slope of the CDF, ~1 for an equalized histogram."""
    norm_intensity = np.linspace(0, 1, len(cdf))
    slope, intercept = np.polyfit(norm_intensity, np.asarray(cdf), 1)
    assert 0.9 < slope < 1.1


def test_equalize_uint8_approx():
    """Integer bins are used for uint8 images regardless of nbins."""
    img_eq0 = exposure.equalize_hist(_test_img_int())
    img_eq1 = exposure.equalize_hist(_test_img_int(), nbins=3)
    np.testing.assert_allclose(np.asarray(img_eq0), np.asarray(img_eq1))


def test_equalize_ubyte():
    img = util.img_as_ubyte(_test_img())
    img_eq = exposure.equalize_hist(img)
    cdf, bin_edges = exposure.cumulative_distribution(img_eq)
    check_cdf_slope(cdf)


def test_equalize_float():
    img = util.img_as_float(_test_img())
    img_eq = exposure.equalize_hist(img)
    cdf, bin_edges = exposure.cumulative_distribution(img_eq)
    check_cdf_slope(cdf)


def test_equalize_masked():
    img = util.img_as_float(_test_img())
    mask = np.zeros(img.shape)
    mask[50:150, 50:150] = 1
    img_mask_eq = exposure.equalize_hist(img, mask=jnp.asarray(mask))
    img_eq = exposure.equalize_hist(img)
    cdf, bin_edges = exposure.cumulative_distribution(img_mask_eq)
    check_cdf_slope(cdf)
    assert not bool(jnp.all(img_eq == img_mask_eq))


# ---------------------------------------------------------------------------
# intensity_range
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "test_input,expected",
    [("image", [0, 1]), ("dtype", [0, 255]), ((10, 20), [10, 20])],
)
def test_intensity_range_uint8(test_input, expected):
    image = jnp.asarray(np.array([0, 1], dtype=np.uint8))
    out = intensity_range(image, range_values=test_input)
    assert_array_equal(out, expected)


@pytest.mark.parametrize(
    "test_input,expected",
    [("image", [0.1, 0.2]), ("dtype", [-1, 1]), ((0.3, 0.4), [0.3, 0.4])],
)
def test_intensity_range_float(test_input, expected):
    image = jnp.asarray(np.array([0.1, 0.2], dtype=np.float64))
    out = intensity_range(image, range_values=test_input)
    assert_array_almost_equal(out, expected)


def test_intensity_range_clipped_float():
    image = jnp.asarray(np.array([0.1, 0.2], dtype=np.float64))
    out = intensity_range(image, range_values="dtype", clip_negative=True)
    assert_array_equal(out, (0, 1))


# ---------------------------------------------------------------------------
# rescale_intensity
# ---------------------------------------------------------------------------


uint10_max = 2 ** 10 - 1
uint12_max = 2 ** 12 - 1
uint14_max = 2 ** 14 - 1
uint16_max = 2 ** 16 - 1


def test_rescale_stretch():
    image = jnp.asarray(np.array([51, 102, 153], dtype=np.uint8))
    out = exposure.rescale_intensity(image)
    assert out.dtype == jnp.uint8
    assert_array_almost_equal(out, [0, 127, 255])


def test_rescale_shrink():
    image = jnp.asarray(np.array([51.0, 102.0, 153.0]))
    out = exposure.rescale_intensity(image)
    assert_array_almost_equal(out, [0, 0.5, 1])


def test_rescale_in_range():
    image = jnp.asarray(np.array([51.0, 102.0, 153.0]))
    out = exposure.rescale_intensity(image, in_range=(0, 255))
    assert_array_almost_equal(out, [0.2, 0.4, 0.6])


def test_rescale_in_range_clip():
    image = jnp.asarray(np.array([51.0, 102.0, 153.0]))
    out = exposure.rescale_intensity(image, in_range=(0, 102))
    assert_array_almost_equal(out, [0.5, 1, 1])


def test_rescale_out_range():
    # skimage >= 0.17: output dtype matches out_range, not input
    image = jnp.asarray(np.array([-10, 0, 10], dtype=np.int8))
    out = exposure.rescale_intensity(image, out_range=(0, 127))
    assert np.dtype(out.dtype).kind == "f"
    assert_array_almost_equal(out, [0, 63.5, 127])


def test_rescale_named_in_range():
    image = jnp.asarray(
        np.array([0, uint10_max, uint10_max + 100], dtype=np.uint16)
    )
    out = exposure.rescale_intensity(image, in_range="uint10")
    assert_array_almost_equal(out, [0, uint16_max, uint16_max])


def test_rescale_named_out_range():
    image = jnp.asarray(np.array([0, uint16_max], dtype=np.uint16))
    out = exposure.rescale_intensity(image, out_range="uint10")
    assert_array_almost_equal(out, [0, uint10_max])


def test_rescale_uint12_limits():
    image = jnp.asarray(np.array([0, uint16_max], dtype=np.uint16))
    out = exposure.rescale_intensity(image, out_range="uint12")
    assert_array_almost_equal(out, [0, uint12_max])


def test_rescale_uint14_limits():
    image = jnp.asarray(np.array([0, uint16_max], dtype=np.uint16))
    out = exposure.rescale_intensity(image, out_range="uint14")
    assert_array_almost_equal(out, [0, uint14_max])


def test_rescale_all_zeros():
    image = jnp.zeros((2, 2), dtype=jnp.uint8)
    out = exposure.rescale_intensity(image)
    assert not bool(jnp.any(jnp.isnan(out)))
    assert_array_almost_equal(out, image)


def test_rescale_constant():
    image = jnp.asarray(np.array([130, 130], dtype=np.uint16))
    out = exposure.rescale_intensity(image, out_range=(0, 127))
    assert_array_almost_equal(out, [127, 127])


def test_rescale_same_values():
    image = jnp.ones((2, 2))
    out = exposure.rescale_intensity(image)
    assert not bool(jnp.any(jnp.isnan(out)))
    assert_array_almost_equal(out, image)


@pytest.mark.parametrize(
    "in_range,out_range", [("image", "dtype"), ("dtype", "image")]
)
def test_rescale_nan_warning(in_range, out_range):
    image = np.arange(12, dtype=float).reshape(3, 4)
    image[1, 1] = np.nan
    with pytest.warns(UserWarning, match="One or more intensity levels "
                                         "are NaN"):
        exposure.rescale_intensity(jnp.asarray(image), in_range, out_range)


@pytest.mark.parametrize(
    "out_range, out_dtype",
    [
        ("uint8", np.uint8),
        ("uint10", np.uint16),
        ("uint12", np.uint16),
        ("uint16", np.uint16),
        ("float", np.float64),
    ],
)
def test_rescale_output_dtype(out_range, out_dtype):
    image = jnp.asarray(np.array([-128, 0, 127], dtype=np.int8))
    output_image = exposure.rescale_intensity(image, out_range=out_range)
    assert output_image.dtype == out_dtype


def test_rescale_no_overflow():
    image = jnp.asarray(np.array([-128, 0, 127], dtype=np.int8))
    output_image = exposure.rescale_intensity(image, out_range=np.uint8)
    assert_array_equal(output_image, [0, 128, 255])
    assert output_image.dtype == jnp.uint8


def test_rescale_float_output():
    image = jnp.asarray(np.array([-128, 0, 127], dtype=np.int8))
    output_image = exposure.rescale_intensity(image, out_range=(0, 255))
    assert_array_equal(output_image, [0, 128, 255])
    assert np.dtype(output_image.dtype).kind == "f"


def test_rescale_raises_on_incorrect_out_range():
    image = jnp.asarray(np.array([-128, 0, 127], dtype=np.int8))
    with pytest.raises(ValueError):
        exposure.rescale_intensity(image, out_range="flat")


# ---------------------------------------------------------------------------
# adaptive histogram equalization (CLAHE)
# ---------------------------------------------------------------------------


def test_adapthist_grayscale():
    """Grayscale float image: shape preserved, contrast increased."""
    img = util.img_as_float(_camera_like((256, 256), seed=2))
    img = jnp.dstack((img, img, img))
    adapted = exposure.equalize_adapthist(
        img, kernel_size=(57, 51), clip_limit=0.01, nbins=128
    )
    assert img.shape == adapted.shape
    assert float(adapted.min()) >= 0 and float(adapted.max()) <= 1
    # CLAHE must spread the histogram of the low-contrast input
    assert float(jnp.std(rgb2gray(adapted))) > float(
        jnp.std(rgb2gray(exposure.rescale_intensity(img)))
    ) * 0.5


def test_adapthist_color():
    """RGB uint16 image: result in [0, 1], shape preserved."""
    rng = np.random.default_rng(3)
    img = (rng.uniform(size=(128, 128, 3)) * 65535).astype(np.uint16)
    img = jnp.asarray(img)
    adapted = exposure.equalize_adapthist(img, clip_limit=0.01)
    assert float(adapted.min()) == 0
    assert float(adapted.max()) == 1.0
    assert img.shape == adapted.shape


def test_adapthist_alpha():
    """RGBA image: the alpha channel is dropped."""
    img = util.img_as_float(
        jnp.asarray(
            np.random.default_rng(4).uniform(size=(64, 64, 3))
            .astype(np.float64)
        )
    )
    alpha = jnp.ones((img.shape[0], img.shape[1]), dtype=float)
    img_a = jnp.dstack((img, alpha))
    adapted = exposure.equalize_adapthist(img_a)
    assert adapted.shape != img_a.shape
    assert adapted.shape == img.shape


def test_adapthist_grayscale_Nd():
    """A stack of identical 2-D planes equalizes like the single plane."""
    img2d = util.img_as_float(_camera_like((34, 34), seed=5))
    img3d = jnp.stack([img2d] * 34, axis=0)
    adapted2d = exposure.equalize_adapthist(
        img2d, kernel_size=5, clip_limit=0.05
    )
    adapted3d = exposure.equalize_adapthist(
        img3d, kernel_size=5, clip_limit=0.05
    )
    assert img2d.shape == adapted2d.shape
    assert img3d.shape == adapted3d.shape
    assert (
        float(
            jnp.mean(
                jnp.abs(adapted2d - adapted3d[adapted3d.shape[0] // 2])
            )
        )
        < 0.02
    )


def test_adapthist_constant():
    """Constant image stays constant, float and uint."""
    img = (jnp.zeros((8, 8)) + 2).astype(jnp.uint16)
    adapted = exposure.equalize_adapthist(img, 3)
    assert float(jnp.min(adapted)) == float(jnp.max(adapted))

    img = (jnp.zeros((8, 8)) + 0.1).astype(jnp.float64)
    adapted = exposure.equalize_adapthist(img, 3)
    assert float(jnp.min(adapted)) == float(jnp.max(adapted))


def test_adapthist_borders():
    """Border rows/columns are processed, for several kernel sizes."""
    img = util.img_as_float(_camera_like((256, 256), seed=6)) / 100.0
    img = img.at[img.shape[0] // 2, img.shape[1] // 2].set(1.0)

    def nbe(a, b):
        return abs(float(a.mean()) - float(b.mean()))

    for kernel_size in range(51, 71, 10):
        adapted = exposure.equalize_adapthist(img, kernel_size,
                                              clip_limit=0.5)
        assert nbe(adapted[:, -1], img[:, -1]) > 0.1
        assert nbe(adapted[-1, :], img[-1, :]) > 0.1


def test_adapthist_clip_limit():
    """clip_limit=0 and clip_limit=1 both mean no clipping."""
    img_u = _camera_like((128, 128), seed=7)
    img_f = util.img_as_float(img_u)
    for img in (img_u, img_f):
        img_clahe0 = exposure.equalize_adapthist(img, clip_limit=0)
        img_clahe1 = exposure.equalize_adapthist(img, clip_limit=1)
        assert_array_equal(img_clahe0, img_clahe1)


# ---------------------------------------------------------------------------
# gamma / log / sigmoid adjustments
# ---------------------------------------------------------------------------


def test_adjust_gamma_1x1_shape():
    img = jnp.ones([1, 1])
    result = exposure.adjust_gamma(img, 1.5)
    assert img.shape == result.shape


def test_adjust_gamma_one():
    image = jnp.asarray(
        np.random.default_rng(8).uniform(0, 255, (8, 8))
    )
    result = exposure.adjust_gamma(image, 1)
    assert_array_almost_equal(result, image)


def test_adjust_gamma_zero():
    image = jnp.asarray(
        np.random.default_rng(9).uniform(0, 255, (8, 8))
    )
    result = exposure.adjust_gamma(image, 0)
    dtype = image.dtype.type
    assert_array_almost_equal(result, dtype_range[dtype][1])


def _ramp_u8():
    return jnp.asarray(np.arange(0, 255, 4, np.uint8).reshape((8, 8)))


def _gamma_expected(gamma):
    # closed-form skimage semantics on uint8: ((x/255)**gamma)*255
    x = np.arange(0, 255, 4, np.float64).reshape((8, 8)) / 255.0
    return (x ** gamma * 255).astype(np.uint8)


def test_adjust_gamma_less_one():
    result = exposure.adjust_gamma(_ramp_u8(), 0.5)
    assert_array_equal(result, _gamma_expected(0.5))


def test_adjust_gamma_greater_one():
    result = exposure.adjust_gamma(_ramp_u8(), 2)
    assert_array_equal(result, _gamma_expected(2))


def test_adjust_gamma_negative():
    with pytest.raises(ValueError):
        exposure.adjust_gamma(_ramp_u8(), -1)


def test_adjust_log_1x1_shape():
    img = jnp.ones([1, 1])
    result = exposure.adjust_log(img, 1)
    assert img.shape == result.shape


def test_adjust_log():
    x = np.arange(0, 255, 4, np.float64).reshape((8, 8)) / 255.0
    expected = (np.log2(1 + x) * 255).astype(np.uint8)
    result = exposure.adjust_log(_ramp_u8(), 1)
    assert_array_equal(result, expected)


def test_adjust_inv_log():
    x = np.arange(0, 255, 4, np.float64).reshape((8, 8)) / 255.0
    expected = ((2 ** x - 1) * 255).astype(np.uint8)
    result = exposure.adjust_log(_ramp_u8(), 1, True)
    assert_array_equal(result, expected)


def test_adjust_sigmoid_1x1_shape():
    img = jnp.ones([1, 1])
    result = exposure.adjust_sigmoid(img, 1, 5)
    assert img.shape == result.shape


def _sigmoid_expected(cutoff, gain, inv=False):
    x = np.arange(0, 255, 4, np.float64).reshape((8, 8)) / 255.0
    y = 1.0 / (1.0 + np.exp(gain * (cutoff - x)))
    if inv:
        y = 1.0 - y
    return (y * 255).astype(np.uint8)


def test_adjust_sigmoid_cutoff_one():
    result = exposure.adjust_sigmoid(_ramp_u8(), 1, 5)
    assert_array_equal(result, _sigmoid_expected(1, 5))


def test_adjust_sigmoid_cutoff_zero():
    result = exposure.adjust_sigmoid(_ramp_u8(), 0, 10)
    assert_array_equal(result, _sigmoid_expected(0, 10))


def test_adjust_sigmoid_cutoff_half():
    result = exposure.adjust_sigmoid(_ramp_u8(), 0.5, 10)
    assert_array_equal(result, _sigmoid_expected(0.5, 10))


def test_adjust_inv_sigmoid_cutoff_half():
    result = exposure.adjust_sigmoid(_ramp_u8(), 0.5, 10, True)
    assert_array_equal(result, _sigmoid_expected(0.5, 10, inv=True))


def test_negative_input_raises():
    image = jnp.asarray(
        np.arange(-10, 245, 4).reshape((8, 8)).astype(np.double)
    )
    with pytest.raises(ValueError):
        exposure.adjust_gamma(image)


def test_is_low_contrast():
    image = np.linspace(0, 0.04, 100)
    assert exposure.is_low_contrast(jnp.asarray(image))
    image[-1] = 1
    assert exposure.is_low_contrast(jnp.asarray(image))
    assert not exposure.is_low_contrast(jnp.asarray(image),
                                        upper_percentile=100)

    image_u8 = (image * 255).astype(np.uint8)
    assert exposure.is_low_contrast(jnp.asarray(image_u8))
    assert not exposure.is_low_contrast(jnp.asarray(image_u8),
                                        upper_percentile=100)

    image_u16 = image_u8.astype(np.uint16) * 2 ** 8
    assert exposure.is_low_contrast(jnp.asarray(image_u16))
    assert not exposure.is_low_contrast(jnp.asarray(image_u16),
                                        upper_percentile=100)
