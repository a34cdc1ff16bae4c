"""skimage.color + skimage.util tests.

Oracles: stdlib colorsys (HSV), published colorimetric values
(red/black/white/blue/green in XYZ/Lab/Luv), golden .npy arrays bundled
from the reference test data (tests/data/color), and round-trip identities.
"""

import colorsys
import os

import numpy as np
import pytest

import cupyimg_tpu.skimage.color as color
import cupyimg_tpu.skimage.util as util

DATA = os.path.join(os.path.dirname(__file__), "data", "color")

# classic color-bar test pattern
COLBARS = np.swapaxes(
    np.array(
        [
            [1, 1, 0, 0, 1, 1, 0, 0],
            [1, 1, 1, 1, 0, 0, 0, 0],
            [1, 0, 1, 0, 1, 0, 1, 0],
        ],
        dtype=np.float64,
    ).reshape(3, 4, 2),
    0,
    2,
)

XYZ_ARRAY = np.array(
    [
        [[0.4124, 0.21260, 0.01930]],  # red
        [[0, 0, 0]],  # black
        [[0.9505, 1.0, 1.089]],  # white
        [[0.1805, 0.0722, 0.9505]],  # blue
        [[0.07719, 0.15438, 0.02573]],  # green
    ]
)
LAB_ARRAY = np.array(
    [
        [[53.233, 80.109, 67.220]],
        [[0.0, 0.0, 0.0]],
        [[100.0, 0.005, -0.010]],
        [[32.303, 79.197, -107.864]],
        [[46.229, -51.7, 49.898]],
    ]
)
LUV_ARRAY = np.array(
    [
        [[53.233, 175.053, 37.751]],
        [[0.0, 0.0, 0.0]],
        [[100.0, 0.001, -0.017]],
        [[32.303, -9.400, -130.358]],
        [[46.228, -43.774, 56.589]],
    ]
)


class TestColorconv:
    def test_rgb2hsv_vs_colorsys(self):
        rng = np.random.RandomState(0)
        rgb = rng.rand(10, 3)
        got = np.asarray(color.rgb2hsv(rgb))
        exp = np.array([colorsys.rgb_to_hsv(*px) for px in rgb])
        np.testing.assert_allclose(got, exp, atol=1e-10)

    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(1)
        rgb = rng.rand(5, 6, 3)
        out = np.asarray(color.hsv2rgb(color.rgb2hsv(rgb)))
        np.testing.assert_allclose(out, rgb, atol=1e-10)

    def test_xyz_rgb_roundtrip(self):
        out = np.asarray(color.xyz2rgb(color.rgb2xyz(COLBARS)))
        np.testing.assert_allclose(out, COLBARS, atol=1e-8)

    def test_rgbcie_roundtrip(self):
        out = np.asarray(color.rgbcie2rgb(color.rgb2rgbcie(COLBARS)))
        np.testing.assert_allclose(out, COLBARS, atol=1e-8)

    def test_xyz2lab_known_values(self):
        got = np.asarray(color.xyz2lab(XYZ_ARRAY))
        np.testing.assert_allclose(got, LAB_ARRAY, atol=5e-3)

    def test_lab2xyz_roundtrip(self):
        got = np.asarray(color.lab2xyz(color.xyz2lab(XYZ_ARRAY)))
        np.testing.assert_allclose(got, XYZ_ARRAY, atol=1e-8)

    def test_xyz2luv_known_values(self):
        got = np.asarray(color.xyz2luv(XYZ_ARRAY))
        np.testing.assert_allclose(got, LUV_ARRAY, atol=5e-3)

    def test_luv2xyz_roundtrip(self):
        got = np.asarray(color.luv2xyz(color.xyz2luv(XYZ_ARRAY)))
        np.testing.assert_allclose(got, XYZ_ARRAY, atol=1e-8)

    @pytest.mark.parametrize("illum", ["d50", "d55", "d65", "d75"])
    @pytest.mark.parametrize("obs", ["2", "10"])
    def test_lab_golden_data(self, illum, obs):
        fname = os.path.join(DATA, f"lab_array_{illum}_{obs}.npy")
        expected = np.load(fname)
        got = np.asarray(
            color.xyz2lab(XYZ_ARRAY, illuminant=illum.upper(), observer=obs)
        )
        np.testing.assert_allclose(got, expected, atol=1e-2)

    @pytest.mark.parametrize("illum", ["d50", "d55", "d65", "d75"])
    @pytest.mark.parametrize("obs", ["2", "10"])
    def test_luv_golden_data(self, illum, obs):
        fname = os.path.join(DATA, f"luv_array_{illum}_{obs}.npy")
        expected = np.load(fname)
        got = np.asarray(
            color.xyz2luv(XYZ_ARRAY, illuminant=illum.upper(), observer=obs)
        )
        np.testing.assert_allclose(got, expected, atol=1e-2)

    def test_rgb2gray_weights(self):
        rgb = np.array([[[0.5, 0.25, 0.75]]])
        expected = 0.2125 * 0.5 + 0.7154 * 0.25 + 0.0721 * 0.75
        np.testing.assert_allclose(
            float(color.rgb2gray(rgb)[0, 0]), expected, rtol=1e-10
        )

    def test_gray2rgb(self):
        x = np.random.RandomState(2).rand(4, 5)
        out = np.asarray(color.gray2rgb(x))
        assert out.shape == (4, 5, 3)
        for c in range(3):
            np.testing.assert_array_equal(out[..., c], x)

    @pytest.mark.parametrize(
        "pair",
        [
            (color.rgb2yuv, color.yuv2rgb),
            (color.rgb2yiq, color.yiq2rgb),
            (color.rgb2ypbpr, color.ypbpr2rgb),
            (color.rgb2ycbcr, color.ycbcr2rgb),
            (color.rgb2ydbdr, color.ydbdr2rgb),
        ],
    )
    def test_roundtrips(self, pair):
        fwd, bwd = pair
        rng = np.random.RandomState(3)
        rgb = rng.rand(6, 7, 3) * 0.8 + 0.1
        out = np.asarray(bwd(fwd(rgb)))
        np.testing.assert_allclose(out, rgb, atol=1e-5)

    def test_hed_roundtrip_in_gamut(self):
        """separate/combine stains invert each other within the stain
        gamut (negative concentrations clip, so start from stains)."""
        rng = np.random.RandomState(4)
        stains = rng.rand(5, 5, 3) * 0.5
        rgb = np.asarray(color.hed2rgb(stains))
        back = np.asarray(color.hed2rgb(color.rgb2hed(rgb)))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_ycbcr_range(self):
        """BT.601: white -> Y'=235, black -> Y'=16."""
        white = np.ones((1, 1, 3))
        black = np.zeros((1, 1, 3))
        assert abs(float(color.rgb2ycbcr(white)[0, 0, 0]) - 235) < 1e-6
        assert abs(float(color.rgb2ycbcr(black)[0, 0, 0]) - 16) < 1e-6

    def test_lab2lch_roundtrip(self):
        out = np.asarray(color.lch2lab(color.lab2lch(LAB_ARRAY)))
        np.testing.assert_allclose(out, LAB_ARRAY, atol=1e-8)

    def test_rgba2rgb(self):
        rgba = np.array([[[1.0, 0.0, 0.0, 0.5]]])
        out = np.asarray(color.rgba2rgb(rgba))
        np.testing.assert_allclose(out, [[[1.0, 0.5, 0.5]]], atol=1e-10)

    def test_deltaE_cie76(self):
        d = np.asarray(color.deltaE_cie76(LAB_ARRAY, LAB_ARRAY))
        np.testing.assert_allclose(d, 0, atol=1e-12)
        d2 = float(
            color.deltaE_cie76(
                np.array([50.0, 0, 0]), np.array([50.0, 3, 4])
            )
        )
        assert abs(d2 - 5.0) < 1e-10

    def test_ciede2000_sharma_case(self):
        """Published test pair #1 from Sharma et al. (2005): expected 2.0425."""
        lab1 = np.array([50.0, 2.6772, -79.7751])
        lab2 = np.array([50.0, 0.0, -82.7485])
        d = float(color.deltaE_ciede2000(lab1, lab2))
        assert abs(d - 2.0425) < 1e-4

    def test_deltaE_cmc_zero(self):
        d = np.asarray(color.deltaE_cmc(LAB_ARRAY, LAB_ARRAY))
        np.testing.assert_allclose(d, 0, atol=1e-12)

    def test_convert_colorspace(self):
        out = np.asarray(color.convert_colorspace(COLBARS, "RGB", "HSV"))
        np.testing.assert_allclose(
            out, np.asarray(color.rgb2hsv(COLBARS)), atol=1e-12
        )
        with pytest.raises(ValueError):
            color.convert_colorspace(COLBARS, "nokey", "XYZ")

    def test_label2rgb_overlay_shapes(self):
        labels = np.array([[0, 1, 1], [2, 2, 0]])
        out = np.asarray(color.label2rgb(labels, bg_label=0))
        assert out.shape == (2, 3, 3)
        # two distinct fg colors, bg black
        assert not np.allclose(out[0, 1], out[1, 0])
        np.testing.assert_allclose(out[0, 0], 0, atol=1e-12)

    def test_label2rgb_avg(self):
        labels = np.array([[1, 1], [2, 2]])
        image = np.array(
            [[[1.0, 0, 0], [0.0, 1, 0]], [[0, 0, 1.0], [0, 0, 1.0]]]
        )
        out = np.asarray(
            color.label2rgb(labels, image, kind="avg", bg_label=0)
        )
        np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0], atol=1e-12)
        np.testing.assert_allclose(out[1, 0], [0, 0, 1.0], atol=1e-12)


class TestUtil:
    def test_img_as_float_uint8(self):
        x = np.array([0, 128, 255], dtype=np.uint8)
        out = np.asarray(util.img_as_float(x))
        np.testing.assert_allclose(out, [0, 128 / 255, 1.0], rtol=1e-12)

    def test_img_as_ubyte_float(self):
        x = np.array([0.0, 0.5, 1.0])
        out = np.asarray(util.img_as_ubyte(x))
        np.testing.assert_array_equal(out, [0, 128, 255])

    def test_uint8_to_uint16(self):
        x = np.array([0, 1, 255], dtype=np.uint8)
        out = np.asarray(util.img_as_uint(x))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, [0, 257, 65535])

    def test_uint16_to_uint8(self):
        x = np.array([0, 257, 65535], dtype=np.uint16)
        out = np.asarray(util.img_as_ubyte(x))
        np.testing.assert_array_equal(out, [0, 1, 255])

    def test_float_to_int16(self):
        x = np.array([-1.0, 0.0, 1.0])
        out = np.asarray(util.img_as_int(x))
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, [-32768, 0, 32767])

    def test_img_as_bool(self):
        x = np.array([0.2, 0.6], dtype=np.float64)
        np.testing.assert_array_equal(
            np.asarray(util.img_as_bool(x)), [False, True]
        )

    def test_signed_roundtrip(self):
        x = np.array([-32768, 0, 32767], dtype=np.int16)
        f = np.asarray(util.img_as_float(x))
        assert f.min() >= -1.0 and f.max() <= 1.0

    def test_view_as_blocks(self):
        x = np.arange(24).reshape(4, 6)
        out = np.asarray(util.view_as_blocks(x, (2, 3)))
        assert out.shape == (2, 2, 2, 3)
        np.testing.assert_array_equal(out[0, 0], x[:2, :3])
        np.testing.assert_array_equal(out[1, 1], x[2:, 3:])

    def test_view_as_windows(self):
        x = np.arange(20).reshape(4, 5)
        out = np.asarray(util.view_as_windows(x, (2, 3)))
        assert out.shape == (3, 3, 2, 3)
        np.testing.assert_array_equal(out[0, 0], x[:2, :3])
        np.testing.assert_array_equal(out[2, 2], x[2:4, 2:5])

    def test_view_as_windows_step(self):
        x = np.arange(16).reshape(4, 4)
        out = np.asarray(util.view_as_windows(x, (2, 2), step=2))
        assert out.shape == (2, 2, 2, 2)
        np.testing.assert_array_equal(out[1, 1], x[2:, 2:])

    def test_crop(self):
        x = np.arange(25).reshape(5, 5)
        out = np.asarray(util.crop(x, 1))
        np.testing.assert_array_equal(out, x[1:-1, 1:-1])
        out2 = np.asarray(util.crop(x, ((1, 2), (0, 1))))
        np.testing.assert_array_equal(out2, x[1:-2, 0:-1])

    def test_invert(self):
        x = np.array([0, 100, 255], dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(util.invert(x)), [255, 155, 0]
        )
        xf = np.array([0.0, 0.3, 1.0])
        np.testing.assert_allclose(
            np.asarray(util.invert(xf)), [1.0, 0.7, 0.0], rtol=1e-12
        )
        xs = np.array([-1, 0, 1], dtype=np.int8)
        np.testing.assert_array_equal(
            np.asarray(util.invert(xs)), [0, -1, -2]
        )

    def test_random_noise_statistics(self):
        x = np.full((200, 200), 0.5)
        noisy = np.asarray(util.random_noise(x, "gaussian", seed=0, var=0.01))
        assert abs(noisy.mean() - 0.5) < 0.01
        assert abs(noisy.std() - 0.1) < 0.01

    def test_random_noise_snp(self):
        x = np.full((100, 100), 0.5)
        noisy = np.asarray(util.random_noise(x, "s&p", seed=1, amount=0.1))
        frac = np.mean((noisy == 0) | (noisy == 1))
        assert 0.05 < frac < 0.15

    def test_map_array(self):
        labels = np.array([[0, 5, 5], [7, 0, 7]], dtype=np.int32)
        out = np.asarray(
            util.map_array(
                labels, np.array([5, 7]), np.array([10, 20])
            )
        )
        np.testing.assert_array_equal(out, [[0, 10, 10], [20, 0, 20]])
