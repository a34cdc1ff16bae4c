"""Reference skimage colorconv suite port.

Mirrors /root/reference/cupyimg/skimage/color/tests/test_colorconv.py.
Bundled colorwheel/camera images are replaced by a seeded RGB texture
(roundtrip and colorsys-oracle tests are data-independent); the
illuminant golden arrays (lab/luv_array_*.npy) are the ported reference
data in tests/data/color/.
"""

import colorsys
import os

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage.util import img_as_float, img_as_ubyte
from cupyimg_tpu.skimage.util.dtype import img_as_float32
from cupyimg_tpu.skimage.color import (
    rgb2hsv, hsv2rgb, rgb2xyz, xyz2rgb, rgb2hed, hed2rgb,
    separate_stains, combine_stains, rgb2rgbcie, rgbcie2rgb,
    convert_colorspace, rgb2gray, gray2rgb, xyz2lab, lab2xyz, lab2rgb,
    rgb2lab, xyz2luv, luv2xyz, luv2rgb, rgb2luv, lab2lch, lch2lab,
    rgb2yuv, yuv2rgb, rgb2yiq, yiq2rgb, rgb2ypbpr, ypbpr2rgb,
    rgb2ycbcr, ycbcr2rgb, rgb2ydbdr, ydbdr2rgb, rgba2rgb, gray2rgba,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "color")


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_array_almost_equal(a, b, decimal=6):
    np.testing.assert_array_almost_equal(
        np.asarray(a), np.asarray(b), decimal=decimal
    )


def _img_rgb():
    """Colorwheel stand-in: seeded uint8 RGB texture covering the gamut."""
    rng = np.random.default_rng(0)
    return jnp.asarray(
        (rng.uniform(size=(64, 48, 3)) * 255).astype(np.uint8)
    )


def _img_grayscale():
    rng = np.random.default_rng(1)
    return jnp.asarray((rng.uniform(size=(64, 48)) * 255).astype(np.uint8))


img_rgba = jnp.asarray(
    [[[0, 0.5, 1, 0], [0, 0.5, 1, 1], [0, 0.5, 1, 0.5]]]
).astype(jnp.float64)

colbars = np.array(
    [
        [1, 1, 0, 0, 1, 1, 0, 0],
        [1, 1, 1, 1, 0, 0, 0, 0],
        [1, 0, 1, 0, 1, 0, 1, 0],
    ],
    dtype=np.float64,
)
colbars_array = jnp.asarray(np.swapaxes(colbars.reshape(3, 4, 2), 0, 2))

xyz_array = jnp.asarray(
    [
        [[0.4124, 0.21260, 0.01930]],  # red
        [[0, 0, 0]],  # black
        [[0.9505, 1.0, 1.089]],  # white
        [[0.1805, 0.0722, 0.9505]],  # blue
        [[0.07719, 0.15438, 0.02573]],  # green
    ]
)
lab_array = jnp.asarray(
    [
        [[53.233, 80.109, 67.220]],  # red
        [[0.0, 0.0, 0.0]],  # black
        [[100.0, 0.005, -0.010]],  # white
        [[32.303, 79.197, -107.864]],  # blue
        [[46.229, -51.7, 49.898]],  # green
    ]
)
luv_array = jnp.asarray(
    [
        [[53.233, 175.053, 37.751]],  # red
        [[0.0, 0.0, 0.0]],  # black
        [[100.0, 0.001, -0.017]],  # white
        [[32.303, -9.400, -130.358]],  # blue
        [[46.228, -43.774, 56.589]],  # green
    ]
)


# ---------------------------------------------------------------------------
# RGBA
# ---------------------------------------------------------------------------


def test_rgba2rgb_conversion():
    rgb = rgba2rgb(img_rgba)
    expected = np.array(
        [[[1, 1, 1], [0, 0.5, 1], [0.5, 0.75, 1]]], dtype=np.float64
    )
    assert rgb.shape == expected.shape
    assert_array_almost_equal(rgb, expected)


def test_rgba2rgb_error_grayscale():
    with pytest.raises(ValueError):
        rgba2rgb(_img_grayscale())


def test_rgba2rgb_error_rgb():
    with pytest.raises(ValueError):
        rgba2rgb(_img_rgb())


def test_rgba2rgb_dtype():
    rgba = img_rgba.astype(jnp.float64)
    rgba32 = img_as_float32(rgba)
    assert rgba2rgb(rgba).dtype == rgba.dtype
    assert rgba2rgb(rgba32).dtype == rgba32.dtype


# ---------------------------------------------------------------------------
# HSV
# ---------------------------------------------------------------------------


def test_rgb2hsv_conversion():
    rgb = img_as_float(_img_rgb())[::16, ::16]
    hsv = rgb2hsv(rgb).reshape(-1, 3)
    gt = np.array(
        [
            colorsys.rgb_to_hsv(pt[0], pt[1], pt[2])
            for pt in np.asarray(rgb).reshape(-1, 3)
        ]
    )
    assert_array_almost_equal(hsv, gt)


def test_rgb2hsv_error_grayscale():
    with pytest.raises(ValueError):
        rgb2hsv(_img_grayscale())


def test_rgb2hsv_dtype():
    rgb = img_as_float(_img_rgb())
    rgb32 = img_as_float32(_img_rgb())
    assert rgb2hsv(rgb).dtype == rgb.dtype
    assert rgb2hsv(rgb32).dtype == rgb32.dtype


def test_hsv2rgb_conversion():
    rgb = _img_rgb().astype(jnp.float32)[::16, ::16] / 255.0
    hsv = jnp.asarray(
        [
            colorsys.rgb_to_hsv(pt[0], pt[1], pt[2])
            for pt in np.asarray(rgb).reshape(-1, 3)
        ]
    ).reshape(rgb.shape)
    assert_array_almost_equal(rgb, hsv2rgb(hsv), decimal=4)


def test_hsv2rgb_error_grayscale():
    with pytest.raises(ValueError):
        hsv2rgb(_img_grayscale())


def test_hsv2rgb_dtype():
    rgb = _img_rgb().astype(jnp.float32)[::16, ::16] / 255.0
    hsv = jnp.asarray(
        [
            colorsys.rgb_to_hsv(pt[0], pt[1], pt[2])
            for pt in np.asarray(rgb).reshape(-1, 3)
        ],
        dtype=jnp.float64,
    ).reshape(rgb.shape)
    hsv32 = hsv.astype(jnp.float32)
    assert hsv2rgb(hsv).dtype == hsv.dtype
    assert hsv2rgb(hsv32).dtype == hsv32.dtype


# ---------------------------------------------------------------------------
# XYZ
# ---------------------------------------------------------------------------


def test_rgb2xyz_conversion():
    gt = np.array(
        [
            [
                [0.950456, 1.0, 1.088754],
                [0.538003, 0.787329, 1.06942],
                [0.592876, 0.28484, 0.969561],
                [0.180423, 0.072169, 0.950227],
            ],
            [
                [0.770033, 0.927831, 0.138527],
                [0.35758, 0.71516, 0.119193],
                [0.412453, 0.212671, 0.019334],
                [0.0, 0.0, 0.0],
            ],
        ]
    )
    assert_array_almost_equal(rgb2xyz(colbars_array), gt)


def test_rgb2xyz_error_grayscale():
    with pytest.raises(ValueError):
        rgb2xyz(_img_grayscale())


def test_rgb2xyz_dtype():
    img = colbars_array
    img32 = img.astype(jnp.float32)
    assert rgb2xyz(img).dtype == img.dtype
    assert rgb2xyz(img32).dtype == img32.dtype


def test_xyz2rgb_conversion():
    assert_array_almost_equal(xyz2rgb(rgb2xyz(colbars_array)), colbars_array)


def test_xyz2rgb_dtype():
    img = rgb2xyz(colbars_array)
    img32 = img.astype(jnp.float32)
    assert xyz2rgb(img).dtype == img.dtype
    assert xyz2rgb(img32).dtype == img32.dtype


def test_xyz_rgb_roundtrip():
    img = img_as_float(_img_rgb())
    assert_array_almost_equal(xyz2rgb(rgb2xyz(img)), img)


# ---------------------------------------------------------------------------
# HED / HDX stains
# ---------------------------------------------------------------------------


def test_hed_rgb_roundtrip():
    img = img_as_ubyte(_img_rgb())
    new = img_as_ubyte(hed2rgb(rgb2hed(img)))
    # uint8 roundtrip through the stain space may be off by 1 count
    assert int(jnp.max(jnp.abs(new.astype(jnp.int32)
                               - img.astype(jnp.int32)))) <= 1


def test_hed_rgb_float_roundtrip():
    img = img_as_float(_img_rgb())
    assert_array_almost_equal(hed2rgb(rgb2hed(img)), img)


def test_hdx_rgb_roundtrip_float():
    from cupyimg_tpu.skimage.color.colorconv import (
        hdx_from_rgb,
        rgb_from_hdx,
    )

    img = img_as_float(_img_rgb())
    conv = combine_stains(separate_stains(img, hdx_from_rgb), rgb_from_hdx)
    assert_array_almost_equal(conv, img)


# ---------------------------------------------------------------------------
# RGB CIE
# ---------------------------------------------------------------------------


def test_rgb2rgbcie_conversion():
    gt = np.array(
        [
            [
                [0.1488856, 0.18288098, 0.19277574],
                [0.01163224, 0.16649536, 0.18948516],
                [0.12259182, 0.03308008, 0.17298223],
                [-0.01466154, 0.01669446, 0.16969164],
            ],
            [
                [0.16354714, 0.16618652, 0.0230841],
                [0.02629378, 0.1498009, 0.01979351],
                [0.13725336, 0.01638562, 0.00329059],
                [0.0, 0.0, 0.0],
            ],
        ]
    )
    assert_array_almost_equal(rgb2rgbcie(colbars_array), gt)


def test_rgb2rgbcie_dtype():
    img = colbars_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert rgb2rgbcie(img).dtype == img.dtype
    assert rgb2rgbcie(img32).dtype == img32.dtype


def test_rgbcie2rgb_conversion():
    assert_array_almost_equal(
        rgbcie2rgb(rgb2rgbcie(colbars_array)), colbars_array
    )


def test_rgbcie2rgb_dtype():
    img = rgb2rgbcie(colbars_array).astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert rgbcie2rgb(img).dtype == img.dtype
    assert rgbcie2rgb(img32).dtype == img32.dtype


def test_convert_colorspace():
    colspaces = ["HSV", "RGB CIE", "XYZ", "YCbCr", "YPbPr", "YDbDr"]
    colfuncs_from = [hsv2rgb, rgbcie2rgb, xyz2rgb, ycbcr2rgb, ypbpr2rgb,
                     ydbdr2rgb]
    colfuncs_to = [rgb2hsv, rgb2rgbcie, rgb2xyz, rgb2ycbcr, rgb2ypbpr,
                   rgb2ydbdr]

    assert_array_almost_equal(
        convert_colorspace(colbars_array, "RGB", "RGB"), colbars_array
    )
    for i, space in enumerate(colspaces):
        assert_array_almost_equal(
            convert_colorspace(colbars_array, space, "RGB"),
            colfuncs_from[i](colbars_array),
        )
        assert_array_almost_equal(
            convert_colorspace(colbars_array, "RGB", space),
            colfuncs_to[i](colbars_array),
        )
    with pytest.raises(ValueError):
        convert_colorspace(colbars_array, "nokey", "XYZ")
    with pytest.raises(ValueError):
        convert_colorspace(colbars_array, "RGB", "nokey")


# ---------------------------------------------------------------------------
# gray
# ---------------------------------------------------------------------------


def test_rgb2gray():
    x = jnp.asarray([1.0, 1.0, 1.0]).reshape((1, 1, 3))
    g = rgb2gray(x)
    assert_array_almost_equal(g, 1)
    assert g.shape == (1, 1)


def test_rgb2gray_alpha():
    x = jnp.asarray(np.random.RandomState(2).rand(10, 10, 4))
    with pytest.warns(FutureWarning, match="Non RGB image conversion"):
        assert rgb2gray(x).ndim == 2


def test_rgb2gray_on_gray():
    with pytest.warns(FutureWarning,
                      match="The behavior of rgb2gray will change"):
        rgb2gray(jnp.asarray(np.random.RandomState(3).rand(5, 5)))


def test_rgb2gray_dtype():
    img = jnp.asarray(np.random.RandomState(4).rand(10, 10, 3))
    img32 = img.astype(jnp.float32)
    assert rgb2gray(img).dtype == img.dtype
    assert rgb2gray(img32).dtype == img32.dtype


# ---------------------------------------------------------------------------
# Lab (easyrgb.com golden matrices; ported illuminant arrays)
# ---------------------------------------------------------------------------


def test_xyz2lab():
    assert_array_almost_equal(xyz2lab(xyz_array), lab_array, decimal=3)
    for i in ["d50", "d55", "d65", "d75"]:
        for obs in ["2", "10"]:
            fname = f"lab_array_{i}_{obs}.npy"
            lab_golden = np.load(os.path.join(DATA_DIR, fname))
            assert_array_almost_equal(
                lab_golden, xyz2lab(xyz_array, i, obs), decimal=2
            )
    for i in ["a", "e"]:
        lab_golden = np.load(os.path.join(DATA_DIR, f"lab_array_{i}_2.npy"))
        assert_array_almost_equal(
            lab_golden, xyz2lab(xyz_array, i, "2"), decimal=2
        )


def test_xyz2lab_dtype():
    img = xyz_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert xyz2lab(img).dtype == img.dtype
    assert xyz2lab(img32).dtype == img32.dtype


def test_lab2xyz():
    assert_array_almost_equal(lab2xyz(lab_array), xyz_array, decimal=3)
    for i in ["d50", "d55", "d65", "d75"]:
        for obs in ["2", "10"]:
            fname = f"lab_array_{i}_{obs}.npy"
            lab_golden = np.load(os.path.join(DATA_DIR, fname))
            assert_array_almost_equal(
                lab2xyz(jnp.asarray(lab_golden), i, obs), xyz_array,
                decimal=3,
            )
    for i in ["a", "e"]:
        lab_golden = np.load(os.path.join(DATA_DIR, f"lab_array_{i}_2.npy"))
        assert_array_almost_equal(
            lab2xyz(jnp.asarray(lab_golden), i, "2"), xyz_array, decimal=3
        )
    with pytest.raises(ValueError):
        lab2xyz(jnp.asarray(lab_golden), "NaI", "2")
    with pytest.raises(ValueError):
        lab2xyz(jnp.asarray(lab_golden), "d50", "42")


def test_lab2xyz_dtype():
    img = lab_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert lab2xyz(img).dtype == img.dtype
    assert lab2xyz(img32).dtype == img32.dtype


def test_rgb2lab_brucelindbloom():
    gt_for_colbars = np.array(
        [
            [100, 0, 0],
            [97.1393, -21.5537, 94.4780],
            [91.1132, -48.0875, -14.1312],
            [87.7347, -86.1827, 83.1793],
            [60.3242, 98.2343, -60.8249],
            [53.2408, 80.0925, 67.2032],
            [32.2970, 79.1875, -107.8602],
            [0, 0, 0],
        ]
    ).T
    gt_array = np.swapaxes(gt_for_colbars.reshape(3, 4, 2), 0, 2)
    assert_array_almost_equal(rgb2lab(colbars_array), gt_array, decimal=2)


def test_lab_rgb_roundtrip():
    img = img_as_float(_img_rgb())
    assert_array_almost_equal(lab2rgb(rgb2lab(img)), img)


def test_rgb2lab_dtype():
    img = colbars_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert rgb2lab(img).dtype == img.dtype
    assert rgb2lab(img32).dtype == img32.dtype


def test_lab2rgb_dtype():
    img = lab_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert lab2rgb(img).dtype == img.dtype
    assert lab2rgb(img32).dtype == img32.dtype


# ---------------------------------------------------------------------------
# Luv
# ---------------------------------------------------------------------------


def test_xyz2luv():
    assert_array_almost_equal(xyz2luv(xyz_array), luv_array, decimal=3)
    for i in ["d50", "d55", "d65", "d75"]:
        for obs in ["2", "10"]:
            fname = f"luv_array_{i}_{obs}.npy"
            luv_golden = np.load(os.path.join(DATA_DIR, fname))
            assert_array_almost_equal(
                luv_golden, xyz2luv(xyz_array, i, obs), decimal=2
            )
    for i in ["a", "e"]:
        luv_golden = np.load(os.path.join(DATA_DIR, f"luv_array_{i}_2.npy"))
        assert_array_almost_equal(
            luv_golden, xyz2luv(xyz_array, i, "2"), decimal=2
        )


def test_xyz2luv_dtype():
    img = xyz_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert xyz2luv(img).dtype == img.dtype
    assert xyz2luv(img32).dtype == img32.dtype


def test_luv2xyz():
    assert_array_almost_equal(luv2xyz(luv_array), xyz_array, decimal=3)
    for i in ["d50", "d55", "d65", "d75"]:
        for obs in ["2", "10"]:
            fname = f"luv_array_{i}_{obs}.npy"
            luv_golden = np.load(os.path.join(DATA_DIR, fname))
            assert_array_almost_equal(
                luv2xyz(jnp.asarray(luv_golden), i, obs), xyz_array,
                decimal=3,
            )
    for i in ["a", "e"]:
        luv_golden = np.load(os.path.join(DATA_DIR, f"luv_array_{i}_2.npy"))
        assert_array_almost_equal(
            luv2xyz(jnp.asarray(luv_golden), i, "2"), xyz_array, decimal=3
        )


def test_luv2xyz_dtype():
    img = luv_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert luv2xyz(img).dtype == img.dtype
    assert luv2xyz(img32).dtype == img32.dtype


def test_rgb2luv_brucelindbloom():
    gt_for_colbars = np.array(
        [
            [100, 0, 0],
            [97.1393, 7.7056, 106.7866],
            [91.1132, -70.4773, -15.2042],
            [87.7347, -83.0776, 107.3985],
            [60.3242, 84.0714, -108.6834],
            [53.2408, 175.0151, 37.7564],
            [32.2970, -9.4054, -130.3423],
            [0, 0, 0],
        ]
    ).T
    gt_array = np.swapaxes(gt_for_colbars.reshape(3, 4, 2), 0, 2)
    assert_array_almost_equal(rgb2luv(colbars_array), gt_array, decimal=2)


def test_rgb2luv_dtype():
    img = colbars_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert rgb2luv(img).dtype == img.dtype
    assert rgb2luv(img32).dtype == img32.dtype


def test_luv2rgb_dtype():
    img = luv_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert luv2rgb(img).dtype == img.dtype
    assert luv2rgb(img32).dtype == img32.dtype


def test_luv_rgb_roundtrip():
    img = img_as_float(_img_rgb())
    assert_array_almost_equal(luv2rgb(rgb2luv(img)), img)


def test_lab_rgb_outlier():
    lab = np.ones((3, 1, 3))
    lab[0] = [50, -12, 85]
    lab[1] = [50, 12, -85]
    lab[2] = [90, -4, -47]
    rgb_expected = np.array(
        [[[0.501, 0.481, 0]], [[0, 0.482, 1.0]], [[0.578, 0.914, 1.0]]]
    )
    assert_array_almost_equal(lab2rgb(jnp.asarray(lab)), rgb_expected,
                              decimal=3)


def test_lab_full_gamut():
    a, b = np.meshgrid(np.arange(-100, 100), np.arange(-100, 100))
    lab = np.dstack((np.ones(a.shape), a, b))
    for value in [0, 10, 20]:
        lab[:, :, 0] = value
        with pytest.warns(UserWarning, match="Color data out of range"):
            lab2xyz(jnp.asarray(lab))


def test_lab_lch_roundtrip():
    rgb = img_as_float(_img_rgb())
    lab = rgb2lab(rgb)
    lab2 = lch2lab(lab2lch(lab))
    assert_array_almost_equal(lab2, lab)


def test_rgb_lch_roundtrip():
    rgb = img_as_float(_img_rgb())
    lab = rgb2lab(rgb)
    lch = lab2lch(lab)
    lab2 = lch2lab(lch)
    rgb2 = lab2rgb(lab2)
    assert_array_almost_equal(rgb, rgb2)


def _get_lab0():
    rgb = img_as_float(_img_rgb()[:1, :1, :])
    return rgb2lab(rgb)[0, 0, :]


def test_lab_lch_0d():
    lab0 = _get_lab0()
    lch0 = lab2lch(lab0)
    lch2 = lab2lch(lab0[None, None, :])
    assert_array_almost_equal(lch0, lch2[0, 0, :])


def test_lab_lch_1d():
    lab0 = _get_lab0()
    lch0 = lab2lch(lab0)
    lch1 = lab2lch(lab0[None, :])
    assert_array_almost_equal(lch0, lch1[0, :])


def test_lab_lch_3d():
    lab0 = _get_lab0()
    lch0 = lab2lch(lab0)
    lch3 = lab2lch(lab0[None, None, None, :])
    assert_array_almost_equal(lch0, lch3[0, 0, 0, :])


# ---------------------------------------------------------------------------
# YUV family
# ---------------------------------------------------------------------------


def test_yuv():
    rgb = jnp.asarray([[[1.0, 1.0, 1.0]]])
    assert_array_almost_equal(rgb2yuv(rgb), [[[1, 0, 0]]])
    assert_array_almost_equal(rgb2yiq(rgb), [[[1, 0, 0]]])
    assert_array_almost_equal(rgb2ypbpr(rgb), [[[1, 0, 0]]])
    assert_array_almost_equal(rgb2ycbcr(rgb), [[[235, 128, 128]]])
    assert_array_almost_equal(rgb2ydbdr(rgb), [[[1, 0, 0]]])
    rgb = jnp.asarray([[[0.0, 1.0, 0.0]]])
    assert_array_almost_equal(
        rgb2yuv(rgb), [[[0.587, -0.28886916, -0.51496512]]]
    )
    assert_array_almost_equal(
        rgb2yiq(rgb), [[[0.587, -0.27455667, -0.52273617]]]
    )
    assert_array_almost_equal(
        rgb2ypbpr(rgb), [[[0.587, -0.331264, -0.418688]]]
    )
    assert_array_almost_equal(
        rgb2ycbcr(rgb), [[[144.553, 53.797, 34.214]]]
    )
    assert_array_almost_equal(rgb2ydbdr(rgb), [[[0.587, -0.883, 1.116]]])


def test_yuv_roundtrip():
    img = img_as_float(_img_rgb())[::16, ::16]
    assert_array_almost_equal(yuv2rgb(rgb2yuv(img)), img)
    assert_array_almost_equal(yiq2rgb(rgb2yiq(img)), img)
    assert_array_almost_equal(ypbpr2rgb(rgb2ypbpr(img)), img)
    assert_array_almost_equal(ycbcr2rgb(rgb2ycbcr(img)), img)
    assert_array_almost_equal(ydbdr2rgb(rgb2ydbdr(img)), img)


def test_rgb2yuv_dtype():
    img = colbars_array.astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert rgb2yuv(img).dtype == img.dtype
    assert rgb2yuv(img32).dtype == img32.dtype


def test_yuv2rgb_dtype():
    img = rgb2yuv(colbars_array).astype(jnp.float64)
    img32 = img.astype(jnp.float32)
    assert yuv2rgb(img).dtype == img.dtype
    assert yuv2rgb(img32).dtype == img32.dtype


def test_rgb2yiq_conversion():
    rgb = img_as_float(_img_rgb())[::16, ::16]
    yiq = rgb2yiq(rgb).reshape(-1, 3)
    gt = np.array(
        [
            colorsys.rgb_to_yiq(pt[0], pt[1], pt[2])
            for pt in np.asarray(rgb).reshape(-1, 3)
        ]
    )
    assert_array_almost_equal(yiq, gt, decimal=2)


# ---------------------------------------------------------------------------
# gray2rgb / gray2rgba
# ---------------------------------------------------------------------------


def test_gray2rgb():
    x = jnp.asarray([0, 0.5, 1.0])
    w = gray2rgb(x)
    assert_array_equal(w, [[0, 0, 0], [0.5, 0.5, 0.5], [1, 1, 1]])

    x = x.reshape((3, 1))
    y = gray2rgb(x)
    assert y.shape == (3, 1, 3)
    assert y.dtype == x.dtype
    assert_array_equal(y[..., 0], x)
    assert_array_equal(y[0, 0, :], [0, 0, 0])

    x = jnp.asarray([[0, 128, 255]], dtype=jnp.uint8)
    z = gray2rgb(x)
    assert z.shape == (1, 3, 3)
    assert_array_equal(z[..., 0], x)
    assert_array_equal(z[0, 1, :], [128, 128, 128])


def test_gray2rgb_rgb():
    x = jnp.asarray(np.random.RandomState(5).rand(5, 5, 4))
    with pytest.warns(FutureWarning,
                      match="Pass-through of possibly RGB images"):
        y = gray2rgb(x)
    assert_array_equal(x, y)


def test_gray2rgb_alpha():
    x = jnp.asarray(np.random.RandomState(6).random_sample((5, 5, 4)))
    with pytest.warns(FutureWarning,
                      match="Pass-through of possibly RGB images"):
        assert gray2rgb(x, alpha=None).shape == (5, 5, 4)
    with pytest.warns(FutureWarning):
        assert gray2rgb(x, alpha=False).shape == (5, 5, 3)
    with pytest.warns(FutureWarning):
        assert gray2rgb(x, alpha=True).shape == (5, 5, 4)

    x = jnp.asarray(np.random.RandomState(7).random_sample((5, 5, 3)))
    with pytest.warns(FutureWarning,
                      match="Pass-through of possibly RGB images"):
        assert gray2rgb(x, alpha=None).shape == (5, 5, 3)
    with pytest.warns(FutureWarning):
        assert gray2rgb(x, alpha=False).shape == (5, 5, 3)
    with pytest.warns(FutureWarning):
        assert gray2rgb(x, alpha=True).shape == (5, 5, 4)

    with pytest.warns(FutureWarning, match="alpha argument is deprecated"):
        assert float(
            gray2rgb(jnp.asarray([[1, 2], [3, 4.0]]), alpha=True)[0, 0, 3]
        ) == 1
    with pytest.warns(FutureWarning, match="alpha argument is deprecated"):
        assert int(
            gray2rgb(
                jnp.asarray([[1, 2], [3, 4]], dtype=jnp.uint8), alpha=True
            )[0, 0, 3]
        ) == 255


@pytest.mark.parametrize("shape", [(5, 5), (5, 5, 4), (5, 4, 5, 4)])
def test_gray2rgba(shape):
    img = jnp.asarray(np.random.RandomState(8).random_sample(shape))
    rgba = gray2rgba(img)
    assert rgba.shape == shape + (4,)
    assert rgba.dtype == img.dtype
    for channel in range(3):
        assert_array_equal(rgba[..., channel], img)
    assert_array_equal(rgba[..., 3], 1.0)


def test_gray2rgba_dtype():
    img_f64 = jnp.asarray(np.random.RandomState(9).random_sample((5, 5)))
    img_f32 = img_f64.astype(jnp.float32)
    img_u8 = img_as_ubyte(img_f64)
    img_int = img_u8.astype(jnp.int64)
    for img in [img_f64, img_f32, img_u8, img_int]:
        assert gray2rgba(img).dtype == img.dtype


def test_gray2rgba_alpha():
    img = jnp.asarray(np.random.RandomState(10).random_sample((5, 5)))
    img_u8 = img_as_ubyte(img)

    rgba = gray2rgba(img, None)
    assert_array_equal(rgba[..., :3], gray2rgb(img))
    assert_array_equal(rgba[..., 3], 1.0)

    alpha = 0.5
    rgba = gray2rgba(img, alpha)
    assert_array_equal(rgba[..., :3], gray2rgb(img))
    assert_array_equal(rgba[..., 3], alpha)

    alpha = 128
    rgba = gray2rgba(img_u8, alpha)
    assert_array_equal(rgba[..., :3], gray2rgb(img_u8))
    assert_array_equal(rgba[..., 3], alpha)


# ---------------------------------------------------------------------------
# nD support
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(3,), (2, 3), (4, 5, 3), (5, 4, 5, 3), (4, 5, 4, 5, 3)]
)
def test_nD_gray_conversion(shape):
    # 3-D inputs with a 3-long last axis hit the deprecated RGB
    # pass-through (reference test_colorconv.py:930-948)
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(*shape))
    if img.ndim == 3:
        with pytest.warns(FutureWarning,
                          match="Pass-through of possibly RGB"):
            out = gray2rgb(img)
    else:
        out = gray2rgb(img)
    common_ndim = min(out.ndim, len(shape))
    assert out.shape[:common_ndim] == shape[:common_ndim]


def test_nD_color_conversion():
    rng = np.random.RandomState(12)
    for func_to, func_from in [
        (rgb2hsv, hsv2rgb),
        (rgb2xyz, xyz2rgb),
        (rgb2yuv, yuv2rgb),
    ]:
        for ndim in range(3, 6):
            shape = (4,) * (ndim - 1) + (3,)
            img = jnp.asarray(rng.rand(*shape))
            out = func_from(func_to(img))
            assert_array_almost_equal(out, img)


def test_rgba2rgb_nD():
    rng = np.random.RandomState(13)
    for ndim in range(3, 5):
        shape = (4,) * (ndim - 1) + (4,)
        img = jnp.asarray(rng.rand(*shape))
        out = rgba2rgb(img)
        assert out.shape == shape[:-1] + (3,)
