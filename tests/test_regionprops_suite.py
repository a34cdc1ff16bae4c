"""Reference regionprops suite port.

Mirrors /root/reference/cupyimg/skimage/measure/tests/test_regionprops.py
(golden values there come from MATLAB/OpenCV and are data-independent).
The astronaut+slic multichannel case uses synthetic labels/intensity.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage.measure._regionprops import (
    regionprops,
    PROPS,
    perimeter,
    perimeter_crofton,
    euler_number,
    _props_to_dict,
    regionprops_table,
    OBJECT_COLUMNS,
    COL_DTYPES,
)


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_array_almost_equal(a, b, decimal=6):
    np.testing.assert_array_almost_equal(
        np.asarray(a), np.asarray(b), decimal=decimal
    )


def assert_almost_equal(a, b, decimal=7):
    np.testing.assert_almost_equal(
        np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64),
        decimal=decimal,
    )


SAMPLE_np = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
        [1, 0, 1, 0, 0, 1, 1, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 1],
        [0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1],
    ]
)
SAMPLE = jnp.asarray(SAMPLE_np)
INTENSITY_SAMPLE_np = SAMPLE_np.copy()
INTENSITY_SAMPLE_np[1, 9:11] = 2
INTENSITY_SAMPLE = jnp.asarray(INTENSITY_SAMPLE_np)

SAMPLE_MULTIPLE_np = np.eye(10, dtype=np.int32)
SAMPLE_MULTIPLE_np[3:5, 7:8] = 2
SAMPLE_MULTIPLE = jnp.asarray(SAMPLE_MULTIPLE_np)
INTENSITY_SAMPLE_MULTIPLE = jnp.asarray(SAMPLE_MULTIPLE_np * 2.0)

SAMPLE_3D_np = np.zeros((6, 6, 6), dtype=np.uint8)
SAMPLE_3D_np[1:3, 1:3, 1:3] = 1
SAMPLE_3D_np[3, 2, 2] = 1
SAMPLE_3D = jnp.asarray(SAMPLE_3D_np)
INTENSITY_SAMPLE_3D = SAMPLE_3D


def test_all_props():
    region = regionprops(SAMPLE, INTENSITY_SAMPLE)[0]
    for prop in PROPS:
        try:
            assert_array_almost_equal(
                region[prop], getattr(region, PROPS[prop])
            )
        except TypeError:  # the `slice` property causes this
            pass


def test_all_props_3d():
    region = regionprops(SAMPLE_3D, INTENSITY_SAMPLE_3D)[0]
    for prop in PROPS:
        try:
            assert_array_almost_equal(
                region[prop], getattr(region, PROPS[prop])
            )
        except (NotImplementedError, TypeError):
            pass


def test_dtype():
    regionprops(jnp.zeros((10, 10), dtype=jnp.int32))
    regionprops(jnp.zeros((10, 10), dtype=jnp.uint32))
    with pytest.raises(TypeError):
        regionprops(jnp.zeros((10, 10), dtype=jnp.float32))
    with pytest.raises(TypeError):
        regionprops(jnp.zeros((10, 10), dtype=jnp.float64))
    with pytest.raises(TypeError):
        regionprops(jnp.zeros((10, 10), dtype=bool))


def test_ndim():
    regionprops(jnp.zeros((10, 10), dtype=jnp.int32))
    regionprops(jnp.zeros((10, 10, 1), dtype=jnp.int32))
    regionprops(jnp.zeros((10, 10, 10), dtype=jnp.int32))
    regionprops(jnp.zeros((1, 1), dtype=jnp.int32))
    regionprops(jnp.zeros((1, 1, 1), dtype=jnp.int32))
    with pytest.raises(TypeError):
        regionprops(jnp.zeros((10, 10, 10, 2), dtype=jnp.int32))


def test_area():
    area = regionprops(SAMPLE)[0].area
    assert int(area) == SAMPLE_np.sum()
    area = regionprops(SAMPLE_3D)[0].area
    assert int(area) == SAMPLE_3D_np.sum()


def test_bbox():
    bbox = regionprops(SAMPLE)[0].bbox
    assert_array_almost_equal(bbox, (0, 0, SAMPLE.shape[0], SAMPLE.shape[1]))

    SAMPLE_mod = SAMPLE_np.copy()
    SAMPLE_mod[:, -1] = 0
    bbox = regionprops(jnp.asarray(SAMPLE_mod))[0].bbox
    assert_array_almost_equal(
        bbox, (0, 0, SAMPLE.shape[0], SAMPLE.shape[1] - 1)
    )

    bbox = regionprops(SAMPLE_3D)[0].bbox
    assert_array_almost_equal(bbox, (1, 1, 1, 4, 3, 3))


def test_bbox_area():
    padded = jnp.asarray(np.pad(SAMPLE_np, 5, mode="constant"))
    bbox_area = regionprops(padded)[0].bbox_area
    assert_array_almost_equal(bbox_area, SAMPLE_np.size)


def test_moments_central():
    mu = np.asarray(regionprops(SAMPLE)[0].moments_central)
    # determined with OpenCV
    assert_almost_equal(mu[2, 0], 436.00000000000045)
    assert_almost_equal(mu[3, 0], -737.333333333333, decimal=5)
    assert_almost_equal(mu[1, 1], -87.33333333333303, decimal=5)
    assert_almost_equal(mu[2, 1], -127.5555555555593, decimal=5)
    assert_almost_equal(mu[0, 2], 1259.7777777777774, decimal=5)
    assert_almost_equal(mu[1, 2], 2000.296296296291, decimal=4)
    assert_almost_equal(mu[0, 3], -760.0246913580195, decimal=4)


def test_centroid():
    centroid = regionprops(SAMPLE)[0].centroid
    # determined with MATLAB
    assert_almost_equal(centroid, (5.66666666666666, 9.444444444444444))


def test_centroid_3d():
    centroid = regionprops(SAMPLE_3D)[0].centroid
    assert_almost_equal(centroid, (1.66666667, 1.55555556, 1.55555556))


def test_convex_area():
    area = regionprops(SAMPLE)[0].convex_area
    assert int(area) == 125


def test_convex_image():
    img = regionprops(SAMPLE)[0].convex_image
    ref = np.array(
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0],
            [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0],
            [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
            [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
            [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        ],
    )
    assert_array_equal(img, ref)


def test_coordinates():
    sample = np.zeros((10, 10), dtype=np.int8)
    coords = np.array([[3, 2], [3, 3], [3, 4]])
    sample[coords[:, 0], coords[:, 1]] = 1
    prop_coords = regionprops(jnp.asarray(sample))[0].coords
    assert_array_equal(prop_coords, coords)

    sample = np.zeros((6, 6, 6), dtype=np.int8)
    coords = np.array([[1, 1, 1], [1, 2, 1], [1, 3, 1]])
    sample[coords[:, 0], coords[:, 1], coords[:, 2]] = 1
    prop_coords = regionprops(jnp.asarray(sample))[0].coords
    assert_array_equal(prop_coords, coords)


def test_slice():
    padded = jnp.asarray(np.pad(SAMPLE_np, ((2, 4), (5, 2)),
                                mode="constant"))
    nrow, ncol = SAMPLE.shape
    result = regionprops(padded)[0].slice
    expected = (slice(2, 2 + nrow), slice(5, 5 + ncol))
    assert result == expected


def test_eccentricity():
    eps = regionprops(SAMPLE)[0].eccentricity
    assert_almost_equal(eps, 0.814629313427)

    img = np.zeros((5, 5), dtype=int)
    img[2, 2] = 1
    eps = regionprops(jnp.asarray(img))[0].eccentricity
    assert_almost_equal(eps, 0)


def test_equiv_diameter():
    diameter = regionprops(SAMPLE)[0].equivalent_diameter
    # determined with MATLAB
    assert_almost_equal(diameter, 9.57461472963, decimal=6)


def test_euler_number():
    en = regionprops(SAMPLE)[0].euler_number
    assert en == 0

    SAMPLE_mod = SAMPLE_np.copy()
    SAMPLE_mod[7, -3] = 0
    en = regionprops(jnp.asarray(SAMPLE_mod))[0].euler_number
    assert en == -1

    en = euler_number(SAMPLE, 1)
    assert en == 2

    en = euler_number(jnp.asarray(SAMPLE_mod), 1)
    assert en == 1

    en = euler_number(SAMPLE_3D, 1)
    assert en == 1

    en = euler_number(SAMPLE_3D, 3)
    assert en == 1

    # for convex body, Euler number is 1
    S2 = np.zeros((100, 100, 100))
    S2[40:60, 40:60, 40:60] = 1
    assert euler_number(jnp.asarray(S2), 3) == 1
    S2[45:55, 45:55, 45:55] = 0
    assert euler_number(jnp.asarray(S2), 3) == 2


def test_extent():
    extent = regionprops(SAMPLE)[0].extent
    assert_almost_equal(extent, 0.4)


def test_moments_hu():
    hu = regionprops(SAMPLE)[0].moments_hu
    ref = np.array(
        [
            3.27117627e-01,
            2.63869194e-02,
            2.35390060e-02,
            1.23151193e-03,
            1.38882330e-06,
            -2.72586158e-05,
            -6.48350653e-06,
        ]
    )
    assert_array_almost_equal(hu, ref)


def test_image():
    img = regionprops(SAMPLE)[0].image
    assert_array_equal(img, SAMPLE_np)

    img = regionprops(SAMPLE_3D)[0].image
    assert_array_equal(img, SAMPLE_3D_np[1:4, 1:3, 1:3])


def test_label():
    label = regionprops(SAMPLE)[0].label
    assert label == 1
    label = regionprops(SAMPLE_3D)[0].label
    assert label == 1


def test_filled_area():
    area = regionprops(SAMPLE)[0].filled_area
    assert int(area) == SAMPLE_np.sum()

    SAMPLE_mod = SAMPLE_np.copy()
    SAMPLE_mod[7, -3] = 0
    area = regionprops(jnp.asarray(SAMPLE_mod))[0].filled_area
    assert int(area) == SAMPLE_np.sum()


def test_filled_image():
    img = regionprops(SAMPLE)[0].filled_image
    assert_array_equal(img, SAMPLE_np)


def test_major_axis_length():
    length = regionprops(SAMPLE)[0].major_axis_length
    assert_almost_equal(length, 16.7924234999, decimal=6)


def test_max_intensity():
    intensity = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].max_intensity
    assert_almost_equal(intensity, 2)


def test_mean_intensity():
    intensity = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].mean_intensity
    assert_almost_equal(intensity, 1.02777777777777, decimal=6)


def test_min_intensity():
    intensity = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].min_intensity
    assert_almost_equal(intensity, 1)


def test_minor_axis_length():
    length = regionprops(SAMPLE)[0].minor_axis_length
    assert_almost_equal(length, 9.739302807263, decimal=6)


def test_moments():
    m = np.asarray(regionprops(SAMPLE)[0].moments)
    # determined with OpenCV
    for idx, val in [
        ((0, 0), 72.0), ((0, 1), 680.0), ((0, 2), 7682.0),
        ((0, 3), 95588.0), ((1, 0), 408.0), ((1, 1), 3766.0),
        ((1, 2), 43882.0), ((2, 0), 2748.0), ((2, 1), 24836.0),
        ((3, 0), 19776.0),
    ]:
        assert_almost_equal(m[idx], val, decimal=3)


def test_moments_normalized():
    nu = np.asarray(regionprops(SAMPLE)[0].moments_normalized)
    # determined with OpenCV
    assert_almost_equal(nu[0, 2], 0.24301268861454037)
    assert_almost_equal(nu[0, 3], -0.017278118992041805)
    assert_almost_equal(nu[1, 1], -0.016846707818929982)
    assert_almost_equal(nu[1, 2], 0.045473992910668816)
    assert_almost_equal(nu[2, 0], 0.08410493827160502)
    assert_almost_equal(nu[2, 1], -0.002899800614433943)


def test_orientation():
    orient = regionprops(SAMPLE)[0].orientation
    # determined with MATLAB
    assert_almost_equal(orient, -1.4663278802756865)
    # diagonal regions
    diag = np.eye(10, dtype=int)
    orient_diag = regionprops(jnp.asarray(diag))[0].orientation
    assert_almost_equal(orient_diag, -math.pi / 4)
    orient_diag = regionprops(jnp.asarray(np.flipud(diag)))[0].orientation
    assert_almost_equal(orient_diag, math.pi / 4)
    orient_diag = regionprops(jnp.asarray(np.fliplr(diag)))[0].orientation
    assert_almost_equal(orient_diag, math.pi / 4)
    orient_diag = regionprops(
        jnp.asarray(np.fliplr(np.flipud(diag)))
    )[0].orientation
    assert_almost_equal(orient_diag, -math.pi / 4)


def test_perimeter():
    per = regionprops(SAMPLE)[0].perimeter
    assert_almost_equal(per, 55.2487373415, decimal=6)

    per = perimeter(SAMPLE.astype(jnp.float64), neighbourhood=8)
    assert_almost_equal(per, 46.8284271247, decimal=6)


def test_perimeter_crofton():
    per = regionprops(SAMPLE)[0].perimeter_crofton
    assert_almost_equal(per, 61.0800637973, decimal=6)

    per = perimeter_crofton(SAMPLE.astype(jnp.float64), directions=2)
    assert_almost_equal(per, 64.4026493985, decimal=6)


def test_solidity():
    solidity = regionprops(SAMPLE)[0].solidity
    assert_almost_equal(solidity, 0.576)


def test_weighted_moments_central():
    wmu = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].weighted_moments_central
    ref = np.array(
        [
            [7.4000000000e01, 3.7303493627e-14, 1.2602837838e03,
             -7.6561796932e02],
            [-2.1316282073e-13, -8.7837837838e01, 2.1571526662e03,
             -4.2385971907e03],
            [4.7837837838e02, -1.4801314828e02, 6.6989799420e03,
             -9.9501164076e03],
            [-7.5943608473e02, -1.2714707125e03, 1.5304076361e04,
             -3.3156729271e04],
        ]
    )
    assert_array_almost_equal(wmu, ref, decimal=3)


def test_weighted_centroid():
    centroid = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].weighted_centroid
    assert_almost_equal(centroid, (5.540540540540, 9.445945945945),
                        decimal=6)


def test_weighted_moments_hu():
    whu = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].weighted_moments_hu
    ref = np.array(
        [
            3.1750587329e-01,
            2.1417517159e-02,
            2.3609322038e-02,
            1.2565683360e-03,
            8.3014209421e-07,
            -3.5073773473e-05,
            -6.7936409056e-06,
        ]
    )
    assert_array_almost_equal(whu, ref)


def test_weighted_moments():
    wm = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].weighted_moments
    ref = np.array(
        [
            [7.4000000e01, 6.9900000e02, 7.8630000e03, 9.7317000e04],
            [4.1000000e02, 3.7850000e03, 4.4063000e04, 5.7256700e05],
            [2.7500000e03, 2.4855000e04, 2.9347700e05, 3.9007170e06],
            [1.9778000e04, 1.7500100e05, 2.0810510e06, 2.8078871e07],
        ]
    )
    assert_array_almost_equal(wm, ref, decimal=1)


def test_weighted_moments_normalized():
    wnu = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[
        0
    ].weighted_moments_normalized
    ref = np.array(
        [
            [np.nan, np.nan, 0.2301467830, -0.0162529732],
            [np.nan, -0.0160405109, 0.0457932622, -0.0104598869],
            [0.0873590903, -0.0031421072, 0.0165315478, -0.0028544152],
            [-0.0161217406, -0.0031376984, 0.0043903193, -0.0011057191],
        ]
    )
    assert_array_almost_equal(wnu, ref)


def test_label_sequence():
    a = jnp.full((2, 2), 2, dtype=jnp.int32)
    ps = regionprops(a)
    assert len(ps) == 1
    assert ps[0].label == 2


def test_pure_background():
    a = jnp.zeros((2, 2), dtype=jnp.int32)
    ps = regionprops(a)
    assert len(ps) == 0


def test_invalid():
    ps = regionprops(SAMPLE)
    with pytest.raises(AttributeError):
        ps[0].intensity_image


def test_invalid_size():
    wrong_intensity_sample = jnp.asarray([[1], [1]])
    with pytest.raises(ValueError):
        regionprops(SAMPLE, wrong_intensity_sample)


def test_equals():
    arr = np.zeros((100, 100), dtype=int)
    arr[0:25, 0:25] = 1
    arr[50:99, 50:99] = 2
    arr = jnp.asarray(arr)

    regions = regionprops(arr)
    r1 = regions[0]
    regions = regionprops(arr)
    r2 = regions[0]
    r3 = regions[1]

    assert (r1 == r2) is True
    assert (r1 != r3) is True


def test_iterate_all_props():
    region = regionprops(SAMPLE)[0]
    p0 = {p: region[p] for p in region}

    region = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[0]
    p1 = {p: region[p] for p in region}

    assert len(p0) < len(p1)


def test_props_to_dict():
    regions = regionprops(SAMPLE)
    out = _props_to_dict(regions)
    assert set(out) == {"label", "bbox-0", "bbox-1", "bbox-2", "bbox-3"}
    assert_array_equal(out["label"], [1])
    assert_array_equal(out["bbox-0"], [0])
    assert_array_equal(out["bbox-1"], [0])
    assert_array_equal(out["bbox-2"], [10])
    assert_array_equal(out["bbox-3"], [18])

    regions = regionprops(SAMPLE)
    out = _props_to_dict(
        regions, properties=("label", "area", "bbox"), separator="+"
    )
    assert set(out) == {"label", "area", "bbox+0", "bbox+1", "bbox+2",
                        "bbox+3"}
    assert_array_equal(out["area"], [72])


def test_regionprops_table():
    out = regionprops_table(SAMPLE)
    assert set(out) == {"label", "bbox-0", "bbox-1", "bbox-2", "bbox-3"}
    assert_array_equal(out["label"], [1])
    assert_array_equal(out["bbox-2"], [10])
    assert_array_equal(out["bbox-3"], [18])

    out = regionprops_table(
        SAMPLE, properties=("label", "area", "bbox"), separator="+"
    )
    assert set(out) == {"label", "area", "bbox+0", "bbox+1", "bbox+2",
                        "bbox+3"}
    assert_array_equal(out["area"], [72])


def test_regionprops_table_no_regions():
    out = regionprops_table(
        jnp.zeros((2, 2), dtype=jnp.int32),
        properties=("label", "area", "bbox"),
        separator="+",
    )
    assert len(out) == 6
    for key in ("label", "area", "bbox+0", "bbox+1", "bbox+2", "bbox+3"):
        assert len(out[key]) == 0


def test_props_dict_complete():
    region = regionprops(SAMPLE)[0]
    properties = [s for s in dir(region) if not s.startswith("_")]
    assert set(properties) == set(PROPS.values())


def test_column_dtypes_complete():
    assert set(COL_DTYPES.keys()).union(OBJECT_COLUMNS) == set(PROPS.values())


def test_column_dtypes_correct():
    msg = "mismatch with expected type,"
    region = regionprops(SAMPLE, intensity_image=INTENSITY_SAMPLE)[0]
    for col in COL_DTYPES:
        r = region[col]

        if col in OBJECT_COLUMNS:
            assert COL_DTYPES[col] == object
            continue

        if isinstance(r, (tuple, list)):
            r0 = r[0]
            if hasattr(r0, "ndim") and r0.ndim == 0:
                r0 = r0.item()
            t = type(r0)
        elif np.isscalar(r):
            t = type(r)
        else:
            t = type(np.asarray(r).ravel()[0].item())

        if np.issubdtype(t, np.floating):
            assert (
                COL_DTYPES[col] == float
            ), f"{col} dtype {t} {msg} {COL_DTYPES[col]}"
        elif np.issubdtype(t, np.integer):
            assert (
                COL_DTYPES[col] == int
            ), f"{col} dtype {t} {msg} {COL_DTYPES[col]}"
        else:
            assert False, f"{col} dtype {t} {msg} {COL_DTYPES[col]}"


def test_deprecated_coords_argument():
    with pytest.warns(FutureWarning,
                      match="coordinates keyword argument"):
        regionprops(SAMPLE, coordinates="rc")
    with pytest.raises(ValueError):
        regionprops(SAMPLE, coordinates="xy")


def pixelcount(regionmask):
    """a short test for an extra property"""
    return jnp.sum(regionmask)


def median_intensity(regionmask, intensity_image):
    return jnp.median(intensity_image[regionmask])


def too_many_args(regionmask, intensity_image, superfluous):
    return 1


def too_few_args():
    return 1


def test_extra_properties():
    region = regionprops(SAMPLE, extra_properties=(pixelcount,))[0]
    assert int(region.pixelcount) == int((SAMPLE_np == 1).sum())


def test_extra_properties_intensity():
    region = regionprops(
        SAMPLE,
        intensity_image=INTENSITY_SAMPLE,
        extra_properties=(median_intensity,),
    )[0]
    assert float(region.median_intensity) == float(
        np.median(INTENSITY_SAMPLE_np[SAMPLE_np == 1])
    )


def test_extra_properties_no_intensity_provided():
    with pytest.raises(AttributeError):
        region = regionprops(SAMPLE, extra_properties=(median_intensity,))[0]
        _ = region.median_intensity


def test_extra_properties_nr_args():
    with pytest.raises(AttributeError):
        region = regionprops(SAMPLE, extra_properties=(too_few_args,))[0]
        _ = region.too_few_args
    with pytest.raises(AttributeError):
        region = regionprops(SAMPLE, extra_properties=(too_many_args,))[0]
        _ = region.too_many_args


def test_extra_properties_mixed():
    region = regionprops(
        SAMPLE,
        intensity_image=INTENSITY_SAMPLE,
        extra_properties=(median_intensity, pixelcount),
    )[0]
    assert float(region.median_intensity) == float(
        np.median(INTENSITY_SAMPLE_np[SAMPLE_np == 1])
    )
    assert int(region.pixelcount) == int((SAMPLE_np == 1).sum())


def test_extra_properties_table():
    out = regionprops_table(
        SAMPLE_MULTIPLE,
        intensity_image=INTENSITY_SAMPLE_MULTIPLE,
        properties=("label",),
        extra_properties=(median_intensity, pixelcount),
    )
    assert_array_almost_equal(out["median_intensity"], np.array([2.0, 4.0]))
    assert_array_equal(out["pixelcount"], np.array([10, 2]))


def test_multichannel():
    """Multichannel properties stack per-channel results on the last
    axis (synthetic labels/intensity standing in for astronaut+slic)."""
    rng = np.random.default_rng(42)
    labels_np = np.kron(
        np.arange(1, 17).reshape(4, 4), np.ones((16, 16), dtype=int)
    )
    intensity = rng.uniform(size=labels_np.shape + (3,)).astype(np.float64)
    labels = jnp.asarray(labels_np)
    green = jnp.asarray(intensity[..., 1])
    multi = jnp.asarray(intensity)

    segment_idx = int(labels_np.max() // 2)
    region = regionprops(labels, green)[segment_idx]
    region_multi = regionprops(labels, multi)[segment_idx]
    for prop in PROPS:
        p = region[prop]
        p_multi = region_multi[prop]
        if isinstance(p, (list, tuple)):
            p = np.stack([np.asarray(p_) for p_ in p])
        if isinstance(p_multi, (list, tuple)):
            p_multi = np.stack([np.asarray(p_) for p_ in p_multi])
        p = np.asarray(p)
        p_multi = np.asarray(p_multi)
        if np.shape(p) == np.shape(p_multi):
            # property does not depend on multiple channels
            assert_array_equal(p, p_multi)
        else:
            # multichannel props stack along the final axis
            assert_array_almost_equal(p, p_multi[..., 1])
