"""skimage.measure tests (scipy/analytic/docstring oracles)."""

import warnings

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.skimage.measure as measure
from cupyimg_tpu.scipy import ndimage as ndi


class TestFindObjects:
    def test_vs_scipy(self):
        rng = np.random.RandomState(0)
        a = (rng.rand(30, 31) > 0.7).astype(int)
        lab, _ = sndi.label(a)
        got = ndi.find_objects(lab)
        exp = sndi.find_objects(lab)
        assert got == exp

    def test_max_label_and_missing(self):
        a = np.zeros((8, 8), int)
        a[1, 1] = 1
        a[5, 5] = 3
        assert ndi.find_objects(a) == sndi.find_objects(a)
        assert ndi.find_objects(a, max_label=2) == sndi.find_objects(
            a, max_label=2
        )

    def test_empty(self):
        assert ndi.find_objects(np.zeros((4, 4), int)) == []


class TestLabel:
    def test_docstring_examples(self):
        x = np.eye(3, dtype=int)
        np.testing.assert_array_equal(
            np.asarray(measure.label(x, connectivity=1)),
            [[1, 0, 0], [0, 2, 0], [0, 0, 3]],
        )
        np.testing.assert_array_equal(
            np.asarray(measure.label(x, connectivity=2)),
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        )
        np.testing.assert_array_equal(
            np.asarray(measure.label(x, background=-1)),
            [[1, 2, 2], [2, 1, 2], [2, 2, 1]],
        )
        x = np.array([[1, 0, 0], [1, 1, 5], [0, 0, 0]])
        np.testing.assert_array_equal(
            np.asarray(measure.label(x)),
            [[1, 0, 0], [1, 1, 2], [0, 0, 0]],
        )

    def test_return_num(self):
        x = np.eye(3, dtype=int)
        labs, num = measure.label(x, connectivity=1, return_num=True)
        assert num == 3

    def test_binary_vs_scipy(self):
        rng = np.random.RandomState(1)
        a = rng.rand(20, 21) > 0.6
        got, n_got = measure.label(a, connectivity=1, return_num=True)
        exp, n_exp = sndi.label(a)
        assert n_got == n_exp
        # same partition (up to label permutation): check one-to-one map
        got = np.asarray(got)
        pairs = {(g, e) for g, e in zip(got.ravel(), exp.ravel())}
        assert len(pairs) == n_exp + 1


class TestMoments:
    def test_docstring_square(self):
        image = np.zeros((20, 20))
        image[13:17, 13:17] = 1
        M = np.asarray(measure.moments(image))
        assert (M[1, 0] / M[0, 0], M[0, 1] / M[0, 0]) == (14.5, 14.5)
        mc = np.asarray(measure.moments_central(image, (14.5, 14.5)))
        exp = np.array(
            [
                [16.0, 0.0, 20.0, 0.0],
                [0.0, 0.0, 0.0, 0.0],
                [20.0, 0.0, 25.0, 0.0],
                [0.0, 0.0, 0.0, 0.0],
            ]
        )
        np.testing.assert_allclose(mc, exp, atol=1e-9)
        nu = np.asarray(measure.moments_normalized(mc))
        assert np.isnan(nu[0, 0]) and np.isnan(nu[0, 1])
        np.testing.assert_allclose(nu[2, 0], 0.078125)
        np.testing.assert_allclose(nu[2, 2], 0.006103515625)

    def test_hu_docstring(self):
        image = np.zeros((20, 20))
        image[13:17, 13:17] = 0.5
        image[10:12, 10:12] = 1
        mu = measure.moments_central(image)
        nu = measure.moments_normalized(mu)
        hu = np.asarray(measure.moments_hu(nu))
        exp = [
            7.45370370e-01,
            3.51165981e-01,
            1.04049179e-01,
            4.06442107e-02,
            2.64312299e-03,
            2.40854582e-02,
            4.33680869e-19,
        ]
        np.testing.assert_allclose(hu, exp, atol=1e-10)

    def test_moments_coords_equivalence(self):
        image = np.zeros((20, 20))
        image[13:17, 14:18] = 1
        coords = np.argwhere(image)
        mcc = np.asarray(measure.moments_coords(coords))
        m = np.asarray(measure.moments(image))
        np.testing.assert_allclose(mcc, m, atol=1e-9)

    def test_centroid_weighted(self):
        image = np.zeros((20, 20))
        image[13:17, 13:17] = 0.5
        image[10:12, 10:12] = 1
        np.testing.assert_allclose(
            np.asarray(measure.centroid(image)),
            [13.16666667, 13.16666667],
        )

    def test_inertia_tensor_rotation_invariant_trace(self):
        rng = np.random.RandomState(2)
        image = rng.rand(16, 16)
        T = np.asarray(measure.inertia_tensor(image))
        ev = np.asarray(measure.inertia_tensor_eigvals(image))
        np.testing.assert_allclose(np.trace(T), ev.sum(), rtol=1e-10)
        assert ev[0] >= ev[1] >= 0


class TestRegionpropsUtils:
    def test_euler_2d(self):
        # solid square: 1; with a hole: 0
        img = np.zeros((10, 10))
        img[2:8, 2:8] = 1
        assert measure.euler_number(img) == 1
        img[4:6, 4:6] = 0
        assert measure.euler_number(img) == 0
        assert measure.euler_number(img, connectivity=1) == 0

    def test_euler_3d(self):
        SAMPLE = np.zeros((20, 20, 20))
        SAMPLE[5:15, 5:15, 5:15] = 1
        assert measure.euler_number(SAMPLE) == 1
        SAMPLE[8:12, 8:12, 8:12] = 0
        assert measure.euler_number(SAMPLE) == 2

    def test_perimeter_square(self):
        img = np.zeros((12, 12), bool)
        img[3:9, 3:9] = True  # 6x6 square
        # border path length: 4 * 5 = 20
        assert float(measure.perimeter(img, 4)) == pytest.approx(20.0)

    def test_perimeter_crofton_circle(self):
        # Crofton perimeter of a large disk approximates 2*pi*r
        r = 30
        L = np.arange(-40, 41)
        X, Y = np.meshgrid(L, L)
        disk = X**2 + Y**2 <= r * r
        p = float(measure.perimeter_crofton(disk, 4))
        assert abs(p - 2 * np.pi * r) / (2 * np.pi * r) < 0.02


class TestRegionprops:
    def _setup(self):
        img = np.zeros((20, 22), int)
        img[2:8, 3:10] = 1
        img[12:18, 12:20] = 2
        return img

    def test_basic_properties(self):
        img = self._setup()
        props = measure.regionprops(img)
        assert len(props) == 2
        p = props[0]
        assert p.area == 42
        assert p.bbox == (2, 3, 8, 10)
        assert p.centroid == (4.5, 6.0)
        assert p.extent == 1.0
        assert p.euler_number == 1
        assert p.bbox_area == 42
        assert p.filled_area == 42
        assert p.solidity == 1.0
        assert p.label == 1
        # uniform 6x7 rect: eigvals (48/12, 35/12)
        np.testing.assert_allclose(
            np.asarray(p.inertia_tensor_eigvals), [4.0, 35 / 12.0]
        )
        assert p.major_axis_length == pytest.approx(8.0)
        assert p.minor_axis_length == pytest.approx(4 * np.sqrt(35 / 12))
        assert p.orientation == pytest.approx(np.pi / 2)
        assert p.perimeter == pytest.approx(22.0)

    def test_label_gap_gives_none_skip(self):
        img = np.zeros((10, 10), int)
        img[1:3, 1:3] = 1
        img[6:9, 6:9] = 3  # label 2 missing
        props = measure.regionprops(img)
        assert [p.label for p in props] == [1, 3]

    def test_coords_and_image(self):
        img = self._setup()
        p = measure.regionprops(img)[1]
        coords = np.asarray(p.coords)
        rr, cc = np.nonzero(img == 2)
        np.testing.assert_array_equal(
            coords, np.stack([rr, cc], axis=1)
        )
        assert np.asarray(p.image).all()

    def test_intensity_properties(self):
        img = self._setup()
        rng = np.random.RandomState(0)
        intens = rng.rand(20, 22)
        p = measure.regionprops(img, intensity_image=intens)[0]
        m = img == 1
        assert float(p.mean_intensity) == pytest.approx(
            intens[m].mean()
        )
        assert float(p.max_intensity) == pytest.approx(intens[m].max())
        assert float(p.min_intensity) == pytest.approx(intens[m].min())
        rr, cc = np.nonzero(m)
        w = intens[m]
        np.testing.assert_allclose(
            p.weighted_centroid,
            ((rr * w).sum() / w.sum(), (cc * w).sum() / w.sum()),
        )

    def test_moments_vs_direct(self):
        img = self._setup()
        p = measure.regionprops(img)[0]
        mask = (img[p.slice] == 1).astype(np.uint8)
        np.testing.assert_allclose(
            np.asarray(p.moments),
            np.asarray(measure.moments(mask, 3)),
            atol=1e-9,
        )

    def test_hole_filling_and_euler(self):
        img = np.zeros((12, 12), int)
        img[2:10, 2:10] = 1
        img[5:7, 5:7] = 0
        p = measure.regionprops(img)[0]
        assert p.euler_number == 0
        assert p.filled_area == 64
        assert p.area == 60

    def test_feret_rect(self):
        img = np.zeros((20, 22), int)
        img[2:8, 3:10] = 1
        p = measure.regionprops(img)[0]
        # contour midpoint extremes of a 6x7 box
        assert p.feret_diameter_max == pytest.approx(
            np.hypot(5, 7), rel=1e-6
        )

    def test_extra_properties(self):
        img = self._setup()

        def pixelcount(regionmask):
            return int(np.sum(np.asarray(regionmask)))

        props = measure.regionprops(img, extra_properties=(pixelcount,))
        assert props[0].pixelcount == 42
        assert props[1]["pixelcount"] == 48

    def test_legacy_keys_and_iter(self):
        img = self._setup()
        p = measure.regionprops(img)[0]
        assert p["Area"] == p.area
        keys = list(iter(p))
        assert "area" in keys and "intensity_image" not in keys

    def test_type_errors(self):
        with pytest.raises(TypeError):
            measure.regionprops(np.zeros((5, 5), bool))
        with pytest.raises(TypeError):
            measure.regionprops(np.zeros((5, 5), float))
        with pytest.raises(TypeError):
            measure.regionprops(np.zeros((5,), int).reshape(5))


class TestRegionpropsTable:
    def test_table(self):
        img = np.zeros((20, 22), int)
        img[2:8, 3:10] = 1
        img[12:18, 12:20] = 2
        tbl = measure.regionprops_table(
            img, properties=["label", "area", "centroid"]
        )
        np.testing.assert_array_equal(tbl["label"], [1, 2])
        np.testing.assert_array_equal(tbl["area"], [42, 48])
        np.testing.assert_allclose(tbl["centroid-0"], [4.5, 14.5])
        np.testing.assert_allclose(tbl["centroid-1"], [6.0, 15.5])

    def test_empty_table(self):
        tbl = measure.regionprops_table(
            np.zeros((6, 6), int), properties=["label", "area"]
        )
        assert tbl["label"].shape == (0,)
        assert tbl["area"].shape == (0,)


class TestProfileEntropyPolygon:
    def test_profile_line_docstring(self):
        x = np.asarray([[1, 1, 1, 2, 2, 2]])
        img = np.vstack(
            [np.zeros_like(x), x, x, x, np.zeros_like(x)]
        ).astype(float)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            np.testing.assert_allclose(
                np.asarray(measure.profile_line(img, (2, 1), (2, 4))),
                [1.0, 1.0, 2.0, 2.0],
            )
            np.testing.assert_allclose(
                np.asarray(
                    measure.profile_line(img, (1, 0), (1, 6), cval=4)
                ),
                [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 4.0],
            )
            np.testing.assert_allclose(
                np.asarray(
                    measure.profile_line(
                        img, (1, 0), (1, 3), linewidth=3,
                        reduce_func=np.mean,
                    )
                ),
                [2 / 3, 2 / 3, 2 / 3, 4 / 3],
            )

    def test_shannon_entropy(self):
        # 3/4 ones, 1/4 zeros -> H = 0.811278
        assert float(
            measure.shannon_entropy(np.array([[0, 1], [1, 1]]))
        ) == pytest.approx(0.8112781244591328)

    def test_subdivide_polygon_in_hull_and_closed(self):
        coords = np.array(
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float
        )
        out = np.asarray(measure.subdivide_polygon(coords, degree=2))
        assert (out[0] == out[-1]).all()  # stays closed
        assert out.min() >= 0 and out.max() <= 4  # inside hull

    def test_approximate_polygon(self):
        # points on a straight line collapse to endpoints
        line = np.stack(
            [np.arange(10.0), np.arange(10.0) * 2], axis=1
        )
        line[5, 1] += 0.01  # tiny deviation below tolerance
        out = np.asarray(measure.approximate_polygon(line, 0.5))
        assert out.shape == (2, 2)
        # large deviation is kept (plus neighbors that now deviate from
        # the new chords)
        line[5, 1] += 5
        out = np.asarray(measure.approximate_polygon(line, 0.5))
        assert out.shape[0] >= 3
        assert any((out == line[5]).all(axis=1))
