"""Reference skimage peak_local_max suite port.

Mirrors /root/reference/cupyimg/skimage/feature/tests/test_peak.py
(fully synthetic there already — direct port, cp->jnp).
"""

import itertools

import numpy as np
import pytest
from scipy import ndimage as ndimage_cpu

import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage.feature import peak


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _deprecated_indices(fn, *args, **kw):
    with pytest.warns(FutureWarning, match="indices argument is deprecated"):
        return fn(*args, **kw)


class TestPeakLocalMax:
    def test_trivial_case(self):
        trivial = jnp.zeros((25, 25))
        peak_indices = peak.peak_local_max(trivial, min_distance=1)
        assert peak_indices.size == 0
        peaks = _deprecated_indices(
            peak.peak_local_max, trivial, min_distance=1, indices=False
        )
        assert bool(jnp.all(peaks.astype(bool) == trivial.astype(bool)))

    def test_noisy_peaks(self):
        peak_locations = [(7, 7), (7, 13), (13, 7), (13, 13)]
        rng = np.random.RandomState(21)
        image = 0.8 * rng.rand(20, 20)
        for r, c in peak_locations:
            image[r, c] = 1
        peaks_detected = peak.peak_local_max(jnp.asarray(image),
                                             min_distance=5)
        assert len(peaks_detected) == len(peak_locations)
        for loc in np.asarray(peaks_detected):
            assert tuple(loc) in peak_locations

    def test_relative_threshold(self):
        image = np.zeros((5, 5), dtype=np.uint8)
        image[1, 1] = 10
        image[3, 3] = 20
        peaks = peak.peak_local_max(jnp.asarray(image), min_distance=1,
                                    threshold_rel=0.5)
        assert len(peaks) == 1
        assert_array_equal(peaks, [(3, 3)])

    def test_absolute_threshold(self):
        image = np.zeros((5, 5), dtype=np.uint8)
        image[1, 1] = 10
        image[3, 3] = 20
        peaks = peak.peak_local_max(jnp.asarray(image), min_distance=1,
                                    threshold_abs=10)
        assert len(peaks) == 1
        assert_array_equal(peaks, [(3, 3)])

    def test_constant_image(self):
        image = jnp.full((20, 20), 128, dtype=jnp.uint8)
        peaks = peak.peak_local_max(image, min_distance=1)
        assert len(peaks) == 0

    def test_flat_peak(self):
        image = np.zeros((5, 5), dtype=np.uint8)
        image[1:3, 1:3] = 10
        peaks = peak.peak_local_max(jnp.asarray(image), min_distance=1)
        assert len(peaks) == 4

    def test_sorted_peaks(self):
        image = np.zeros((5, 5), dtype=np.uint8)
        image[1, 1] = 20
        image[3, 3] = 10
        peaks = peak.peak_local_max(jnp.asarray(image), min_distance=1)
        assert np.asarray(peaks).tolist() == [[1, 1], [3, 3]]

        image = np.zeros((3, 10))
        image[1, (1, 3, 5, 7)] = (1, 2, 3, 4)
        peaks = peak.peak_local_max(jnp.asarray(image), min_distance=1)
        assert np.asarray(peaks).tolist() == [[1, 7], [1, 5], [1, 3], [1, 1]]

    def test_num_peaks(self):
        image = np.zeros((7, 7), dtype=np.uint8)
        image[1, 1] = 10
        image[1, 3] = 11
        image[1, 5] = 12
        image[3, 5] = 8
        image[5, 3] = 7
        image = jnp.asarray(image)
        assert (
            len(peak.peak_local_max(image, min_distance=1, threshold_abs=0))
            == 5
        )
        peaks_limited = np.asarray(
            peak.peak_local_max(
                image, min_distance=1, threshold_abs=0, num_peaks=2
            )
        )
        assert len(peaks_limited) == 2
        assert (1, 3) in map(tuple, peaks_limited)
        assert (1, 5) in map(tuple, peaks_limited)

        peaks_limited = np.asarray(
            peak.peak_local_max(
                image, min_distance=1, threshold_abs=0, num_peaks=4
            )
        )
        assert len(peaks_limited) == 4
        for want in [(1, 3), (1, 5), (1, 1), (3, 5)]:
            assert want in map(tuple, peaks_limited)

    def test_num_peaks_and_labels(self):
        image = np.zeros((7, 7), dtype=np.uint8)
        labels = jnp.asarray(np.full((7, 7), 20, dtype=np.uint8))
        image[1, 1] = 10
        image[1, 3] = 11
        image[1, 5] = 12
        image[3, 5] = 8
        image[5, 3] = 7
        image = jnp.asarray(image)
        peaks_limited = peak.peak_local_max(
            image, min_distance=1, threshold_abs=0, labels=labels
        )
        assert len(peaks_limited) == 5
        peaks_limited = peak.peak_local_max(
            image, min_distance=1, threshold_abs=0, labels=labels,
            num_peaks=2,
        )
        assert len(peaks_limited) == 2

    def test_num_peaks_tot_vs_labels_4quadrants(self):
        rng = np.random.RandomState(21)
        image = jnp.asarray(rng.uniform(size=(20, 30)))
        i, j = np.mgrid[0:20, 0:30]
        labels = jnp.asarray(1 + (i >= 10) + (j >= 15) * 2)
        result = peak.peak_local_max(
            image, labels=labels, min_distance=1, threshold_rel=0,
            num_peaks=np.inf, num_peaks_per_label=2,
        )
        assert len(result) == 8
        result = peak.peak_local_max(
            image, labels=labels, min_distance=1, threshold_rel=0,
            num_peaks=np.inf, num_peaks_per_label=1,
        )
        assert len(result) == 4
        result = peak.peak_local_max(
            image, labels=labels, min_distance=1, threshold_rel=0,
            num_peaks=2, num_peaks_per_label=2,
        )
        assert len(result) == 2

    def test_num_peaks3D(self):
        image = np.zeros((10, 10, 100))
        image[5, 5, ::5] = np.arange(20)
        peaks_limited = peak.peak_local_max(
            jnp.asarray(image), min_distance=1, num_peaks=2
        )
        assert len(peaks_limited) == 2

    def test_reorder_labels(self):
        rng = np.random.RandomState(21)
        image = jnp.asarray(rng.uniform(size=(40, 60)))
        i, j = np.mgrid[0:40, 0:60]
        labels = 1 + (i >= 20) + (j >= 30) * 2
        labels[labels == 4] = 5
        i, j = np.mgrid[-3:4, -3:4]
        footprint = i * i + j * j <= 9
        expected = np.zeros(image.shape, float)
        for imin, imax in ((0, 20), (20, 40)):
            for jmin, jmax in ((0, 30), (30, 60)):
                expected[imin:imax, jmin:jmax] = np.asarray(
                    ndi.maximum_filter(
                        image[imin:imax, jmin:jmax],
                        footprint=jnp.asarray(footprint),
                    )
                )
        expected = expected == np.asarray(image)
        result = _deprecated_indices(
            peak.peak_local_max, image, labels=jnp.asarray(labels),
            min_distance=1, threshold_rel=0,
            footprint=jnp.asarray(footprint), indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == jnp.asarray(expected)))

    def test_indices_with_labels(self):
        rng = np.random.RandomState(21)
        image_np = rng.uniform(size=(40, 60))
        image = jnp.asarray(image_np)
        i, j = np.mgrid[0:40, 0:60]
        labels = jnp.asarray(1 + (i >= 20) + (j >= 30) * 2)
        i, j = np.mgrid[-3:4, -3:4]
        footprint = i * i + j * j <= 9
        expected = np.zeros(image.shape, float)
        for imin, imax in ((0, 20), (20, 40)):
            for jmin, jmax in ((0, 30), (30, 60)):
                expected[imin:imax, jmin:jmax] = np.asarray(
                    ndi.maximum_filter(
                        image[imin:imax, jmin:jmax],
                        footprint=jnp.asarray(footprint),
                    )
                )
        expected = np.column_stack(np.nonzero(expected == image_np))
        expected = expected[
            np.argsort(image_np[tuple(expected.T)])[::-1]
        ]
        result = peak.peak_local_max(
            image, labels=labels, min_distance=1, threshold_rel=0,
            footprint=jnp.asarray(footprint), exclude_border=False,
        )
        result = np.asarray(result)
        result = result[np.argsort(image_np[tuple(result.T)])[::-1]]
        assert (result == expected).all()

    def test_ndarray_indices_false(self):
        nd_image = np.zeros((5, 5, 5))
        nd_image[2, 2, 2] = 1
        peaks = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(nd_image), min_distance=1,
            indices=False,
        )
        assert bool(jnp.all(peaks == jnp.asarray(nd_image.astype(bool))))

    def test_ndarray_exclude_border(self):
        nd_image = np.zeros((5, 5, 5))
        nd_image[[1, 0, 0], [0, 1, 0], [0, 0, 1]] = 1
        nd_image[3, 0, 0] = 1
        nd_image[2, 2, 2] = 1
        expected = np.zeros_like(nd_image, dtype=bool)
        expected[2, 2, 2] = True
        expectedNoBorder = np.zeros_like(nd_image, dtype=bool)
        expectedNoBorder[2, 2, 2] = True
        expectedNoBorder[0, 0, 1] = True
        expectedNoBorder[3, 0, 0] = True
        img = jnp.asarray(nd_image)
        result = _deprecated_indices(
            peak.peak_local_max, img, min_distance=2, exclude_border=2,
            indices=False,
        )
        assert_array_equal(result, expected)
        assert_array_equal(
            _deprecated_indices(peak.peak_local_max, img, min_distance=2,
                                exclude_border=2, indices=False),
            _deprecated_indices(peak.peak_local_max, img, min_distance=2,
                                exclude_border=True, indices=False),
        )
        assert_array_equal(
            _deprecated_indices(peak.peak_local_max, img, min_distance=2,
                                exclude_border=0, indices=False),
            _deprecated_indices(peak.peak_local_max, img, min_distance=2,
                                exclude_border=False, indices=False),
        )
        assert_array_equal(
            _deprecated_indices(peak.peak_local_max, img, min_distance=2,
                                exclude_border=0, indices=False),
            expectedNoBorder,
        )
        assert_array_equal(
            _deprecated_indices(peak.peak_local_max, img,
                                exclude_border=False, indices=False),
            nd_image.astype(bool),
        )

    def test_empty(self):
        image = jnp.zeros((10, 20))
        labels = jnp.zeros((10, 20), jnp.int32)
        result = _deprecated_indices(
            peak.peak_local_max, image, labels=labels,
            footprint=jnp.ones((3, 3), bool), min_distance=1,
            threshold_rel=0, indices=False, exclude_border=False,
        )
        assert bool(jnp.all(~result))

    def test_empty_non2d_indices(self):
        image = jnp.zeros((10, 10, 10))
        result = peak.peak_local_max(
            image, footprint=jnp.ones((3, 3, 3), bool), min_distance=1,
            threshold_rel=0, exclude_border=False,
        )
        assert result.shape == (0, image.ndim)

    def test_one_point(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        labels[5, 5] = 1
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == jnp.asarray(labels == 1)))

    def test_adjacent_and_same(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5:6] = 1
        labels[5, 5:6] = 1
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == jnp.asarray(labels == 1)))

    def test_adjacent_and_different(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        image[5, 6] = 0.5
        labels[5, 5:6] = 1
        expected = jnp.asarray(image == 1)
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == expected))
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), min_distance=1, threshold_rel=0,
            indices=False, exclude_border=False,
        )
        assert bool(jnp.all(result == expected))

    def test_not_adjacent_and_different(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        image[5, 8] = 0.5
        labels[image > 0] = 1
        expected = jnp.asarray(labels == 1)
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == expected))

    def test_two_objects(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        image[5, 15] = 0.5
        labels[5, 5] = 1
        labels[5, 15] = 2
        expected = jnp.asarray(labels > 0)
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == expected))

    def test_adjacent_different_objects(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        image[5, 6] = 0.5
        labels[5, 5] = 1
        labels[5, 6] = 2
        expected = jnp.asarray(labels > 0)
        result = _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image),
            labels=jnp.asarray(labels), footprint=jnp.ones((3, 3), bool),
            min_distance=1, threshold_rel=0, indices=False,
            exclude_border=False,
        )
        assert bool(jnp.all(result == expected))

    def test_four_quadrants(self):
        rng = np.random.RandomState(21)
        image_np = rng.uniform(size=(20, 30))
        image = jnp.asarray(image_np)
        i, j = np.mgrid[0:20, 0:30]
        labels = 1 + (i >= 10) + (j >= 15) * 2
        i, j = np.mgrid[-3:4, -3:4]
        footprint = i * i + j * j <= 9
        expected = np.zeros(image.shape, float)
        for imin, imax in ((0, 10), (10, 20)):
            for jmin, jmax in ((0, 15), (15, 30)):
                expected[imin:imax, jmin:jmax] = np.asarray(
                    ndi.maximum_filter(
                        image[imin:imax, jmin:jmax],
                        footprint=jnp.asarray(footprint),
                    )
                )
        expected = expected == image_np
        result = _deprecated_indices(
            peak.peak_local_max, image, labels=jnp.asarray(labels),
            footprint=jnp.asarray(footprint), min_distance=1,
            threshold_rel=0, indices=False, exclude_border=False,
        )
        assert bool(jnp.all(result == jnp.asarray(expected)))

    def test_disk(self):
        """img-1194 regression: footprint=[[1]] -> every point peaks."""
        rng = np.random.RandomState(21)
        image = jnp.asarray(rng.uniform(size=(10, 20)))
        footprint = jnp.asarray([[1]])
        result = _deprecated_indices(
            peak.peak_local_max, image,
            labels=jnp.ones((10, 20), jnp.int32), footprint=footprint,
            min_distance=1, threshold_rel=0, threshold_abs=-1,
            indices=False, exclude_border=False,
        )
        assert bool(jnp.all(result))
        result = _deprecated_indices(
            peak.peak_local_max, image, footprint=footprint,
            threshold_abs=-1, indices=False, exclude_border=False,
        )
        assert bool(jnp.all(result))

    def test_3D(self):
        image = np.zeros((30, 30, 30))
        image[15, 15, 15] = 1
        image[5, 5, 5] = 1
        image = jnp.asarray(image)
        assert_array_equal(
            peak.peak_local_max(image, min_distance=10, threshold_rel=0),
            [[15, 15, 15]],
        )
        assert_array_equal(
            peak.peak_local_max(image, min_distance=6, threshold_rel=0),
            [[15, 15, 15]],
        )
        assert sorted(
            np.asarray(
                peak.peak_local_max(
                    image, min_distance=10, threshold_rel=0,
                    exclude_border=False,
                )
            ).tolist()
        ) == [[5, 5, 5], [15, 15, 15]]
        assert sorted(
            np.asarray(
                peak.peak_local_max(image, min_distance=5, threshold_rel=0)
            ).tolist()
        ) == [[5, 5, 5], [15, 15, 15]]

    def test_4D(self):
        image = np.zeros((30, 30, 30, 30))
        image[15, 15, 15, 15] = 1
        image[5, 5, 5, 5] = 1
        image = jnp.asarray(image)
        assert_array_equal(
            peak.peak_local_max(image, min_distance=10, threshold_rel=0),
            [[15, 15, 15, 15]],
        )
        assert_array_equal(
            peak.peak_local_max(image, min_distance=6, threshold_rel=0),
            [[15, 15, 15, 15]],
        )
        assert sorted(
            np.asarray(
                peak.peak_local_max(
                    image, min_distance=10, threshold_rel=0,
                    exclude_border=False,
                )
            ).tolist()
        ) == [[5, 5, 5, 5], [15, 15, 15, 15]]
        assert sorted(
            np.asarray(
                peak.peak_local_max(image, min_distance=5, threshold_rel=0)
            ).tolist()
        ) == [[5, 5, 5, 5], [15, 15, 15, 15]]

    def test_threshold_rel_default(self):
        image = np.ones((5, 5))
        image[2, 2] = 1
        assert len(peak.peak_local_max(jnp.asarray(image))) == 0
        image[2, 2] = 2
        assert_array_equal(
            peak.peak_local_max(jnp.asarray(image)), [[2, 2]]
        )
        image[2, 2] = 0
        with pytest.warns(RuntimeWarning, match="When min_distance < 1"):
            assert (
                len(
                    peak.peak_local_max(jnp.asarray(image), min_distance=0)
                )
                == image.size - 1
            )


@pytest.mark.parametrize(
    ["indices"],
    [[indices] for indices in itertools.product(range(5), range(5))],
)
def test_exclude_border(indices):
    image = np.zeros((5, 5))
    image[indices] = 1
    image = jnp.asarray(image)

    assert len(peak.peak_local_max(image, exclude_border=False)) == 1
    assert len(peak.peak_local_max(image, exclude_border=0)) == 1

    if indices[0] in (0, 4) or indices[1] in (0, 4):
        expected_peaks = 0
    else:
        expected_peaks = 1
    assert (
        len(peak.peak_local_max(image, min_distance=1, exclude_border=True))
        == expected_peaks
    )

    if indices[0] in (0, 4):
        expected_peaks = 0
    else:
        expected_peaks = 1
    assert (
        len(peak.peak_local_max(image, exclude_border=(1, 0)))
        == expected_peaks
    )

    if indices[1] in (0, 4):
        expected_peaks = 0
    else:
        expected_peaks = 1
    assert (
        len(peak.peak_local_max(image, exclude_border=(0, 1)))
        == expected_peaks
    )


def test_exclude_border_errors():
    image = jnp.zeros((5, 5))
    with pytest.raises(ValueError):
        peak.peak_local_max(image, exclude_border=(1,))
    with pytest.raises(TypeError):
        peak.peak_local_max(image, exclude_border=1.0)
    with pytest.raises(ValueError):
        peak.peak_local_max(image, exclude_border=(1, "a"))
    with pytest.raises(ValueError):
        peak.peak_local_max(image, exclude_border=(1, -1))
    with pytest.raises(ValueError):
        peak.peak_local_max(image, exclude_border=-1)


class TestProminentPeaks:
    def test_isolated_peaks(self):
        image = np.zeros((15, 15))
        x0, y0, i0 = (12, 8, 1)
        x1, y1, i1 = (2, 2, 1)
        x2, y2, i2 = (5, 13, 1)
        image[y0, x0] = i0
        image[y1, x1] = i1
        image[y2, x2] = i2
        out = peak._prominent_peaks(jnp.asarray(image))
        assert len(out[0]) == 3
        for i, x, y in zip(*map(np.asarray, out)):
            assert i in (i0, i1, i2)
            assert x in (x0, x1, x2)
            assert y in (y0, y1, y2)

    def test_threshold(self):
        image = np.zeros((15, 15))
        x0, y0, i0 = (12, 8, 10)
        x1, y1, i1 = (2, 2, 8)
        x2, y2, i2 = (5, 13, 10)
        image[y0, x0] = i0
        image[y1, x1] = i1
        image[y2, x2] = i2
        out = peak._prominent_peaks(jnp.asarray(image), threshold=None)
        assert len(out[0]) == 3
        for i, x, y in zip(*map(np.asarray, out)):
            assert i in (i0, i1, i2)
            assert x in (x0, x1, x2)
        out = peak._prominent_peaks(jnp.asarray(image), threshold=9)
        assert len(out[0]) == 2
        for i, x, y in zip(*map(np.asarray, out)):
            assert i in (i0, i2)
            assert x in (x0, x2)
            assert y in (y0, y2)

    def test_peaks_in_contact(self):
        image = np.zeros((15, 15))
        x0, y0, i0 = (8, 8, 1)
        x1, y1, i1 = (7, 7, 1)  # the prominent peak
        x2, y2, i2 = (6, 6, 1)
        image[y0, x0] = i0
        image[y1, x1] = i1
        image[y2, x2] = i2
        out = peak._prominent_peaks(
            jnp.asarray(image), min_xdistance=3, min_ydistance=3
        )
        assert_array_equal(out[0], (i1,))
        assert_array_equal(out[1], (x1,))
        assert_array_equal(out[2], (y1,))

    def test_input_labels_unmodified(self):
        image = np.zeros((10, 20))
        labels = np.zeros((10, 20), int)
        image[5, 5] = 1
        labels[5, 5] = 3
        labels_j = jnp.asarray(labels)
        _deprecated_indices(
            peak.peak_local_max, jnp.asarray(image), labels=labels_j,
            footprint=jnp.ones((3, 3), bool), min_distance=1,
            threshold_rel=0, indices=False, exclude_border=False,
        )
        assert bool(jnp.all(labels_j == jnp.asarray(labels)))

    def test_many_objects(self):
        mask = np.zeros([500, 500], dtype=bool)
        x, y = np.indices((500, 500))
        x_c = x // 20 * 20 + 10
        y_c = y // 20 * 20 + 10
        mask[(x - x_c) ** 2 + (y - y_c) ** 2 < 8 ** 2] = True
        labels, num_objs = ndimage_cpu.label(mask)
        dist = ndimage_cpu.distance_transform_edt(mask)

        local_max = peak.peak_local_max(
            jnp.asarray(dist), min_distance=20, exclude_border=False,
            labels=jnp.asarray(labels),
        )
        assert len(local_max) == 625
