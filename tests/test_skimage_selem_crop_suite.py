"""Ported reference selem, crop, and shannon_entropy suites
(cupyimg/skimage/morphology/tests/test_selem.py,
cupyimg/skimage/util/tests/test_arraycrop.py,
cupyimg/skimage/measure/tests/test_entropy.py) — exact golden masks
and values.  The matlab-mask disk/ball comparisons need skimage's data
files and stay untested here (disk/ball are covered against analytic
definitions in test_skimage_morphology.py)."""

import numpy as np

import jax.numpy as jnp

from numpy.testing import assert_array_equal, assert_almost_equal

from cupyimg_tpu.skimage.morphology import selem
from cupyimg_tpu.skimage.util import crop
from cupyimg_tpu.skimage.measure import shannon_entropy


class TestSelemGolden:
    def test_square(self):
        for k in range(5):
            assert_array_equal(
                np.asarray(selem.square(k)),
                np.ones((k, k), dtype="uint8"),
            )

    def test_rectangle(self):
        for i in range(5):
            for j in range(5):
                assert_array_equal(
                    np.asarray(selem.rectangle(i, j)),
                    np.ones((i, j), dtype="uint8"),
                )

    def test_cube(self):
        for k in range(5):
            assert_array_equal(
                np.asarray(selem.cube(k)),
                np.ones((k, k, k), dtype="uint8"),
            )

    def test_octagon(self):
        expected1 = np.array(
            [
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
            ],
            dtype=np.uint8,
        )
        assert_array_equal(np.asarray(selem.octagon(5, 3)), expected1)
        expected2 = np.array(
            [[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8
        )
        assert_array_equal(np.asarray(selem.octagon(1, 1)), expected2)

    def test_ellipse(self):
        expected1 = np.array(
            [
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
            ],
            dtype=np.uint8,
        )
        assert_array_equal(np.asarray(selem.ellipse(5, 3)), expected1)
        expected2 = np.ones((3, 3), dtype=np.uint8)
        assert_array_equal(np.asarray(selem.ellipse(1, 1)), expected2)
        assert_array_equal(np.asarray(selem.ellipse(3, 5)).T, expected1)

    def test_star(self):
        expected1 = np.array(
            [
                [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
                [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
                [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
            ],
            dtype=np.uint8,
        )
        assert_array_equal(np.asarray(selem.star(4)), expected1)
        expected2 = np.ones((3, 3), dtype=np.uint8)
        assert_array_equal(np.asarray(selem.star(1)), expected2)


class TestCrop:
    def test_multi_crop(self):
        arr = jnp.arange(45).reshape(9, 5)
        out = np.asarray(crop(arr, ((1, 2), (2, 1))))
        assert_array_equal(out[0], [7, 8])
        assert_array_equal(out[-1], [32, 33])
        assert out.shape == (6, 2)

    def test_pair_crop(self):
        arr = jnp.arange(45).reshape(9, 5)
        out = np.asarray(crop(arr, (1, 2)))
        assert_array_equal(out[0], [6, 7])
        assert_array_equal(out[-1], [31, 32])
        assert out.shape == (6, 2)

    def test_int_crop(self):
        arr = jnp.arange(45).reshape(9, 5)
        out = np.asarray(crop(arr, 1))
        assert_array_equal(out[0], [6, 7, 8])
        assert_array_equal(out[-1], [36, 37, 38])
        assert out.shape == (7, 3)

    def test_copy_crop(self):
        # jax arrays are immutable; copy=True must still work and
        # match the view values
        arr = jnp.arange(45).reshape(9, 5)
        out0 = np.asarray(crop(arr, 1, copy=True))
        out1 = np.asarray(crop(arr, 1))
        assert_array_equal(out0, out1)

    def test_zero_crop(self):
        out = crop(jnp.arange(45).reshape(9, 5), 0)
        assert out.shape == (9, 5)


class TestShannonEntropy:
    def test_ones(self):
        res = shannon_entropy(jnp.ones((10, 10)), base=np.e)
        assert_almost_equal(float(res), 0.0)

    def test_all_unique(self):
        res = shannon_entropy(jnp.arange(64), base=2)
        assert_almost_equal(float(res), np.log(64) / np.log(2))
