"""Port of the reference skimage.morphology misc and reconstruction
suites (cupyimg/skimage/morphology/tests/test_misc.py,
test_reconstruction.py) onto jnp + cupyimg_tpu.  ``in_place=True`` is
rejected by this functional framework, so those tests assert the
documented contract instead of aliasing."""

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.skimage.morphology import (
    remove_small_objects,
    remove_small_holes,
)
from cupyimg_tpu.skimage.morphology.greyreconstruct import reconstruction
from cupyimg_tpu.skimage._shared._warnings import expected_warnings

assert_array_equal = np.testing.assert_array_equal
assert_array_almost_equal = np.testing.assert_array_almost_equal


test_image = jnp.asarray(
    np.array(
        [[0, 0, 0, 1, 0], [1, 1, 1, 0, 0], [1, 1, 1, 0, 1]], bool
    )
)


def test_one_connectivity():
    expected = np.array(
        [[0, 0, 0, 0, 0], [1, 1, 1, 0, 0], [1, 1, 1, 0, 0]], bool
    )
    observed = remove_small_objects(test_image, min_size=6)
    assert_array_equal(observed, expected)


def test_two_connectivity():
    expected = np.array(
        [[0, 0, 0, 1, 0], [1, 1, 1, 0, 0], [1, 1, 1, 0, 0]], bool
    )
    observed = remove_small_objects(
        test_image, min_size=7, connectivity=2
    )
    assert_array_equal(observed, expected)


def test_in_place():
    # this functional framework rejects in_place aliasing loudly
    with pytest.raises(NotImplementedError):
        remove_small_objects(test_image, min_size=6, in_place=True)


def test_labeled_image():
    labeled_image = jnp.asarray(
        np.array(
            [
                [2, 2, 2, 0, 1],
                [2, 2, 2, 0, 1],
                [2, 0, 0, 0, 0],
                [0, 0, 3, 3, 3],
            ],
            dtype=int,
        )
    )
    expected = np.array(
        [
            [2, 2, 2, 0, 0],
            [2, 2, 2, 0, 0],
            [2, 0, 0, 0, 0],
            [0, 0, 3, 3, 3],
        ],
        dtype=int,
    )
    observed = remove_small_objects(labeled_image, min_size=3)
    assert_array_equal(observed, expected)


def test_uint_image():
    labeled_image = jnp.asarray(
        np.array(
            [
                [2, 2, 2, 0, 1],
                [2, 2, 2, 0, 1],
                [2, 0, 0, 0, 0],
                [0, 0, 3, 3, 3],
            ],
            dtype=np.uint8,
        )
    )
    expected = np.array(
        [
            [2, 2, 2, 0, 0],
            [2, 2, 2, 0, 0],
            [2, 0, 0, 0, 0],
            [0, 0, 3, 3, 3],
        ],
        dtype=np.uint8,
    )
    observed = remove_small_objects(labeled_image, min_size=3)
    assert_array_equal(observed, expected)


def test_single_label_warning():
    image = jnp.asarray(
        np.array(
            [[0, 0, 0, 1, 0], [1, 1, 1, 0, 0], [1, 1, 1, 0, 0]], int
        )
    )
    with expected_warnings(["use a boolean array?"]):
        remove_small_objects(image, min_size=6)


def test_float_input():
    float_test = jnp.asarray(np.random.rand(5, 5))
    with pytest.raises(TypeError):
        remove_small_objects(float_test)


def test_negative_input():
    negative_int = jnp.asarray(np.random.randint(-4, -1, size=(5, 5)))
    with pytest.raises(ValueError):
        remove_small_objects(negative_int)


test_holes_image = jnp.asarray(
    np.array(
        [
            [0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
            [0, 1, 0, 0, 1, 1, 0, 0, 0, 0],
            [0, 1, 1, 1, 0, 1, 0, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
            [0, 0, 0, 0, 0, 0, 0, 1, 0, 1],
            [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
        ],
        np.bool_,
    )
)

_FILLED = np.array(
    [
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
    ],
    np.bool_,
)


def test_one_connectivity_holes():
    observed = remove_small_holes(test_holes_image, area_threshold=3)
    assert_array_equal(observed, _FILLED)


def test_two_connectivity_holes():
    expected = np.array(
        [
            [0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
            [0, 1, 0, 0, 1, 1, 0, 0, 0, 0],
            [0, 1, 1, 1, 0, 1, 0, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
            [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
            [0, 0, 0, 0, 0, 0, 0, 1, 1, 1],
        ],
        np.bool_,
    )
    observed = remove_small_holes(
        test_holes_image, area_threshold=3, connectivity=2
    )
    assert_array_equal(observed, expected)


def test_in_place_holes():
    with pytest.raises(NotImplementedError):
        remove_small_holes(
            test_holes_image, area_threshold=3, in_place=True
        )


_LABELED_HOLES_INT = np.array(
    [
        [0, 0, 0, 0, 0, 0, 1, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 1, 0, 0, 1, 1, 0, 0, 0, 0],
        [0, 1, 1, 1, 0, 1, 0, 0, 0, 0],
        [0, 1, 1, 1, 1, 1, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 2, 2, 2],
        [0, 0, 0, 0, 0, 0, 0, 2, 0, 2],
        [0, 0, 0, 0, 0, 0, 0, 2, 2, 2],
    ]
)


def test_labeled_image_holes():
    labeled_holes_image = jnp.asarray(
        _LABELED_HOLES_INT.astype(np.int64)
    )
    with expected_warnings(["returned as a boolean array"]):
        observed = remove_small_holes(
            labeled_holes_image, area_threshold=3
        )
    assert_array_equal(observed, _FILLED)


def test_uint_image_holes():
    labeled_holes_image = jnp.asarray(
        _LABELED_HOLES_INT.astype(np.uint8)
    )
    with expected_warnings(["returned as a boolean array"]):
        observed = remove_small_holes(
            labeled_holes_image, area_threshold=3
        )
    assert_array_equal(observed, _FILLED)


def test_label_warning_holes():
    labeled_holes_image = jnp.asarray(
        _LABELED_HOLES_INT.astype(np.int64)
    )
    with expected_warnings(["use a boolean array?"]):
        remove_small_holes(labeled_holes_image, area_threshold=3)
    remove_small_holes(
        labeled_holes_image.astype(bool), area_threshold=3
    )


def test_float_input_holes():
    float_test = jnp.asarray(np.random.rand(5, 5))
    with pytest.raises(TypeError):
        remove_small_holes(float_test)


# -------------------------------------------------------- reconstruction


def test_zeros():
    """Reconstruction with image and mask of zeros."""
    assert_array_almost_equal(
        reconstruction(jnp.zeros((5, 7)), jnp.zeros((5, 7))), 0
    )


def test_image_equals_mask():
    assert_array_almost_equal(
        reconstruction(jnp.ones((7, 5)), jnp.ones((7, 5))), 1
    )


def test_image_less_than_mask():
    image = jnp.ones((5, 5))
    mask = jnp.ones((5, 5)) * 2
    assert_array_almost_equal(reconstruction(image, mask), 1)


def test_one_image_peak():
    image = jnp.ones((5, 5)).at[2, 2].set(2)
    mask = jnp.ones((5, 5)) * 3
    assert_array_almost_equal(reconstruction(image, mask), 2)


def test_two_image_peaks():
    image = jnp.asarray(
        [
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 2, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 3, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
        ],
        dtype=jnp.float64,
    )

    mask = jnp.asarray(
        [
            [4, 4, 4, 1, 1, 1, 1, 1],
            [4, 4, 4, 1, 1, 1, 1, 1],
            [4, 4, 4, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 4, 4, 4],
            [1, 1, 1, 1, 1, 4, 4, 4],
            [1, 1, 1, 1, 1, 4, 4, 4],
        ],
        dtype=jnp.float64,
    )

    expected = np.asarray(
        [
            [2, 2, 2, 1, 1, 1, 1, 1],
            [2, 2, 2, 1, 1, 1, 1, 1],
            [2, 2, 2, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 3, 3, 3],
            [1, 1, 1, 1, 1, 3, 3, 3],
            [1, 1, 1, 1, 1, 3, 3, 3],
        ]
    )
    assert_array_almost_equal(reconstruction(image, mask), expected)


def test_zero_image_one_mask():
    result = reconstruction(jnp.zeros((10, 10)), jnp.ones((10, 10)))
    assert_array_almost_equal(result, 0)


def test_fill_hole():
    seed = jnp.asarray([0, 8, 8, 8, 8, 8, 8, 8, 8, 0],
                       dtype=jnp.float64)
    mask = jnp.asarray([0, 3, 6, 2, 1, 1, 1, 4, 2, 0],
                       dtype=jnp.float64)
    result = reconstruction(seed, mask, method="erosion")
    assert_array_almost_equal(
        result, np.asarray([0, 3, 6, 4, 4, 4, 4, 4, 2, 0])
    )


def test_invalid_seed():
    seed = jnp.ones((5, 5))
    mask = jnp.ones((5, 5))
    with pytest.raises(ValueError):
        reconstruction(seed * 2, mask, method="dilation")
    with pytest.raises(ValueError):
        reconstruction(seed * 0.5, mask, method="erosion")


def test_invalid_selem():
    seed = jnp.ones((5, 5))
    mask = jnp.ones((5, 5))
    with pytest.raises(ValueError):
        reconstruction(seed, mask, selem=np.ones((4, 4)))
    with pytest.raises(ValueError):
        reconstruction(seed, mask, selem=np.ones((3, 4)))
    reconstruction(seed, mask, selem=np.ones((3, 3)))


def test_invalid_method():
    seed = jnp.asarray([0, 8, 8, 8, 8, 8, 8, 8, 8, 0],
                       dtype=jnp.float64)
    mask = jnp.asarray([0, 3, 6, 2, 1, 1, 1, 4, 2, 0],
                       dtype=jnp.float64)
    with pytest.raises(ValueError):
        reconstruction(seed, mask, method="foo")


def test_invalid_offset_not_none():
    image = jnp.asarray(
        [
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 2, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 3, 1],
            [1, 1, 1, 1, 1, 1, 1, 1],
        ],
        dtype=jnp.float64,
    )

    mask = jnp.asarray(
        [
            [4, 4, 4, 1, 1, 1, 1, 1],
            [4, 4, 4, 1, 1, 1, 1, 1],
            [4, 4, 4, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 4, 4, 4],
            [1, 1, 1, 1, 1, 4, 4, 4],
            [1, 1, 1, 1, 1, 4, 4, 4],
        ],
        dtype=jnp.float64,
    )
    with pytest.raises(ValueError):
        reconstruction(
            image,
            mask,
            method="dilation",
            selem=np.ones((3, 3)),
            offset=np.array([3, 0]),
        )


def test_offset_not_none():
    seed = jnp.asarray([0, 3, 6, 2, 1, 1, 1, 4, 2, 0],
                       dtype=jnp.float64)
    mask = jnp.asarray([0, 8, 6, 8, 8, 8, 8, 4, 4, 0],
                       dtype=jnp.float64)
    expected = np.asarray([0, 3, 6, 6, 6, 6, 6, 4, 4, 0])

    assert_array_almost_equal(
        reconstruction(
            seed,
            mask,
            method="dilation",
            selem=np.ones(3),
            offset=np.array([0]),
        ),
        expected,
    )
