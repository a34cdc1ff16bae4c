"""Port of the reference skimage.util invert and map_array suites
(cupyimg/skimage/util/tests/test_invert.py, test_map_array.py) onto
jnp + cupyimg_tpu."""

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.skimage import dtype_limits
from cupyimg_tpu.skimage.util.dtype import dtype_range
from cupyimg_tpu.skimage.util import invert
from cupyimg_tpu.skimage.util._map_array import map_array, ArrayMap

assert_array_equal = np.testing.assert_array_equal


# ---------------------------------------------------------------- invert


def test_invert_bool():
    dtype = "bool"
    image = np.zeros((3, 3), dtype=dtype)
    upper_dtype_limit = dtype_limits(image, clip_negative=False)[1]
    image[1, :] = upper_dtype_limit
    expected = np.zeros((3, 3), dtype=dtype) + upper_dtype_limit
    expected[1, :] = 0
    result = invert(jnp.asarray(image))
    assert_array_equal(expected, result)


def test_invert_uint8():
    dtype = "uint8"
    image = np.zeros((3, 3), dtype=dtype)
    upper_dtype_limit = dtype_limits(image, clip_negative=False)[1]
    image[1, :] = upper_dtype_limit
    expected = np.zeros((3, 3), dtype=dtype) + upper_dtype_limit
    expected[1, :] = 0
    result = invert(jnp.asarray(image))
    assert_array_equal(expected, result)


def test_invert_int8():
    dtype = "int8"
    image = np.zeros((3, 3), dtype=dtype)
    lower_dtype_limit, upper_dtype_limit = dtype_limits(
        image, clip_negative=False
    )
    image[1, :] = lower_dtype_limit
    image[2, :] = upper_dtype_limit
    expected = np.zeros((3, 3), dtype=dtype)
    expected[2, :] = lower_dtype_limit
    expected[1, :] = upper_dtype_limit
    expected[0, :] = -1
    result = invert(jnp.asarray(image))
    assert_array_equal(expected, result)


def test_invert_float64_signed():
    dtype = "float64"
    image = np.zeros((3, 3), dtype=dtype)
    lower_dtype_limit, upper_dtype_limit = dtype_limits(
        image, clip_negative=False
    )
    image[1, :] = lower_dtype_limit
    image[2, :] = upper_dtype_limit
    expected = np.zeros((3, 3), dtype=dtype)
    expected[2, :] = lower_dtype_limit
    expected[1, :] = upper_dtype_limit
    result = invert(jnp.asarray(image), signed_float=True)
    assert_array_equal(expected, result)


def test_invert_float64_unsigned():
    dtype = "float64"
    image = np.zeros((3, 3), dtype=dtype)
    lower_dtype_limit, upper_dtype_limit = dtype_limits(
        image, clip_negative=True
    )
    image[2, :] = upper_dtype_limit
    expected = np.zeros((3, 3), dtype=dtype)
    expected[0, :] = upper_dtype_limit
    expected[1, :] = upper_dtype_limit
    result = invert(jnp.asarray(image))
    assert_array_equal(expected, result)


def test_invert_roundtrip():
    for t, limits in dtype_range.items():
        if np.dtype(t) == np.float16:
            # float16 arithmetic is promoted on this backend
            continue
        image = jnp.array(limits, dtype=t)
        expected = invert(invert(image))
        assert_array_equal(image, expected)


# ------------------------------------------------------------- map_array


def test_map_array_incorrect_output_shape():
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 5, size=(24, 25)))
    out = np.empty((24, 24))
    in_values = jnp.unique(labels)
    out_values = jnp.asarray(
        rng.random_sample(in_values.shape).astype(out.dtype)
    )
    # this functional framework categorically rejects `out=`; the
    # reference raises ValueError for the bad shape
    with pytest.raises((ValueError, NotImplementedError)):
        map_array(labels, in_values, out_values, out=out)


def test_map_array_non_contiguous_output_array():
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 5, size=(24, 25)))
    out = np.empty((24 * 3, 25 * 2))[::3, ::2]
    in_values = jnp.unique(labels)
    out_values = jnp.asarray(
        rng.random_sample(in_values.shape).astype(out.dtype)
    )
    with pytest.raises((ValueError, NotImplementedError)):
        map_array(labels, in_values, out_values, out=out)


def test_arraymap_long_str():
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 40, size=(24, 25)))
    in_values = jnp.unique(labels)
    out_values = jnp.asarray(rng.random_sample(in_values.shape))
    m = ArrayMap(in_values, out_values)
    assert len(str(m).split("\n")) == m._max_str_lines + 2


def test_arraymap_update():
    rng = np.random.RandomState(1)
    in_values = jnp.unique(jnp.asarray(rng.randint(0, 200, size=5)))
    out_values = jnp.asarray(rng.random_sample(len(in_values)))
    m = ArrayMap(in_values, out_values)
    image = jnp.asarray(rng.randint(1, len(m), size=(512, 512)))
    assert np.all(np.asarray(m[image]) < 1)  # missing values map to 0
    m[1:] = m[1:] + 1
    assert np.all(np.asarray(m[image]) >= 1)


def test_arraymap_bool_index():
    rng = np.random.RandomState(2)
    in_values = jnp.unique(jnp.asarray(rng.randint(0, 200, size=5)))
    out_values = jnp.asarray(rng.random_sample(len(in_values)))
    m = ArrayMap(in_values, out_values)
    image = jnp.asarray(rng.randint(1, len(in_values), size=(512, 512)))
    assert np.all(np.asarray(m[image]) < 1)  # missing values map to 0
    positive = np.ones(len(m), dtype=bool)
    positive[0] = False
    m[positive] = m[positive] + 1
    assert np.all(np.asarray(m[image]) >= 1)
