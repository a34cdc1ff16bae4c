"""Ported reference img_as_* / _convert suite
(cupyimg/skimage/util/tests/test_dtype.py) — range mapping across all
dtype pairs, bool expansion, downcast warning, out-of-range floats,
float passthrough, and no-clobber guarantees (jax arrays are immutable,
so the clobber contract holds by construction; kept as a smoke check).
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage import (
    img_as_float,
    img_as_float32,
    img_as_float64,
    img_as_int,
    img_as_uint,
    img_as_ubyte,
)
from cupyimg_tpu.skimage.util.dtype import _convert

dtype_range = {
    np.uint8: (0, 255),
    np.uint16: (0, 65535),
    np.int8: (-128, 127),
    np.int16: (-32768, 32767),
    np.float32: (-1.0, 1.0),
    np.float64: (-1.0, 1.0),
}

img_funcs = (
    img_as_int,
    img_as_float64,
    img_as_float32,
    img_as_uint,
    img_as_ubyte,
)
dtypes_for_img_funcs = (np.int16, np.float64, np.float32, np.uint16,
                        np.ubyte)
img_funcs_and_types = list(zip(img_funcs, dtypes_for_img_funcs))


def _verify_range(x, vmin, vmax, dtype):
    x = np.asarray(x)
    assert x[0] == vmin
    assert x[-1] == vmax
    assert x.dtype == np.dtype(dtype)


@pytest.mark.parametrize(
    "dtype, f_and_dt",
    list(itertools.product(dtype_range, img_funcs_and_types)),
)
def test_range(dtype, f_and_dt):
    imin, imax = dtype_range[dtype]
    x = jnp.asarray(np.linspace(imin, imax, 10).astype(dtype))
    f, dt = f_and_dt
    y = f(x)
    omin, omax = dtype_range[dt]
    if imin == 0 or omin == 0:
        omin = 0
    _verify_range(y, omin, omax, dt)


dtype_range_extra = dict(dtype_range)
dtype_range_extra.update(
    {np.int32: (-2147483648, 2147483647), np.uint32: (0, 4294967295)}
)

dtype_pairs = [
    (np.uint8, np.uint32),
    (np.int8, np.uint32),
    (np.int8, np.int32),
    (np.int32, np.int8),
    (np.float64, np.float32),
    (np.int32, np.float32),
]


@pytest.mark.parametrize("dtype_in, dt", dtype_pairs)
def test_range_extra_dtypes(dtype_in, dt):
    imin, imax = dtype_range_extra[dtype_in]
    x = jnp.asarray(np.linspace(imin, imax, 10).astype(dtype_in))
    y = _convert(x, dt)
    omin, omax = dtype_range_extra[dt]
    _verify_range(y, omin, omax, dt)


def test_downcast():
    x = jnp.asarray(np.arange(10).astype(np.uint64))
    with pytest.warns(UserWarning, match="Downcasting"):
        y = img_as_int(x)
    np.testing.assert_allclose(np.asarray(y), np.arange(10))
    assert y.dtype == jnp.int16


def test_float_out_of_range():
    with pytest.raises(ValueError):
        img_as_int(jnp.asarray(np.array([2], dtype=np.float32)))
    with pytest.raises(ValueError):
        img_as_int(jnp.asarray(np.array([-2], dtype=np.float32)))


def test_float_float_all_ranges():
    arr_in = jnp.asarray(
        np.array([[-10.0, 10.0, 1e20]], dtype=np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(img_as_float(arr_in)), np.asarray(arr_in)
    )


def test_copy():
    x = jnp.asarray(np.array([1], dtype=np.float64))
    y = img_as_float(x)
    z = img_as_float(x, force_copy=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(z))
    assert z.dtype == x.dtype


def test_bool():
    img = jnp.zeros((10, 10), bool).at[1, 1].set(True)
    for func, dt in [
        (img_as_int, np.int16),
        (img_as_float, np.float64),
        (img_as_uint, np.uint16),
        (img_as_ubyte, np.ubyte),
    ]:
        converted = np.asarray(func(img))
        assert converted.sum() == dtype_range[dt][1]


def test_clobber():
    # jax arrays are immutable, but the conversion must still not
    # produce aliasing surprises: converting a converted image leaves
    # the intermediate unchanged
    for func_input_type in img_funcs:
        for func_output_type in img_funcs:
            img = jnp.asarray(np.random.RandomState(0).rand(5, 5))
            img_in = func_input_type(img)
            before = np.asarray(img_in).copy()
            func_output_type(img_in)
            np.testing.assert_array_equal(np.asarray(img_in), before)


def test_signed_scaling_float32():
    x = jnp.asarray(np.array([-128, 127], dtype=np.int8))
    y = img_as_float32(x)
    assert float(jnp.max(y)) == 1.0


def test_float32_passthrough():
    x = jnp.asarray(np.array([-1, 1], dtype=np.float32))
    y = img_as_float(x)
    assert y.dtype == x.dtype


float_dtype_list = [
    float,
    np.double,
    np.single,
    np.float32,
    np.float64,
    "float32",
    "float64",
]


def test_float_conversion_dtype():
    x0 = jnp.asarray(np.array([-1, 1]))
    for dtype_in in float_dtype_list:
        for dtype_out in float_dtype_list:
            x = x0.astype(dtype_in)
            y = _convert(x, dtype_out)
            assert y.dtype == np.dtype(dtype_out)
