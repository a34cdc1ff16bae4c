"""Ported reference profile_line suite
(cupyimg/skimage/measure/tests/test_profile.py) — exact golden
profiles for axis-aligned, diagonal, and pythagorean lines, linewidth
averaging, and the reduce_func variants."""

import numpy as np
import jax.numpy as jnp

from numpy.testing import assert_array_equal, assert_array_almost_equal

from cupyimg_tpu.skimage.measure import profile_line
from cupyimg_tpu.numpy import apply_along_axis


image = jnp.asarray(np.arange(100).reshape((10, 10)).astype(np.float64))


def test_horizontal_rightward():
    prof = profile_line(image, (0, 2), (0, 8), order=0, mode="constant")
    assert_array_equal(np.asarray(prof), np.arange(2, 9))


def test_horizontal_leftward():
    prof = profile_line(image, (0, 8), (0, 2), order=0, mode="constant")
    assert_array_equal(np.asarray(prof), np.arange(8, 1, -1))


def test_vertical_downward():
    prof = profile_line(image, (2, 5), (8, 5), order=0, mode="constant")
    assert_array_equal(np.asarray(prof), np.arange(25, 95, 10))


def test_vertical_upward():
    prof = profile_line(image, (8, 5), (2, 5), order=0, mode="constant")
    assert_array_equal(np.asarray(prof), np.arange(85, 15, -10))


def test_45deg_right_downward():
    prof = profile_line(image, (2, 2), (8, 8), order=0, mode="constant")
    # repeats are nearest-neighbor aliasing along the diagonal
    assert_array_almost_equal(
        np.asarray(prof),
        np.array([22, 33, 33, 44, 55, 55, 66, 77, 77, 88]),
    )


def test_45deg_right_downward_interpolated():
    prof = profile_line(image, (2, 2), (8, 8), order=1, mode="constant")
    assert_array_almost_equal(np.asarray(prof), np.linspace(22, 88, 10))


def test_45deg_right_upward():
    prof = profile_line(image, (8, 2), (2, 8), order=1, mode="constant")
    assert_array_almost_equal(np.asarray(prof), np.arange(82, 27, -6))


def test_45deg_left_upward():
    prof = profile_line(image, (8, 8), (2, 2), order=1, mode="constant")
    assert_array_almost_equal(
        np.asarray(prof), np.arange(88, 21, -22.0 / 3)
    )


def test_45deg_left_downward():
    prof = profile_line(image, (2, 8), (8, 2), order=1, mode="constant")
    assert_array_almost_equal(np.asarray(prof), np.arange(28, 83, 6))


def test_pythagorean_triangle_right_downward():
    prof = profile_line(image, (1, 1), (7, 9), order=0, mode="constant")
    assert_array_equal(
        np.asarray(prof),
        np.array([11, 22, 23, 33, 34, 45, 56, 57, 67, 68, 79]),
    )


def test_pythagorean_triangle_right_downward_interpolated():
    prof = profile_line(image, (1, 1), (7, 9), order=1, mode="constant")
    assert_array_almost_equal(np.asarray(prof), np.linspace(11, 79, 11))


def _pyth_image():
    img = np.zeros((6, 7), np.float64)
    line = ((1, 2, 2, 3, 3, 4), (1, 2, 3, 3, 4, 5))
    below = ((2, 2, 3, 4, 4, 5), (0, 1, 2, 3, 4, 4))
    above = ((0, 1, 1, 2, 3, 3), (2, 2, 3, 4, 5, 6))
    img[line] = 1.8
    img[below] = 0.6
    img[above] = 0.6
    return img


PYTH = _pyth_image()


def test_pythagorean_triangle_right_downward_linewidth():
    prof = profile_line(
        jnp.asarray(PYTH), (1, 1), (4, 5), linewidth=3, order=0,
        mode="constant",
    )
    assert_array_almost_equal(np.asarray(prof), np.ones(6))


def test_pythagorean_triangle_right_upward_linewidth():
    prof = profile_line(
        jnp.asarray(PYTH[::-1, :]), (4, 1), (1, 5), linewidth=3,
        order=0, mode="constant",
    )
    assert_array_almost_equal(np.asarray(prof), np.ones(6))


def test_pythagorean_triangle_transpose_left_down_linewidth():
    prof = profile_line(
        jnp.asarray(PYTH.T[:, ::-1]), (1, 4), (5, 1), linewidth=3,
        order=0, mode="constant",
    )
    assert_array_almost_equal(np.asarray(prof), np.ones(6))


def test_reduce_func_mean():
    prof = profile_line(
        jnp.asarray(PYTH), (0, 1), (3, 1), linewidth=3, order=0,
        reduce_func=jnp.mean, mode="reflect",
    )
    assert_array_almost_equal(np.asarray(prof), PYTH[:4, :3].mean(1))


def test_reduce_func_max():
    prof = profile_line(
        jnp.asarray(PYTH), (0, 1), (3, 1), linewidth=3, order=0,
        reduce_func=jnp.max, mode="reflect",
    )
    assert_array_almost_equal(np.asarray(prof), PYTH[:4, :3].max(1))


def test_reduce_func_sum():
    prof = profile_line(
        jnp.asarray(PYTH), (0, 1), (3, 1), linewidth=3, order=0,
        reduce_func=jnp.sum, mode="reflect",
    )
    assert_array_almost_equal(np.asarray(prof), PYTH[:4, :3].sum(1))


def test_reduce_func_mean_linewidth_1():
    prof = profile_line(
        jnp.asarray(PYTH), (0, 1), (3, 1), linewidth=1, order=0,
        reduce_func=jnp.mean, mode="constant",
    )
    assert_array_almost_equal(np.asarray(prof), PYTH[:4, 1])


def test_reduce_func_None_linewidth_1():
    prof = profile_line(
        jnp.asarray(PYTH), (1, 2), (4, 2), linewidth=1, order=0,
        reduce_func=None, mode="constant",
    )
    assert_array_almost_equal(
        np.asarray(prof), PYTH[1:5, 2, np.newaxis]
    )


def test_reduce_func_None_linewidth_3():
    prof = profile_line(
        jnp.asarray(PYTH), (1, 2), (4, 2), linewidth=3, order=0,
        reduce_func=None, mode="constant",
    )
    assert_array_almost_equal(np.asarray(prof), PYTH[1:5, 1:4])


def test_reduce_func_lambda_linewidth_3():
    def reduce_func(x):
        return x + x ** 2

    prof = profile_line(
        jnp.asarray(PYTH), (1, 2), (4, 2), linewidth=3, order=0,
        reduce_func=reduce_func, mode="constant",
    )
    exp = apply_along_axis(
        reduce_func, arr=jnp.asarray(PYTH[1:5, 1:4]), axis=1
    )
    assert_array_almost_equal(np.asarray(prof), np.asarray(exp))


def test_reduce_func_sqrt_linewidth_3():
    def reduce_func(x):
        return x ** 0.5

    prof = profile_line(
        jnp.asarray(PYTH), (1, 2), (4, 2), linewidth=3, order=0,
        reduce_func=reduce_func, mode="constant",
    )
    exp = apply_along_axis(
        reduce_func, arr=jnp.asarray(PYTH[1:5, 1:4]), axis=1
    )
    assert_array_almost_equal(np.asarray(prof), np.asarray(exp))


def test_reduce_func_sumofsqrt_linewidth_3():
    def reduce_func(x):
        return (x ** 0.5).sum()

    prof = profile_line(
        jnp.asarray(PYTH), (1, 2), (4, 2), linewidth=3, order=0,
        reduce_func=reduce_func, mode="constant",
    )
    exp = apply_along_axis(
        reduce_func, arr=jnp.asarray(PYTH[1:5, 1:4]), axis=1
    )
    assert_array_almost_equal(np.asarray(prof), np.asarray(exp))
