"""Ported reference view_as_blocks/view_as_windows and block_reduce
suites (cupyimg/skimage/util/tests/test_shape.py,
cupyimg/skimage/measure/tests/test_block.py) — golden values and
validation-error contracts."""

import numpy as np
import pytest

import jax.numpy as jnp

from numpy.testing import (
    assert_array_equal,
    assert_array_almost_equal,
)

from cupyimg_tpu.skimage.util.shape import (
    view_as_blocks,
    view_as_windows,
)
from cupyimg_tpu.skimage.measure import block_reduce


class TestViewAsBlocks:
    def test_block_not_a_tuple(self):
        with pytest.raises(TypeError):
            view_as_blocks(jnp.arange(10), [5])

    def test_negative_shape(self):
        with pytest.raises(ValueError):
            view_as_blocks(jnp.arange(10), (-2,))

    def test_block_too_large(self):
        with pytest.raises(ValueError):
            view_as_blocks(jnp.arange(10), (11,))

    def test_wrong_block_dimension(self):
        with pytest.raises(ValueError):
            view_as_blocks(jnp.arange(10), (2, 2))

    def test_1d_wrong_block_shape(self):
        with pytest.raises(ValueError):
            view_as_blocks(jnp.arange(10), (3,))

    def test_1d(self):
        B = view_as_blocks(jnp.arange(10), (5,))
        assert_array_equal(
            np.asarray(B), [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
        )

    def test_2d(self):
        A = jnp.arange(4 * 4).reshape(4, 4)
        B = view_as_blocks(A, (2, 2))
        assert_array_equal(np.asarray(B[0, 1]), [[2, 3], [6, 7]])
        assert int(B[1, 0, 1, 1]) == 13

    def test_3d(self):
        A = jnp.arange(4 * 4 * 6).reshape(4, 4, 6)
        B = view_as_blocks(A, (1, 2, 2))
        assert B.shape == (4, 2, 3, 1, 2, 2)
        assert_array_equal(
            np.asarray(B[2:, 0, 2]),
            [[[[52, 53], [58, 59]]], [[[76, 77], [82, 83]]]],
        )


class TestViewAsWindows:
    def test_input_not_array(self):
        with pytest.raises(TypeError):
            view_as_windows([1, 2, 3, 4, 5], (2,))

    def test_wrong_window_dimension(self):
        with pytest.raises(ValueError):
            view_as_windows(jnp.arange(10), (2, 2))

    def test_negative_window_length(self):
        with pytest.raises(ValueError):
            view_as_windows(jnp.arange(10), (-1,))

    def test_window_too_large(self):
        with pytest.raises(ValueError):
            view_as_windows(jnp.arange(10), (11,))

    def test_step_below_one(self):
        with pytest.raises(ValueError):
            view_as_windows(jnp.arange(10), (11,), step=0.9)

    def test_1d(self):
        B = view_as_windows(jnp.arange(10), (3,))
        assert_array_equal(
            np.asarray(B),
            [[0, 1, 2], [1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6],
             [5, 6, 7], [6, 7, 8], [7, 8, 9]],
        )

    def test_2d(self):
        A = jnp.arange(5 * 4).reshape(5, 4)
        B = view_as_windows(A, (4, 3))
        assert B.shape == (2, 2, 4, 3)
        assert_array_equal(
            np.asarray(B),
            [[[[0, 1, 2], [4, 5, 6], [8, 9, 10], [12, 13, 14]],
              [[1, 2, 3], [5, 6, 7], [9, 10, 11], [13, 14, 15]]],
             [[[4, 5, 6], [8, 9, 10], [12, 13, 14], [16, 17, 18]],
              [[5, 6, 7], [9, 10, 11], [13, 14, 15], [17, 18, 19]]]],
        )

    def test_with_skip(self):
        A = jnp.arange(20).reshape((5, 4))
        B = view_as_windows(A, 2, step=2)
        assert_array_equal(
            np.asarray(B),
            [[[[0, 1], [4, 5]], [[2, 3], [6, 7]]],
             [[[8, 9], [12, 13]], [[10, 11], [14, 15]]]],
        )
        C = view_as_windows(A, 2, step=4)
        assert C.shape == (1, 1, 2, 2)


class TestBlockReduce:
    def test_sum(self):
        out1 = block_reduce(jnp.arange(4 * 6).reshape(4, 6), (2, 3))
        assert_array_equal(np.asarray(out1), [[24, 42], [96, 114]])
        out2 = block_reduce(jnp.arange(5 * 8).reshape(5, 8), (3, 3))
        assert_array_equal(
            np.asarray(out2), [[81, 108, 87], [174, 192, 138]]
        )

    def test_mean(self):
        out1 = block_reduce(
            jnp.arange(4 * 6).reshape(4, 6), (2, 3), func=jnp.mean
        )
        assert_array_equal(np.asarray(out1), [[4.0, 7.0], [16.0, 19.0]])
        out2 = block_reduce(
            jnp.arange(5 * 8).reshape(5, 8), (4, 5), func=jnp.mean
        )
        assert_array_equal(
            np.asarray(out2), [[14.0, 10.8], [8.5, 5.7]]
        )

    def test_median(self):
        out1 = block_reduce(
            jnp.arange(4 * 6).reshape(4, 6), (2, 3), func=jnp.median
        )
        assert_array_equal(np.asarray(out1), [[4.0, 7.0], [16.0, 19.0]])
        out2 = block_reduce(
            jnp.arange(5 * 8).reshape(5, 8), (4, 5), func=jnp.median
        )
        assert_array_equal(np.asarray(out2), [[14.0, 6.5], [0.0, 0.0]])
        out3 = block_reduce(
            jnp.asarray([[1, 5, 5, 5], [5, 5, 5, 1000]]), (2, 4),
            func=jnp.median,
        )
        assert_array_equal(np.asarray(out3), [[5]])

    def test_min(self):
        out1 = block_reduce(
            jnp.arange(4 * 6).reshape(4, 6), (2, 3), func=jnp.min
        )
        assert_array_equal(np.asarray(out1), [[0, 3], [12, 15]])
        out2 = block_reduce(
            jnp.arange(5 * 8).reshape(5, 8), (4, 5), func=jnp.min
        )
        assert_array_equal(np.asarray(out2), [[0, 0], [0, 0]])

    def test_max(self):
        out1 = block_reduce(
            jnp.arange(4 * 6).reshape(4, 6), (2, 3), func=jnp.max
        )
        assert_array_equal(np.asarray(out1), [[8, 11], [20, 23]])
        out2 = block_reduce(
            jnp.arange(5 * 8).reshape(5, 8), (4, 5), func=jnp.max
        )
        assert_array_equal(np.asarray(out2), [[28, 31], [36, 39]])

    def test_invalid_block_size(self):
        image = jnp.arange(4 * 6).reshape(4, 6)
        with pytest.raises(ValueError):
            block_reduce(image, [1, 2, 3])
        with pytest.raises(ValueError):
            block_reduce(image, [1, 0.5])

    def test_func_kwargs_different_dtype(self):
        image = jnp.asarray(
            [[0.45745366, 0.67479345, 0.20949775, 0.3147348],
             [0.7209286, 0.88915504, 0.66153409, 0.07919526],
             [0.04640037, 0.54008495, 0.34664343, 0.56152301],
             [0.58085003, 0.80144708, 0.87844473, 0.29811511]],
            dtype=jnp.float64,
        )
        out = block_reduce(
            image, (2, 2), func=jnp.mean,
            func_kwargs={"dtype": jnp.float16},
        )
        assert_array_almost_equal(
            np.asarray(out, dtype=np.float64),
            [[0.6855, 0.3164], [0.4922, 0.521]],
            decimal=3,
        )
        assert out.dtype == jnp.float16
