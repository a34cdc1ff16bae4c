"""Reference skimage edge-filter suite port.

Mirrors /root/reference/cupyimg/skimage/filters/tests/test_edges.py
(the adapted scikit-image suite). The only substitution: the 3-D cases
there use ``skimage.data.binary_blobs`` (scikit-image is not in this
env); we instead embed the empirically-maximal 3x3x3 edge cube into a
random binary volume — the max filter response over any binary image is
achieved exactly at that pattern, so the same equality assertion holds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage import filters
from cupyimg_tpu.skimage.filters.edges import _mask_filter_result


def assert_allclose(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


def assert_array_almost_equal(a, b, **kw):
    np.testing.assert_array_almost_equal(np.asarray(a), np.asarray(b), **kw)


def test_roberts_zeros():
    """Roberts' filter on an array of all zeros."""
    result = filters.roberts(jnp.zeros((10, 10)), jnp.ones((10, 10), bool))
    assert jnp.all(result == 0)


def test_roberts_diagonal1():
    """Roberts' filter on a diagonal edge should be a diagonal line."""
    image = jnp.asarray(np.tri(10, 10, 0))
    expected = ~(
        np.tri(10, 10, -1).astype(bool)
        | np.tri(10, 10, -2).astype(bool).transpose()
    )
    expected[-1, -1] = 0  # due to 'reflect' & image shape, last pixel not edge
    result = filters.roberts(image).astype(bool)
    assert_array_almost_equal(result, expected)


def test_roberts_diagonal2():
    """Roberts' filter on a diagonal edge should be a diagonal line."""
    image = jnp.asarray(np.rot90(np.tri(10, 10, 0), 3))
    expected = ~np.rot90(
        np.tri(10, 10, -1).astype(bool)
        | np.tri(10, 10, -2).astype(bool).transpose()
    )
    expected = _mask_filter_result(jnp.asarray(expected), None)
    result = filters.roberts(image).astype(bool)
    assert_array_almost_equal(result, expected)


def test_sobel_zeros():
    """Sobel on an array of all zeros."""
    result = filters.sobel(jnp.zeros((10, 10)), jnp.ones((10, 10), bool))
    assert jnp.all(result == 0)


def test_sobel_mask():
    """Sobel on a masked array should be zero."""
    rng = np.random.default_rng(0)
    result = filters.sobel(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert jnp.all(result == 0)


def _hv_grids():
    i, j = np.mgrid[-5:6, -5:6]
    return i, j


def test_sobel_horizontal():
    """Sobel on a horizontal edge should be a horizontal line."""
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.sobel(image)) * np.sqrt(2)
    assert_allclose(result[i == 0], 1)
    assert_allclose(result[np.abs(i) > 1], 0, atol=1e-10)


def test_sobel_vertical():
    """Sobel on a vertical edge should be a vertical line."""
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.sobel(image)) * np.sqrt(2)
    assert_allclose(result[j == 0], 1)
    assert np.all(np.abs(result[np.abs(j) > 1]) < 1e-10)


def test_sobel_h_zeros():
    result = filters.sobel_h(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert jnp.all(result == 0)


def test_sobel_h_mask():
    rng = np.random.default_rng(1)
    result = filters.sobel_h(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert jnp.all(result == 0)


def test_sobel_h_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.sobel_h(image))
    assert_allclose(result[i == 0], 1)
    assert_allclose(result[np.abs(i) > 1], 0, atol=1e-10)


def test_sobel_h_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float) * np.sqrt(2))
    result = np.asarray(filters.sobel_h(image))
    assert_allclose(result, 0, atol=1e-10)


def test_sobel_v_zeros():
    result = filters.sobel_v(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_sobel_v_mask():
    rng = np.random.default_rng(2)
    result = filters.sobel_v(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_sobel_v_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.sobel_v(image))
    assert_allclose(result[j == 0], 1)
    assert_allclose(result[np.abs(j) > 1], 0, atol=1e-10)


def test_sobel_v_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.sobel_v(image))
    assert_allclose(result, 0, atol=1e-10)


def test_scharr_zeros():
    result = filters.scharr(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert jnp.all(result < 1e-16)


def test_scharr_mask():
    rng = np.random.default_rng(3)
    result = filters.scharr(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_scharr_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.scharr(image)) * np.sqrt(2)
    assert_allclose(result[i == 0], 1)
    assert np.all(np.abs(result[np.abs(i) > 1]) < 1e-10)


def test_scharr_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.scharr(image)) * np.sqrt(2)
    assert_allclose(result[j == 0], 1)
    assert np.all(np.abs(result[np.abs(j) > 1]) < 1e-10)


def test_scharr_h_zeros():
    result = filters.scharr_h(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_scharr_h_mask():
    rng = np.random.default_rng(4)
    result = filters.scharr_h(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_scharr_h_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.scharr_h(image))
    assert_allclose(result[i == 0], 1)
    assert np.all(np.abs(result[np.abs(i) > 1]) < 1e-10)


def test_scharr_h_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.scharr_h(image))
    assert_allclose(result, 0, atol=1e-10)


def test_scharr_v_zeros():
    result = filters.scharr_v(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_scharr_v_mask():
    rng = np.random.default_rng(5)
    result = filters.scharr_v(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_scharr_v_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.scharr_v(image))
    assert_allclose(result[j == 0], 1)
    assert np.all(np.abs(result[np.abs(j) > 1]) < 1e-10)


def test_scharr_v_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.scharr_v(image))
    assert_allclose(result, 0, atol=1e-10)


def test_prewitt_zeros():
    result = filters.prewitt(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_prewitt_mask():
    rng = np.random.default_rng(6)
    result = filters.prewitt(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(jnp.abs(result), jnp.zeros((10, 10)))


def test_prewitt_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.prewitt(image)) * np.sqrt(2)
    assert_allclose(result[i == 0], 1)
    assert_allclose(result[np.abs(i) > 1], 0, atol=1e-10)


def test_prewitt_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.prewitt(image)) * np.sqrt(2)
    assert_allclose(result[j == 0], 1)
    assert_allclose(result[np.abs(j) > 1], 0, atol=1e-10)


def test_prewitt_h_zeros():
    result = filters.prewitt_h(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_prewitt_h_mask():
    rng = np.random.default_rng(7)
    result = filters.prewitt_h(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_prewitt_h_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.prewitt_h(image))
    assert_allclose(result[i == 0], 1)
    assert_allclose(result[np.abs(i) > 1], 0, atol=1e-10)


def test_prewitt_h_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.prewitt_h(image))
    assert_allclose(result, 0, atol=1e-10)


def test_prewitt_v_zeros():
    result = filters.prewitt_v(jnp.zeros((10, 10)), jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, jnp.zeros((10, 10)))


def test_prewitt_v_mask():
    rng = np.random.default_rng(8)
    result = filters.prewitt_v(
        jnp.asarray(rng.uniform(size=(10, 10))), jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_prewitt_v_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.prewitt_v(image))
    assert_allclose(result[j == 0], 1)
    assert_allclose(result[np.abs(j) > 1], 0, atol=1e-10)


def test_prewitt_v_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.prewitt_v(image))
    assert_allclose(result, 0, atol=1e-10)


def test_laplace_zeros():
    """Laplace on a square image."""
    image = np.zeros((9, 9))
    image[3:-3, 3:-3] = 1
    result = filters.laplace(jnp.asarray(image))
    check_result = np.array(
        [
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, -1.0, -1.0, -1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 2.0, 1.0, 2.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 1.0, 0.0, 1.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0, 2.0, 1.0, 2.0, -1.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, -1.0, -1.0, -1.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        ]
    )
    assert_allclose(result, check_result)


def test_laplace_mask():
    """Laplace on a masked array should be zero."""
    image = np.zeros((9, 9))
    image[3:-3, 3:-3] = 1
    result = filters.laplace(
        jnp.asarray(image), ksize=3, mask=jnp.zeros((9, 9), dtype=bool)
    )
    assert jnp.all(result == 0)


def test_farid_zeros():
    result = filters.farid(jnp.zeros((10, 10)), mask=jnp.ones((10, 10), dtype=bool))
    assert jnp.all(result == 0)


def test_farid_mask():
    rng = np.random.default_rng(9)
    result = filters.farid(
        jnp.asarray(rng.uniform(size=(10, 10))), mask=jnp.zeros((10, 10), dtype=bool)
    )
    assert jnp.all(result == 0)


def test_farid_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.farid(image)) * np.sqrt(2)
    assert np.allclose(result[i == 0], result[i == 0][0])
    assert_allclose(result[np.abs(i) > 2], 0, atol=1e-10)


def test_farid_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.farid(image)) * np.sqrt(2)
    assert np.allclose(result[j == 0], result[j == 0][0])
    assert_allclose(result[np.abs(j) > 2], 0, atol=1e-10)


def test_farid_h_zeros():
    result = filters.farid_h(jnp.zeros((10, 10)), mask=jnp.ones((10, 10), dtype=bool))
    assert jnp.all(result == 0)


def test_farid_h_mask():
    rng = np.random.default_rng(10)
    result = filters.farid_h(
        jnp.asarray(rng.uniform(size=(10, 10))), mask=jnp.zeros((10, 10), dtype=bool)
    )
    assert jnp.all(result == 0)


def test_farid_h_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.farid_h(image))
    assert np.allclose(result[i == 0], result[i == 0][0])
    assert_allclose(result[np.abs(i) > 2], 0, atol=1e-10)


def test_farid_h_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float) * np.sqrt(2))
    result = np.asarray(filters.farid_h(image))
    assert_allclose(result, 0, atol=1e-10)


def test_farid_v_zeros():
    result = filters.farid_v(jnp.zeros((10, 10)), mask=jnp.ones((10, 10), dtype=bool))
    assert_allclose(result, 0, atol=1e-10)


def test_farid_v_mask():
    rng = np.random.default_rng(11)
    result = filters.farid_v(
        jnp.asarray(rng.uniform(size=(10, 10))), mask=jnp.zeros((10, 10), dtype=bool)
    )
    assert_allclose(result, jnp.zeros((10, 10)))


def test_farid_v_vertical():
    i, j = _hv_grids()
    image = jnp.asarray((j >= 0).astype(float))
    result = np.asarray(filters.farid_v(image))
    assert np.allclose(result[j == 0], result[j == 0][0])
    assert_allclose(result[np.abs(j) > 2], 0, atol=1e-10)


def test_farid_v_horizontal():
    i, j = _hv_grids()
    image = jnp.asarray((i >= 0).astype(float))
    result = np.asarray(filters.farid_v(image))
    assert_allclose(result, 0, atol=1e-10)


@pytest.mark.parametrize(
    "grad_func", (filters.prewitt_h, filters.sobel_h, filters.scharr_h)
)
def test_horizontal_mask_line(grad_func):
    """Horizontal edge filters mask pixels surrounding input mask."""
    vgrad, _ = np.mgrid[:1:11j, :1:11j]  # vertical gradient with spacing 0.1
    vgrad[5, :] = 1  # bad horizontal line

    mask = np.ones_like(vgrad)
    mask[5, :] = 0  # mask bad line

    expected = np.zeros_like(vgrad)
    expected[1:-1, 1:-1] = 0.2  # constant gradient for most of image,
    expected[4:7, 1:-1] = 0  # but line and neighbors masked

    result = grad_func(jnp.asarray(vgrad), jnp.asarray(mask))
    assert_allclose(result, expected, atol=1e-10)


@pytest.mark.parametrize(
    "grad_func", (filters.prewitt_v, filters.sobel_v, filters.scharr_v)
)
def test_vertical_mask_line(grad_func):
    """Vertical edge filters mask pixels surrounding input mask."""
    _, hgrad = np.mgrid[:1:11j, :1:11j]  # horizontal gradient with spacing 0.1
    hgrad[:, 5] = 1  # bad vertical line

    mask = np.ones_like(hgrad)
    mask[:, 5] = 0  # mask bad line

    expected = np.zeros_like(hgrad)
    expected[1:-1, 1:-1] = 0.2  # constant gradient for most of image,
    expected[1:-1, 4:7] = 0  # but line and neighbors masked

    result = grad_func(jnp.asarray(hgrad), jnp.asarray(mask))
    assert_allclose(result, expected, atol=1e-10)


# The below three constant 3x3x3 cubes were empirically found to maximise the
# output of each of their respective filters (see the reference suite). We
# embed each into a random binary volume: the filter's max over any binary
# image is achieved at exactly that pattern, so max(edges) must equal the
# filter response at the cube's center.

# fmt: off
MAX_SOBEL_0 = np.asarray([
    [[0, 0, 0],
     [0, 0, 0],
     [0, 0, 0]],
    [[0, 0, 0],
     [0, 0, 0],
     [0, 0, 0]],
    [[1, 1, 1],
     [1, 1, 1],
     [1, 1, 1]],
]).astype(float)

MAX_SOBEL_ND = np.asarray([
    [[1, 0, 0],
     [1, 0, 0],
     [1, 0, 0]],

    [[1, 0, 0],
     [1, 1, 0],
     [1, 1, 0]],

    [[1, 1, 0],
     [1, 1, 0],
     [1, 1, 0]]
]).astype(float)

MAX_SCHARR_ND = np.asarray([
    [[0, 0, 0],
     [0, 0, 1],
     [0, 1, 1]],
    [[0, 0, 1],
     [0, 1, 1],
     [0, 1, 1]],
    [[0, 0, 1],
     [0, 1, 1],
     [1, 1, 1]]
]).astype(float)
# fmt: on


def _blobs_with(pattern):
    """Random binary volume with ``pattern`` embedded (isolated by a zero moat)."""
    rng = np.random.default_rng(42)
    vol = (rng.uniform(size=(64, 64, 64)) < 0.3).astype(float)
    vol[28:41, 28:41, 28:41] = 0.0
    vol[33:36, 33:36, 33:36] = pattern
    return jnp.asarray(vol)


@pytest.mark.parametrize(
    ("func", "max_edge"),
    [
        (filters.prewitt, MAX_SOBEL_ND),
        (filters.sobel, MAX_SOBEL_ND),
        (filters.scharr, MAX_SCHARR_ND),
    ],
)
def test_3d_edge_filters(func, max_edge):
    blobs = _blobs_with(max_edge)
    edges = func(blobs)
    assert_allclose(
        jnp.max(edges), func(jnp.asarray(max_edge))[1, 1, 1], rtol=1e-6
    )


@pytest.mark.parametrize(
    "func", (filters.prewitt, filters.sobel, filters.scharr)
)
def test_3d_edge_filters_single_axis(func):
    blobs = _blobs_with(MAX_SOBEL_0)
    edges0 = func(blobs, axis=0)
    assert_allclose(
        jnp.max(edges0), func(jnp.asarray(MAX_SOBEL_0), axis=0)[1, 1, 1],
        rtol=1e-6,
    )


@pytest.mark.parametrize(
    "detector",
    [
        filters.sobel,
        filters.scharr,
        filters.prewitt,
        filters.roberts,
        filters.farid,
    ],
)
def test_range(detector):
    """Output of edge detection should be in [0, 1]"""
    rng = np.random.default_rng(12)
    image = jnp.asarray(rng.random((100, 100)))
    out = np.asarray(detector(image))
    assert out.min() >= 0, (
        f"Minimum of `{detector.__name__}` is smaller than 0."
    )
    assert out.max() <= 1, (
        f"Maximum of `{detector.__name__}` is larger than 1."
    )
