"""Upstream SciPy ndimage mega-suite, morphology half — TPU-native port.

Ports the binary/grey morphology case inventory of the reference's big
suite (/root/reference/cupyimg/scipy/ndimage/tests/test_ndimage.py:1396-3765,
the adapted SciPy Verveer suite) to the cupyimg_tpu surface: one test per
upstream case, same structure/origin/border_value/iterations/mask argument
space.  Where upstream hard-codes an expected matrix we instead call CPU
scipy.ndimage on identical inputs at test time (binary ops are exact, so
equality is the assertion either way); small early cases keep their
literal expectations.  Masks are reproducible rng arrays rather than the
upstream literals — the oracle makes any mask equally probative.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndimage

TYPES = [
    np.int8, np.uint8, np.int16, np.uint16,
    np.int32, np.uint32, np.int64, np.uint64,
    np.float32, np.float64,
]

DATA8 = np.asarray(
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 1, 1],
        [0, 0, 1, 1, 1, 1, 1, 1],
        [0, 0, 1, 1, 1, 1, 0, 0],
        [0, 1, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 0, 0, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ]
)

CROSS = np.asarray([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
DIAMOND_HOLLOW = np.asarray([[0, 1, 0], [1, 0, 1], [0, 1, 0]])


def mask8(seed=3):
    return np.random.RandomState(seed).rand(8, 8) > 0.4


def assert_eq(actual, desired):
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(desired))


def chk(fname, data, *args, **kwargs):
    """Run ours and scipy's morphology fn on identical inputs; exact match."""
    got = getattr(ndimage, fname)(jnp.asarray(data), *args, **kwargs)
    exp = getattr(sndi, fname)(np.asarray(data), *args, **kwargs)
    assert_eq(got, exp)
    return got


# ---------------------------------------------------------------------------
# structuring elements
# ---------------------------------------------------------------------------


def test_generate_structure01():
    assert_eq(ndimage.generate_binary_structure(0, 1), 1)


def test_generate_structure02():
    assert_eq(ndimage.generate_binary_structure(1, 1), [1, 1, 1])


def test_generate_structure03():
    assert_eq(
        ndimage.generate_binary_structure(2, 1),
        [[0, 1, 0], [1, 1, 1], [0, 1, 0]],
    )


def test_generate_structure04():
    assert_eq(
        ndimage.generate_binary_structure(2, 2),
        [[1, 1, 1], [1, 1, 1], [1, 1, 1]],
    )


def test_iterate_structure01():
    struct = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    out = ndimage.iterate_structure(struct, 2)
    assert_eq(out, sndi.iterate_structure(struct, 2))


def test_iterate_structure02():
    struct = [[0, 1], [1, 1]]
    out = ndimage.iterate_structure(struct, 3)
    assert_eq(out, sndi.iterate_structure(struct, 3))


def test_iterate_structure03():
    struct = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    out, origin = ndimage.iterate_structure(struct, 2, origin=1)
    exp, exp_origin = sndi.iterate_structure(struct, 2, origin=1)
    assert_eq(out, exp)
    assert list(origin) == list(exp_origin)


# ---------------------------------------------------------------------------
# binary_erosion 01-21: small literal cases across all dtypes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion01(type_):
    out = ndimage.binary_erosion(jnp.ones([], type_))
    assert_eq(out, 1)


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion02(type_):
    out = ndimage.binary_erosion(jnp.ones([], type_), border_value=1)
    assert_eq(out, 1)


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion03(type_):
    out = ndimage.binary_erosion(jnp.ones([1], type_))
    assert_eq(out, [0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion04(type_):
    out = ndimage.binary_erosion(jnp.ones([1], type_), border_value=1)
    assert_eq(out, [1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion05(type_):
    out = ndimage.binary_erosion(jnp.ones([3], type_))
    assert_eq(out, [0, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion06(type_):
    out = ndimage.binary_erosion(jnp.ones([3], type_), border_value=1)
    assert_eq(out, [1, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion07(type_):
    out = ndimage.binary_erosion(jnp.ones([5], type_))
    assert_eq(out, [0, 1, 1, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion08(type_):
    out = ndimage.binary_erosion(jnp.ones([5], type_), border_value=1)
    assert_eq(out, [1, 1, 1, 1, 1])


def _ones5_gap(type_):
    data = np.ones([5], type_)
    data[2] = 0
    return jnp.asarray(data)


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion09(type_):
    out = ndimage.binary_erosion(_ones5_gap(type_))
    assert_eq(out, [0, 0, 0, 0, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion10(type_):
    out = ndimage.binary_erosion(_ones5_gap(type_), border_value=1)
    assert_eq(out, [1, 0, 0, 0, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion11(type_):
    struct = [1, 0, 1]
    out = ndimage.binary_erosion(_ones5_gap(type_), struct, border_value=1)
    assert_eq(out, [1, 0, 1, 0, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion12(type_):
    struct = [1, 0, 1]
    out = ndimage.binary_erosion(
        _ones5_gap(type_), struct, border_value=1, origin=-1
    )
    assert_eq(out, [0, 1, 0, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion13(type_):
    struct = [1, 0, 1]
    out = ndimage.binary_erosion(
        _ones5_gap(type_), struct, border_value=1, origin=1
    )
    assert_eq(out, [1, 1, 0, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion14(type_):
    struct = [1, 1]
    out = ndimage.binary_erosion(_ones5_gap(type_), struct, border_value=1)
    assert_eq(out, [1, 1, 0, 0, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion15(type_):
    struct = [1, 1]
    out = ndimage.binary_erosion(
        _ones5_gap(type_), struct, border_value=1, origin=-1
    )
    assert_eq(out, [1, 0, 0, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion16(type_):
    out = ndimage.binary_erosion(jnp.ones([1, 1], type_), border_value=1)
    assert_eq(out, [[1]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion17(type_):
    out = ndimage.binary_erosion(jnp.ones([1, 1], type_))
    assert_eq(out, [[0]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion18(type_):
    out = ndimage.binary_erosion(jnp.ones([1, 3], type_))
    assert_eq(out, [[0, 0, 0]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion19(type_):
    out = ndimage.binary_erosion(jnp.ones([1, 3], type_), border_value=1)
    assert_eq(out, [[1, 1, 1]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion20(type_):
    out = ndimage.binary_erosion(jnp.ones([3, 3], type_))
    assert_eq(out, [[0, 0, 0], [0, 1, 0], [0, 0, 0]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion21(type_):
    out = ndimage.binary_erosion(jnp.ones([3, 3], type_), border_value=1)
    assert_eq(out, np.ones((3, 3)))


# ---------------------------------------------------------------------------
# binary_erosion 22-40: DATA8 vs scipy oracle across the argument space
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("type_", TYPES)
def test_binary_erosion22(type_):
    chk("binary_erosion", DATA8.astype(type_), border_value=1)


def test_binary_erosion23():
    struct = np.asarray(sndi.generate_binary_structure(2, 2))
    chk("binary_erosion", DATA8, struct, border_value=1)


def test_binary_erosion24():
    struct = np.asarray([[0, 1], [1, 1]])
    chk("binary_erosion", DATA8, struct, border_value=1)


def test_binary_erosion25():
    chk("binary_erosion", DATA8, DIAMOND_HOLLOW, border_value=1)


def test_binary_erosion26():
    chk("binary_erosion", DATA8, DIAMOND_HOLLOW, border_value=1,
        origin=(-1, -1))


def test_binary_erosion27():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=2)


def test_binary_erosion28():
    # output=dtype form of 27 (preallocated outputs are not a thing here)
    got = ndimage.binary_erosion(
        jnp.asarray(DATA8), CROSS, border_value=1, iterations=2,
        output=bool,
    )
    exp = sndi.binary_erosion(DATA8, CROSS, border_value=1, iterations=2)
    assert_eq(got, exp)


def test_binary_erosion29():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=3)


def test_binary_erosion31():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=1,
        origin=(-1, -1))


def test_binary_erosion32():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=2)


def test_binary_erosion33():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=-1,
        mask=mask8(1))


def test_binary_erosion34():
    chk("binary_erosion", DATA8, CROSS, border_value=1, mask=mask8(2))


def test_binary_erosion35():
    chk("binary_erosion", DATA8, CROSS, border_value=1, iterations=1,
        origin=(-1, -1), mask=mask8(4))


def test_binary_erosion36():
    chk("binary_erosion", DATA8, DIAMOND_HOLLOW, mask=mask8(5),
        border_value=1, origin=(-1, -1))


def test_binary_erosion37():
    # erosion by the object's own structure: fixpoint after 1 and 2 its
    a = np.asarray([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
    chk("binary_erosion", a, structure=a.copy(), iterations=1,
        border_value=True, brute_force=True)
    chk("binary_erosion", a, structure=a.copy(), iterations=2,
        border_value=True, brute_force=True)


def test_binary_erosion38():
    with pytest.raises((TypeError, ValueError)):
        ndimage.binary_erosion(jnp.asarray(DATA8), iterations=1.5)


@pytest.mark.parametrize("iterations", [2, 3])
def test_binary_erosion39(iterations):
    chk("binary_erosion", DATA8, CROSS, border_value=1,
        iterations=iterations)


@pytest.mark.parametrize("iterations", [2, 3])
def test_binary_erosion40(iterations):
    chk("binary_erosion", DATA8, CROSS, border_value=1,
        iterations=iterations, mask=mask8(6))


# ---------------------------------------------------------------------------
# binary_dilation 01-35
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation01(type_):
    out = ndimage.binary_dilation(jnp.ones([], type_))
    assert_eq(out, 1)


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation02(type_):
    out = ndimage.binary_dilation(jnp.zeros([], type_))
    assert_eq(out, 0)


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation03(type_):
    out = ndimage.binary_dilation(jnp.ones([1], type_))
    assert_eq(out, [1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation04(type_):
    out = ndimage.binary_dilation(jnp.zeros([1], type_))
    assert_eq(out, [0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation05(type_):
    out = ndimage.binary_dilation(jnp.ones([3], type_))
    assert_eq(out, [1, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation06(type_):
    out = ndimage.binary_dilation(jnp.zeros([3], type_))
    assert_eq(out, [0, 0, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation07(type_):
    data = np.zeros([3], type_)
    data[1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data))
    assert_eq(out, [1, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation08(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    data[3] = 1
    out = ndimage.binary_dilation(jnp.asarray(data))
    assert_eq(out, [1, 1, 1, 1, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation09(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data))
    assert_eq(out, [1, 1, 1, 0, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation10(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data), origin=-1)
    assert_eq(out, [0, 1, 1, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation11(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data), origin=1)
    assert_eq(out, [1, 1, 0, 0, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation12(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    struct = [1, 0, 1]
    out = ndimage.binary_dilation(jnp.asarray(data), struct)
    assert_eq(out, [1, 0, 1, 0, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation13(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    struct = [1, 0, 1]
    out = ndimage.binary_dilation(jnp.asarray(data), struct, border_value=1)
    assert_eq(out, [1, 0, 1, 0, 1])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation14(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    struct = [1, 0, 1]
    out = ndimage.binary_dilation(jnp.asarray(data), struct, origin=-1)
    assert_eq(out, [0, 1, 0, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation15(type_):
    data = np.zeros([5], type_)
    data[1] = 1
    struct = [1, 0, 1]
    out = ndimage.binary_dilation(
        jnp.asarray(data), struct, origin=-1, border_value=1
    )
    assert_eq(out, [1, 1, 0, 1, 0])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation16(type_):
    out = ndimage.binary_dilation(jnp.ones([1, 1], type_))
    assert_eq(out, [[1]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation17(type_):
    out = ndimage.binary_dilation(jnp.zeros([1, 1], type_))
    assert_eq(out, [[0]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation18(type_):
    out = ndimage.binary_dilation(jnp.ones([1, 3], type_))
    assert_eq(out, [[1, 1, 1]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation19(type_):
    out = ndimage.binary_dilation(jnp.ones([3, 3], type_))
    assert_eq(out, np.ones((3, 3)))


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation20(type_):
    data = np.zeros([3, 3], type_)
    data[1, 1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data))
    assert_eq(out, [[0, 1, 0], [1, 1, 1], [0, 1, 0]])


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation21(type_):
    struct = np.asarray(sndi.generate_binary_structure(2, 2))
    data = np.zeros([3, 3], type_)
    data[1, 1] = 1
    out = ndimage.binary_dilation(jnp.asarray(data), struct)
    assert_eq(out, np.ones((3, 3)))


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation22(type_):
    chk("binary_dilation", DATA8.astype(type_))


@pytest.mark.parametrize("type_", TYPES)
def test_binary_dilation23(type_):
    chk("binary_dilation", DATA8.astype(type_), border_value=1)


def test_binary_dilation24():
    chk("binary_dilation", DATA8, origin=(1, 1))


def test_binary_dilation25():
    chk("binary_dilation", DATA8, origin=(1, 1), border_value=1)


def test_binary_dilation26():
    struct = np.asarray(sndi.generate_binary_structure(2, 2))
    chk("binary_dilation", DATA8, struct)


def test_binary_dilation27():
    struct = np.asarray([[0, 1], [1, 1]])
    chk("binary_dilation", DATA8, struct)


def test_binary_dilation28():
    chk("binary_dilation", DATA8, border_value=1)


def test_binary_dilation29():
    chk("binary_dilation", DATA8, CROSS, iterations=2)


def test_binary_dilation30():
    # output=dtype form of 29
    got = ndimage.binary_dilation(
        jnp.asarray(DATA8), CROSS, iterations=2, output=bool
    )
    assert_eq(got, sndi.binary_dilation(DATA8, CROSS, iterations=2))


def test_binary_dilation31():
    chk("binary_dilation", DATA8, CROSS, iterations=3)


def test_binary_dilation32():
    got = ndimage.binary_dilation(
        jnp.asarray(DATA8), CROSS, iterations=3, output=bool
    )
    assert_eq(got, sndi.binary_dilation(DATA8, CROSS, iterations=3))


def test_binary_dilation33():
    chk("binary_dilation", DATA8, CROSS, iterations=-1, mask=mask8(7),
        border_value=0)


def test_binary_dilation34():
    mask = mask8(8)
    data = np.zeros_like(DATA8)
    chk("binary_dilation", data, CROSS, iterations=-1, mask=mask,
        border_value=1)


def test_binary_dilation35():
    chk("binary_dilation", DATA8, CROSS, iterations=1, mask=mask8(9),
        origin=(1, 1), border_value=0)


# ---------------------------------------------------------------------------
# propagation / opening / closing / fill_holes
# ---------------------------------------------------------------------------


def test_binary_propagation01():
    chk("binary_propagation", DATA8, CROSS, mask=mask8(10), border_value=0)


def test_binary_propagation02():
    data = np.zeros_like(DATA8)
    chk("binary_propagation", data, CROSS, mask=mask8(11), border_value=1)


def test_binary_opening01():
    chk("binary_opening", DATA8)


def test_binary_opening02():
    struct = np.asarray(sndi.generate_binary_structure(2, 2))
    chk("binary_opening", DATA8, struct)


def test_binary_closing01():
    chk("binary_closing", DATA8)


def test_binary_closing02():
    struct = np.asarray(sndi.generate_binary_structure(2, 2))
    chk("binary_closing", DATA8, struct)


def test_opening_new_arguments():
    chk("binary_opening", DATA8, CROSS, iterations=2, origin=(0, 0),
        mask=mask8(12), border_value=0, brute_force=True)


def test_closing_new_arguments():
    chk("binary_closing", DATA8, CROSS, iterations=2, origin=(0, 0),
        mask=mask8(13), border_value=0, brute_force=True)


def _holes_data():
    data = np.zeros((9, 9), bool)
    data[2:7, 2:7] = True
    data[4, 4] = False
    return data


def test_binary_fill_holes01():
    chk("binary_fill_holes", _holes_data())


def test_binary_fill_holes02():
    data = _holes_data()
    data[3:5, 3:5] = False
    chk("binary_fill_holes", data)


def test_binary_fill_holes03():
    data = np.zeros((9, 9), bool)
    data[1:4, 1:4] = True
    data[2, 2] = False
    data[5:8, 5:8] = True
    data[6, 6] = False
    chk("binary_fill_holes", data)


# ---------------------------------------------------------------------------
# grey morphology
# ---------------------------------------------------------------------------


GREY_ARRAY = np.asarray([[3, 2, 5, 1, 4], [7, 6, 9, 3, 5], [5, 8, 3, 7, 1]])


def test_grey_erosion01():
    chk("grey_erosion", GREY_ARRAY, size=(2, 3))


def test_grey_erosion02():
    footprint = [[1, 0, 1], [1, 1, 0]]
    chk("grey_erosion", GREY_ARRAY, footprint=footprint)


def test_grey_erosion03():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[1, 1, 1], [1, 1, 1]]
    chk("grey_erosion", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_grey_dilation01():
    chk("grey_dilation", GREY_ARRAY, size=(2, 3))


def test_grey_dilation02():
    footprint = [[0, 1, 1], [1, 0, 1]]
    chk("grey_dilation", GREY_ARRAY, footprint=footprint)


def test_grey_dilation03():
    footprint = [[0, 1, 1], [1, 0, 1]]
    structure = [[1, 1, 1], [1, 1, 1]]
    chk("grey_dilation", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_grey_opening01():
    chk("grey_opening", GREY_ARRAY, size=(2, 3))


def test_grey_opening02():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("grey_opening", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_grey_closing01():
    chk("grey_closing", GREY_ARRAY, size=(2, 3))


def test_grey_closing02():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("grey_closing", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_morphological_gradient01():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("morphological_gradient", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_morphological_gradient02():
    chk("morphological_gradient", GREY_ARRAY, size=(2, 3))


def test_morphological_laplace01():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("morphological_laplace", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_morphological_laplace02():
    chk("morphological_laplace", GREY_ARRAY, size=(2, 3))


def test_white_tophat01():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("white_tophat", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_white_tophat02():
    chk("white_tophat", GREY_ARRAY, size=(2, 3))


def test_white_tophat03():
    # boolean input (scipy >= 1.1 semantics)
    data = DATA8.astype(bool)
    footprint = np.ones((3, 3), bool)
    chk("white_tophat", data, footprint=footprint)


def test_black_tophat01():
    footprint = [[1, 0, 1], [1, 1, 0]]
    structure = [[0, 0, 0], [0, 0, 0]]
    chk("black_tophat", GREY_ARRAY, footprint=footprint,
        structure=structure)


def test_black_tophat02():
    chk("black_tophat", GREY_ARRAY, size=(2, 3))


def test_black_tophat03():
    data = DATA8.astype(bool)
    footprint = np.ones((3, 3), bool)
    chk("black_tophat", data, footprint=footprint)


# ---------------------------------------------------------------------------
# hit-or-miss
# ---------------------------------------------------------------------------


def test_hit_or_miss01():
    struct = CROSS
    data = np.asarray(
        [
            [0, 1, 0, 0, 0],
            [1, 1, 1, 0, 0],
            [0, 1, 0, 1, 1],
            [0, 0, 1, 1, 1],
            [0, 1, 1, 1, 0],
            [0, 1, 1, 1, 1],
            [0, 1, 1, 1, 1],
            [0, 0, 0, 0, 0],
        ]
    )
    chk("binary_hit_or_miss", data, struct)


def test_hit_or_miss02():
    struct = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    data = np.asarray(
        [
            [0, 1, 0, 0, 1, 1, 1, 0],
            [1, 1, 1, 0, 0, 1, 0, 0],
            [0, 1, 0, 1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
        ]
    )
    chk("binary_hit_or_miss", data, struct)


def test_hit_or_miss03():
    struct1 = [[0, 0, 0], [1, 1, 1], [0, 0, 0]]
    struct2 = [[1, 1, 1], [0, 0, 0], [1, 1, 1]]
    data = np.asarray(
        [
            [0, 1, 0, 0, 1, 1, 1, 0],
            [1, 1, 1, 0, 0, 0, 0, 0],
            [0, 1, 0, 1, 1, 1, 1, 0],
            [0, 0, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 0, 1, 1, 0],
            [0, 0, 0, 0, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
        ]
    )
    chk("binary_hit_or_miss", data, struct1, struct2)


# ---------------------------------------------------------------------------
# grey-dilation structure/size conventions (scipy 1.x argument forms)
# ---------------------------------------------------------------------------


def test_dilation_square_structure():
    # full-ones structure behaves as size=
    chk("grey_dilation", GREY_ARRAY, structure=np.zeros((3, 3)))


def test_dilation_scalar_size():
    chk("grey_dilation", GREY_ARRAY, size=3)
