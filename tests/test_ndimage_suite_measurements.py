"""Upstream SciPy ndimage measurements suite — TPU-native port.

Ports the case inventory of the reference's measurements tests
(/root/reference/cupyimg/scipy/ndimage/tests/test_measurements.py, the
adapted SciPy suite) to the cupyimg_tpu surface: label01-13 with literal
expectations (they pin the deterministic 1..N numbering the atomics-free
CCL must reproduce), everything else against CPU scipy.ndimage on
identical inputs at test time.
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


def assert_eq(actual, desired):
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(desired))


def assert_close(actual, desired, **kw):
    np.testing.assert_allclose(
        np.asarray(actual, dtype=np.float64),
        np.asarray(desired, dtype=np.float64),
        **kw,
    )


def chk(fname, input, *args, **kwargs):
    """Ours vs scipy on identical inputs."""
    got = getattr(ndimage, fname)(jnp.asarray(input), *args, **kwargs)
    exp = getattr(sndi, fname)(np.asarray(input), *args, **kwargs)
    if isinstance(exp, tuple):
        for g, e in zip(got, exp):
            assert_close(g, e, rtol=1e-12, atol=1e-12)
    else:
        assert_close(got, exp, rtol=1e-12, atol=1e-12)
    return got


# ---------------------------------------------------------------------------
# label
# ---------------------------------------------------------------------------


def test_label01():
    out, n = ndimage.label(jnp.ones([]))
    assert_eq(out, 1)
    assert int(n) == 1


def test_label02():
    out, n = ndimage.label(jnp.zeros([]))
    assert_eq(out, 0)
    assert int(n) == 0


def test_label03():
    out, n = ndimage.label(jnp.ones([1]))
    assert_eq(out, [1])
    assert int(n) == 1


def test_label04():
    out, n = ndimage.label(jnp.zeros([1]))
    assert_eq(out, [0])
    assert int(n) == 0


def test_label05():
    out, n = ndimage.label(jnp.ones([5]))
    assert_eq(out, [1, 1, 1, 1, 1])
    assert int(n) == 1


def test_label06():
    out, n = ndimage.label(jnp.asarray([1, 0, 1, 1, 0, 1]))
    assert_eq(out, [1, 0, 2, 2, 0, 3])
    assert int(n) == 3


def test_label07():
    data = np.zeros((6, 6), int)
    out, n = ndimage.label(jnp.asarray(data))
    assert_eq(out, data)
    assert int(n) == 0


LABEL_DATA = np.asarray(
    [
        [1, 0, 0, 0, 0, 0],
        [0, 0, 1, 1, 0, 0],
        [0, 0, 1, 1, 1, 0],
        [1, 1, 0, 0, 0, 0],
        [1, 1, 0, 0, 0, 0],
        [0, 0, 0, 1, 1, 0],
    ]
)


def test_label08():
    out, n = ndimage.label(jnp.asarray(LABEL_DATA))
    assert_eq(
        out,
        [
            [1, 0, 0, 0, 0, 0],
            [0, 0, 2, 2, 0, 0],
            [0, 0, 2, 2, 2, 0],
            [3, 3, 0, 0, 0, 0],
            [3, 3, 0, 0, 0, 0],
            [0, 0, 0, 4, 4, 0],
        ],
    )
    assert int(n) == 4


def test_label09():
    struct = ndimage.generate_binary_structure(2, 2)
    out, n = ndimage.label(jnp.asarray(LABEL_DATA), struct)
    assert_eq(
        out,
        [
            [1, 0, 0, 0, 0, 0],
            [0, 0, 2, 2, 0, 0],
            [0, 0, 2, 2, 2, 0],
            [2, 2, 0, 0, 0, 0],
            [2, 2, 0, 0, 0, 0],
            [0, 0, 0, 3, 3, 0],
        ],
    )
    assert int(n) == 3


def test_label10():
    data = np.asarray(
        [
            [0, 0, 0, 0, 0, 0],
            [0, 1, 1, 0, 1, 0],
            [0, 1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0, 0],
        ]
    )
    struct = ndimage.generate_binary_structure(2, 2)
    out, n = ndimage.label(jnp.asarray(data), struct)
    assert_eq(out, data)
    assert int(n) == 1


@pytest.mark.parametrize("type_", TYPES)
def test_label11(type_):
    data = LABEL_DATA.astype(type_)
    out, n = ndimage.label(jnp.asarray(data))
    exp, en = sndi.label(data)
    assert_eq(out, exp)
    assert int(n) == en


def test_label12():
    data = np.asarray(
        [
            [0, 0, 0, 0, 1, 1],
            [0, 0, 0, 0, 0, 1],
            [0, 0, 1, 0, 1, 1],
            [0, 0, 1, 1, 1, 1],
            [0, 0, 0, 1, 1, 0],
        ]
    )
    out, n = ndimage.label(jnp.asarray(data))
    exp, en = sndi.label(data)
    assert_eq(out, exp)
    assert int(n) == en == 1


def test_label13():
    data = np.asarray(
        [
            [1, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1],
            [1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1],
            [1, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ]
    )
    out, n = ndimage.label(jnp.asarray(data))
    exp, en = sndi.label(data)
    assert_eq(out, exp)
    assert int(n) == en == 1


def test_label_output_dtype():
    for t in [np.int8, np.intp, np.int32, np.int64]:
        out, n = ndimage.label(jnp.asarray(LABEL_DATA), output=t)
        assert np.asarray(out).dtype.type == np.dtype(t).type


def test_label_structuring_elements():
    # every 3x3 structuring element against scipy (the reference ships
    # golden files; scipy at test time is the same oracle)
    rng = np.random.RandomState(42)
    data = (rng.rand(14, 15) > 0.6).astype(int)
    for bits in range(256):
        struct = np.zeros((3, 3), bool)
        struct[1, 1] = True
        flat = [(bits >> k) & 1 for k in range(8)]
        idx = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1),
               (2, 2)]
        for (r, c), b in zip(idx, flat):
            struct[r, c] = bool(b)
        if not np.all(struct == struct[::-1, ::-1]):
            continue  # scipy requires symmetric structures for parity
        out, n = ndimage.label(jnp.asarray(data), struct)
        exp, en = sndi.label(data, struct)
        assert_eq(out, exp)
        assert int(n) == en


def test_label_default_dtype():
    out, n = ndimage.label(jnp.asarray(LABEL_DATA))
    assert np.asarray(out).dtype.kind == "i"


# ---------------------------------------------------------------------------
# find_objects
# ---------------------------------------------------------------------------


def _fo(input):
    got = ndimage.find_objects(jnp.asarray(input))
    exp = sndi.find_objects(np.asarray(input))
    assert got == exp


def test_find_objects01():
    _fo(np.ones([], int))


def test_find_objects02():
    _fo(np.zeros([], int))


def test_find_objects03():
    _fo(np.ones([1], int))


def test_find_objects04():
    _fo(np.zeros([1], int))


def test_find_objects05():
    _fo(np.ones([5], int))


def test_find_objects06():
    _fo(np.asarray([1, 0, 2, 2, 0, 3]))


def test_find_objects07():
    _fo(np.zeros((6, 6), int))


def test_find_objects08():
    _fo(
        np.asarray(
            [
                [1, 0, 0, 0, 0, 0],
                [0, 0, 2, 2, 0, 0],
                [0, 0, 2, 2, 2, 0],
                [3, 3, 0, 0, 0, 0],
                [3, 3, 0, 0, 0, 0],
                [0, 0, 0, 4, 4, 0],
            ]
        )
    )


def test_find_objects09():
    # label 3 missing: scipy returns None for it
    _fo(
        np.asarray(
            [
                [1, 0, 0, 0, 0, 0],
                [0, 0, 2, 2, 0, 0],
                [0, 0, 2, 2, 2, 0],
                [0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0],
                [0, 0, 0, 4, 4, 0],
            ]
        )
    )


# ---------------------------------------------------------------------------
# labeled reductions: sum / mean / minimum / maximum / median / variance /
# standard_deviation
# ---------------------------------------------------------------------------


def test_sum01():
    for type_ in TYPES:
        assert float(ndimage.sum(jnp.asarray([], type_))) == 0.0


def test_sum02():
    for type_ in TYPES:
        assert float(ndimage.sum(jnp.zeros([0, 4], type_))) == 0.0


def test_sum03():
    for type_ in TYPES:
        assert_close(ndimage.sum(jnp.ones([], type_)), 1.0)


def test_sum04():
    for type_ in TYPES:
        assert_close(ndimage.sum(jnp.asarray([1, 2], type_)), 3.0)


def test_sum05():
    for type_ in TYPES:
        assert_close(ndimage.sum(jnp.asarray([[1, 2], [3, 4]], type_)), 10.0)


def test_sum06():
    labels = np.asarray([], bool)
    for type_ in TYPES:
        assert float(ndimage.sum(jnp.asarray([], type_), labels=labels)) == 0


def test_sum07():
    labels = np.ones([0, 4], bool)
    for type_ in TYPES:
        assert float(
            ndimage.sum(jnp.zeros([0, 4], type_), labels=labels)
        ) == 0


def test_sum08():
    labels = np.asarray([1, 0], bool)
    for type_ in TYPES:
        assert_close(
            ndimage.sum(jnp.asarray([1, 2], type_), labels=labels), 1.0
        )


def test_sum09():
    labels = np.asarray([1, 0], bool)
    for type_ in TYPES:
        chk_in = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.sum(jnp.asarray(chk_in), labels=np.asarray([[1, 0],
                                                                  [1, 0]]))
        assert_close(got, 4.0)


def test_sum10():
    labels = np.asarray([1, 0], bool)
    input = np.asarray([[1, 2], [3, 4]], bool)
    got = ndimage.sum(jnp.asarray(input), labels=np.asarray([[1, 0], [1, 0]]))
    assert_close(got, sndi.sum(input, np.asarray([[1, 0], [1, 0]])))


def test_sum11():
    labels = np.asarray([1, 2], np.int8)
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.sum(
            jnp.asarray(input), labels=np.asarray([[1, 2], [1, 2]]), index=2
        )
        assert_close(got, 6.0)


def test_sum12():
    labels = np.asarray([[1, 2], [1, 2]], np.int8)
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.sum(jnp.asarray(input), labels=labels, index=[1, 2])
        assert_close(got, [4.0, 6.0])


def test_mean01():
    labels = np.asarray([[1, 2], [1, 2]], np.int8)
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.mean(jnp.asarray(input), labels=labels, index=[1, 2])
        assert_close(got, [2.0, 3.0])


def test_mean02():
    input = np.asarray([1, 3], bool)
    got = ndimage.mean(jnp.asarray(input))
    assert_close(got, sndi.mean(input))


def test_mean03():
    labels = np.asarray([1, 2])
    for type_ in TYPES:
        input = np.asarray([1, 3], type_)
        got = ndimage.mean(jnp.asarray(input), labels=labels, index=2)
        assert_close(got, 3.0)


def test_mean04():
    labels = np.asarray([[1, 2], [2, 4]], np.int8)
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.mean(
            jnp.asarray(input), labels=labels, index=[4, 8, 2]
        )
        exp = sndi.mean(input.astype(np.float64), labels=labels,
                        index=[4, 8, 2])
        got = np.asarray(got)
        assert_close(got[[0, 2]], exp[[0, 2]])
        assert np.isnan(exp[1]) == np.isnan(got[1])


def test_minimum01():
    labels = np.asarray([1, 1, 0, 1])
    for type_ in TYPES:
        input = np.asarray([1, 2, 3, 4], type_)
        assert_close(ndimage.minimum(jnp.asarray(input), labels=labels), 1.0)


def test_minimum02():
    labels = np.asarray([1, 0], bool)
    input = np.asarray([[2, 2], [2, 4]], bool)
    assert_close(
        ndimage.minimum(jnp.asarray(input), labels=np.asarray([[1, 0],
                                                               [1, 0]])),
        1.0,
    )


def test_minimum03():
    labels = np.asarray([1, 2])
    for type_ in TYPES:
        input = np.asarray([1, 2], type_)
        assert_close(
            ndimage.minimum(jnp.asarray(input), labels=labels, index=2), 2.0
        )


def test_minimum04():
    labels = np.asarray([[1, 2], [2, 3]])
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.minimum(jnp.asarray(input), labels=labels,
                              index=[2, 3, 8])
        exp = sndi.minimum(input.astype(np.float64), labels=labels,
                           index=[2, 3, 8])
        assert_close(np.asarray(got)[:2], exp[:2])


def test_maximum01():
    labels = np.asarray([1, 1, 0, 1])
    for type_ in TYPES:
        input = np.asarray([1, 2, 3, 4], type_)
        assert_close(ndimage.maximum(jnp.asarray(input), labels=labels), 4.0)


def test_maximum02():
    input = np.asarray([[2, 2], [2, 4]], bool)
    assert_close(
        ndimage.maximum(jnp.asarray(input), labels=np.asarray([[1, 0],
                                                               [1, 0]])),
        1.0,
    )


def test_maximum03():
    labels = np.asarray([1, 2])
    for type_ in TYPES:
        input = np.asarray([1, 2], type_)
        assert_close(
            ndimage.maximum(jnp.asarray(input), labels=labels, index=2), 2.0
        )


def test_maximum04():
    labels = np.asarray([[1, 2], [2, 3]])
    for type_ in TYPES:
        input = np.asarray([[1, 2], [3, 4]], type_)
        got = ndimage.maximum(jnp.asarray(input), labels=labels,
                              index=[2, 3, 8])
        exp = sndi.maximum(input.astype(np.float64), labels=labels,
                           index=[2, 3, 8])
        assert_close(np.asarray(got)[:2], exp[:2])


def test_maximum05():
    # all-negative values
    x = np.asarray([-3, -2, -1])
    assert_close(ndimage.maximum(jnp.asarray(x)), -1)


def test_median01():
    a = np.asarray([[1, 2, 0, 1], [5, 3, 0, 4], [0, 0, 0, 7], [9, 3, 0, 0]])
    labels = np.asarray(
        [[1, 1, 0, 2], [1, 1, 0, 2], [0, 0, 0, 2], [3, 3, 0, 0]]
    )
    got = ndimage.median(jnp.asarray(a), labels=labels, index=[1, 2, 3])
    exp = sndi.median(a, labels=labels, index=[1, 2, 3])
    assert_close(got, exp)


def test_median02():
    a = np.asarray([[1, 2, 0, 1], [5, 3, 0, 4], [0, 0, 0, 7], [9, 3, 0, 0]])
    assert_close(ndimage.median(jnp.asarray(a)), sndi.median(a))


def test_median03():
    a = np.asarray([[1, 2, 0, 1], [5, 3, 0, 4], [0, 0, 0, 7], [9, 3, 0, 0]])
    labels = np.asarray(
        [[1, 1, 0, 2], [1, 1, 0, 2], [0, 0, 0, 2], [3, 3, 0, 0]]
    )
    got = ndimage.median(jnp.asarray(a), labels=labels)
    assert_close(got, sndi.median(a, labels=labels))


def test_variance01():
    for type_ in TYPES:
        input = np.asarray([], type_)
        with np.errstate(all="ignore"):
            got = ndimage.variance(jnp.asarray(input))
        assert np.isnan(np.asarray(got))


def test_variance02():
    for type_ in TYPES:
        input = np.asarray([1], type_)
        assert_close(ndimage.variance(jnp.asarray(input)), 0.0)


def test_variance03():
    for type_ in TYPES:
        input = np.asarray([1, 3], type_)
        assert_close(ndimage.variance(jnp.asarray(input)), 1.0)


def test_variance04():
    input = np.asarray([1, 0], bool)
    assert_close(ndimage.variance(jnp.asarray(input)), 0.25)


def test_variance05():
    labels = np.asarray([2, 2, 3])
    for type_ in TYPES:
        input = np.asarray([1, 3, 8], type_)
        assert_close(
            ndimage.variance(jnp.asarray(input), labels=labels, index=2), 1.0
        )


def test_variance06():
    labels = np.asarray([2, 2, 3, 3, 4])
    with np.errstate(all="ignore"):
        for type_ in TYPES:
            input = np.asarray([1, 3, 8, 10, 8], type_)
            got = ndimage.variance(
                jnp.asarray(input), labels=labels, index=[2, 3, 4]
            )
            assert_close(got, [1.0, 1.0, 0.0])


def test_standard_deviation01():
    for type_ in TYPES:
        input = np.asarray([], type_)
        with np.errstate(all="ignore"):
            got = ndimage.standard_deviation(jnp.asarray(input))
        assert np.isnan(np.asarray(got))


def test_standard_deviation02():
    for type_ in TYPES:
        input = np.asarray([1], type_)
        assert_close(ndimage.standard_deviation(jnp.asarray(input)), 0.0)


def test_standard_deviation03():
    for type_ in TYPES:
        input = np.asarray([1, 3], type_)
        assert_close(
            ndimage.standard_deviation(jnp.asarray(input)), np.sqrt(1.0)
        )


def test_standard_deviation04():
    input = np.asarray([1, 0], bool)
    assert_close(ndimage.standard_deviation(jnp.asarray(input)), 0.5)


def test_standard_deviation05():
    labels = np.asarray([2, 2, 3])
    for type_ in TYPES:
        input = np.asarray([1, 3, 8], type_)
        assert_close(
            ndimage.standard_deviation(jnp.asarray(input), labels=labels,
                                       index=2),
            1.0,
        )


def test_standard_deviation06():
    labels = np.asarray([2, 2, 3, 3, 4])
    with np.errstate(all="ignore"):
        for type_ in TYPES:
            input = np.asarray([1, 3, 8, 10, 8], type_)
            got = ndimage.standard_deviation(
                jnp.asarray(input), labels=labels, index=[2, 3, 4]
            )
            assert_close(got, [1.0, 1.0, 0.0])


def test_standard_deviation07():
    labels = np.asarray([1])
    for type_ in TYPES:
        input = np.asarray([-0.00619519], type_)
        got = ndimage.standard_deviation(
            jnp.asarray(input), labels=labels, index=[1]
        )
        assert_close(got, [0.0], atol=1e-7)


# ---------------------------------------------------------------------------
# positions / extrema / center_of_mass / histogram
# ---------------------------------------------------------------------------


POS_ARRAY = np.asarray([[1, 2, 0, 1], [5, 3, 0, 4], [0, 0, 0, 7],
                        [9, 3, 0, 0]])
POS_LABELS = np.asarray([[1, 1, 0, 2], [1, 1, 0, 2], [0, 0, 0, 2],
                         [3, 3, 0, 0]])


def test_minimum_position01():
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.minimum_position(jnp.asarray(input))
        assert tuple(int(v) for v in got) == sndi.minimum_position(input)


def test_minimum_position02():
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.minimum_position(
            jnp.asarray(input), labels=POS_LABELS, index=2
        )
        exp = sndi.minimum_position(input, labels=POS_LABELS, index=2)
        assert tuple(int(v) for v in got) == exp


def test_minimum_position03():
    input = np.asarray(POS_ARRAY > 2, bool)
    got = ndimage.minimum_position(jnp.asarray(input))
    assert tuple(int(v) for v in got) == sndi.minimum_position(input)


def test_minimum_position04():
    input = np.asarray(POS_ARRAY > 0, bool)
    got = ndimage.minimum_position(jnp.asarray(input))
    assert tuple(int(v) for v in got) == sndi.minimum_position(input)


def test_minimum_position05():
    labels = np.asarray([1, 2, 0, 4])
    for type_ in TYPES:
        input = np.asarray([[5, 4, 2, 5], [3, 7, 0, 2], [1, 5, 1, 1],
                            [5, 7, 3, 1]], type_)
        got = ndimage.minimum_position(jnp.asarray(input), labels=labels)
        exp = sndi.minimum_position(input, labels=labels)
        assert tuple(int(v) for v in got) == exp


def test_minimum_position06():
    labels = np.asarray([1, 2, 3, 4])
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.minimum_position(
            jnp.asarray(input), labels=labels, index=2
        )
        exp = sndi.minimum_position(input, labels=labels, index=2)
        assert tuple(int(v) for v in got) == exp


def test_minimum_position07():
    labels = np.asarray([1, 2, 3, 4])
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.minimum_position(
            jnp.asarray(input), labels=labels, index=[2, 3]
        )
        exp = sndi.minimum_position(input, labels=labels, index=[2, 3])
        got = [tuple(int(v) for v in g) for g in got]
        assert got == exp


def test_maximum_position01():
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.maximum_position(jnp.asarray(input))
        assert tuple(int(v) for v in got) == sndi.maximum_position(input)


def test_maximum_position02():
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.maximum_position(
            jnp.asarray(input), labels=POS_LABELS, index=2
        )
        exp = sndi.maximum_position(input, labels=POS_LABELS, index=2)
        assert tuple(int(v) for v in got) == exp


def test_maximum_position03():
    input = np.asarray(POS_ARRAY > 2, bool)
    got = ndimage.maximum_position(jnp.asarray(input))
    assert tuple(int(v) for v in got) == sndi.maximum_position(input)


def test_maximum_position04():
    labels = np.asarray([1, 2, 0, 4])
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.maximum_position(jnp.asarray(input), labels=labels)
        exp = sndi.maximum_position(input, labels=labels)
        assert tuple(int(v) for v in got) == exp


def test_maximum_position05():
    labels = np.asarray([1, 2, 3, 4])
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.maximum_position(
            jnp.asarray(input), labels=labels, index=[1, 2]
        )
        exp = sndi.maximum_position(input, labels=labels, index=[1, 2])
        got = [tuple(int(v) for v in g) for g in got]
        assert got == exp


def test_extrema01():
    labels = POS_LABELS
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.extrema(jnp.asarray(input), labels=labels, index=2)
        exp = sndi.extrema(input, labels=labels, index=2)
        assert_close(got[0], exp[0])
        assert_close(got[1], exp[1])
        assert tuple(int(v) for v in got[2]) == exp[2]
        assert tuple(int(v) for v in got[3]) == exp[3]


def test_extrema02():
    labels = POS_LABELS
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.extrema(jnp.asarray(input), labels=labels,
                              index=[2, 3, 8])
        exp = sndi.extrema(input.astype(np.float64), labels=labels,
                           index=[2, 3, 8])
        assert_close(np.asarray(got[0])[:2], np.asarray(exp[0])[:2])
        assert_close(np.asarray(got[1])[:2], np.asarray(exp[1])[:2])


def test_extrema03():
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.extrema(jnp.asarray(input))
        exp = sndi.extrema(input)
        assert_close(got[0], exp[0])
        assert_close(got[1], exp[1])
        assert tuple(int(v) for v in got[2]) == exp[2]
        assert tuple(int(v) for v in got[3]) == exp[3]


def test_extrema04():
    labels = np.asarray([1, 2, 0, 4])
    for type_ in TYPES:
        input = POS_ARRAY.astype(type_)
        got = ndimage.extrema(jnp.asarray(input), labels=labels)
        exp = sndi.extrema(input, labels=labels)
        assert_close(got[0], exp[0])
        assert_close(got[1], exp[1])
        assert tuple(int(v) for v in got[2]) == exp[2]
        assert tuple(int(v) for v in got[3]) == exp[3]


def test_center_of_mass01():
    for type_ in TYPES:
        input = np.asarray([[1, 0], [0, 0]], type_)
        got = ndimage.center_of_mass(jnp.asarray(input))
        assert_close(list(got), list(sndi.center_of_mass(input)))


def test_center_of_mass02():
    input = np.asarray([[0, 0], [1, 0]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input))
    assert_close(list(got), [1.0, 0.0])


def test_center_of_mass03():
    input = np.asarray([[0, 1], [0, 0]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input))
    assert_close(list(got), [0.0, 1.0])


def test_center_of_mass04():
    input = np.asarray([[0, 0], [0, 1]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input))
    assert_close(list(got), [1.0, 1.0])


def test_center_of_mass05():
    input = np.ones((2, 2), np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input))
    assert_close(list(got), [0.5, 0.5])


def test_center_of_mass06():
    input = np.asarray([[1, 2], [3, 1]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input))
    assert_close(list(got), list(sndi.center_of_mass(input)))


def test_center_of_mass07():
    labels = np.asarray([1, 0])
    input = np.asarray([[1, 2], [3, 1]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input), labels=np.asarray(
        [[1, 0], [1, 0]]))
    exp = sndi.center_of_mass(input, labels=np.asarray([[1, 0], [1, 0]]))
    assert_close(list(got), list(exp))


def test_center_of_mass08():
    labels = np.asarray([[1, 2], [1, 2]])
    input = np.asarray([[5, 2], [3, 1]], np.float64)
    got = ndimage.center_of_mass(jnp.asarray(input), labels=labels, index=2)
    exp = sndi.center_of_mass(input, labels=labels, index=2)
    assert_close(list(got), list(exp))


def test_center_of_mass09():
    labels = np.asarray([[1, 2], [1, 2]])
    input = np.asarray([[5, 2], [3, 1]], np.float64)
    got = ndimage.center_of_mass(
        jnp.asarray(input), labels=labels, index=[1, 2]
    )
    exp = sndi.center_of_mass(input, labels=labels, index=[1, 2])
    got = [tuple(float(v) for v in g) for g in np.asarray(got)]
    assert_close(got, exp)


def test_histogram01():
    expected = np.ones(10)
    input = np.arange(10)
    got = ndimage.histogram(jnp.asarray(input), 0, 10, 10)
    assert_eq(got, expected)


def test_histogram02():
    labels = np.asarray([1, 1, 1, 1, 2, 2, 2, 2])
    input = np.asarray([1, 1, 3, 4, 3, 3, 3, 3])
    got = ndimage.histogram(jnp.asarray(input), 0, 4, 5, labels=labels,
                            index=1)
    exp = sndi.histogram(input, 0, 4, 5, labels=labels, index=1)
    assert_eq(got, exp)


def test_histogram03():
    labels = np.asarray([1, 0, 1, 1, 2, 2, 2, 2])
    input = np.asarray([1, 1, 3, 4, 3, 5, 3, 3])
    got = ndimage.histogram(jnp.asarray(input), 0, 4, 5, labels=labels,
                            index=[1, 2])
    exp = sndi.histogram(input, 0, 4, 5, labels=labels, index=[1, 2])
    for g, e in zip(got, exp):
        assert_eq(g, e)


def test_stat_funcs_2d():
    a = np.asarray([[5, 6, 0, 0, 0], [8, 9, 0, 0, 0], [0, 0, 0, 3, 5]])
    lbl = np.asarray([[1, 1, 0, 0, 0], [1, 1, 0, 0, 0], [0, 0, 0, 2, 2]])
    for fname in ("sum", "mean", "variance", "standard_deviation",
                  "median", "minimum", "maximum"):
        got = getattr(ndimage, fname)(jnp.asarray(a), lbl, index=[1, 2])
        exp = getattr(sndi, fname)(a, lbl, index=[1, 2])
        assert_close(got, exp)
