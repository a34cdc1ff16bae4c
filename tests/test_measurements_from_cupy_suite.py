"""Randomized dual-backend measurement products vs scipy.

Ported from the reference
/root/reference/cupyimg/scipy/ndimage/tests/test_measurements_from_cupy.py
(label products over ndim/connectivity/dtype/output, label special cases,
per-label stats dtype products, measurements-select products).  The dense
reference grid is sampled down to the repo's product-test density; every
case still runs on both backends (jnp vs numpy/scipy).
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.scipy.ndimage as tndi


def _generate_binary_structure(rank, connectivity):
    if connectivity < 1:
        connectivity = 1
    if rank < 1:
        return np.array(True, dtype=bool)
    output = np.fabs(np.indices([3] * rank) - 1)
    output = np.add.reduce(output, 0)
    return output <= connectivity


LABEL_CASES = [
    dict(ndim=ndim, size=size, density=density, connectivity=conn,
         x_dtype=dt, output=out)
    for ndim in [1, 2, 3, 4]
    for size, density in [(50, 0.2), (100, 0.4)]
    for conn in [None, 2, 3]
    for dt, out in [
        (bool, None),
        (np.int8, np.int32),
        (np.float32, np.int64),
        (np.float64, None),
    ]
]


@pytest.mark.parametrize("case", LABEL_CASES)
def test_label_product(case):
    size = int(pow(case["size"], 1 / case["ndim"]))
    x_shape = tuple(range(size, size + case["ndim"]))
    rng = np.random.RandomState(42)
    x = np.zeros(x_shape, dtype=case["x_dtype"])
    x[rng.rand(*x_shape) < case["density"]] = 1
    if case["connectivity"] is None:
        structure = None
    else:
        structure = _generate_binary_structure(
            case["ndim"], case["connectivity"]
        )
    expected, _ = sndi.label(x, structure=structure, output=case["output"])
    got, _ = tndi.label(x, structure=structure, output=case["output"])
    np.testing.assert_array_equal(np.asarray(got), expected)
    if case["output"] is not None:
        assert np.asarray(got).dtype == np.dtype(case["output"])


class TestLabelSpecialCases:
    def test_label_empty(self):
        x = np.empty(0)
        exp, _ = sndi.label(x)
        got, _ = tndi.label(x)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_label_0d_zero(self):
        x = np.zeros([])
        exp, _ = sndi.label(x)
        got, _ = tndi.label(x)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_label_0d_one(self):
        x = np.ones([])
        exp, _ = sndi.label(x)
        got, _ = tndi.label(x)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_label_swirl(self):
        x = np.array([
            [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
            [1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 1],
            [1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1],
            [1, 0, 1, 1, 1, 1, 1, 0, 1, 0, 1],
            [1, 0, 1, 0, 0, 0, 1, 0, 1, 0, 1],
            [1, 0, 1, 0, 1, 1, 1, 0, 1, 0, 1],
            [1, 0, 1, 0, 1, 0, 0, 0, 1, 0, 1],
            [1, 0, 1, 0, 1, 1, 1, 1, 1, 0, 1],
            [1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1],
            [1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1],
            [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        ])
        exp, _ = sndi.label(x)
        got, _ = tndi.label(x)
        np.testing.assert_array_equal(np.asarray(got), exp)


STATS_DTYPES = [
    bool, np.int8, np.int32, np.int64,
    np.uint8, np.uint32, np.float32, np.float64,
]


def _make_image(shape, dtype):
    if dtype == bool:
        rng = np.random.RandomState(0)
        return rng.rand(*shape) > 0.5 if shape else np.bool_(True)
    n = int(np.prod(shape)) if shape else 1
    return np.arange(1, n + 1).reshape(shape).astype(dtype)


@pytest.mark.parametrize("op", ["sum", "mean", "variance",
                                "standard_deviation"])
@pytest.mark.parametrize("dtype", STATS_DTYPES)
class TestStats:
    def _compare(self, op, args_np):
        exp = getattr(sndi, op)(*args_np)
        got = getattr(tndi, op)(*args_np)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=1e-6, atol=1e-6
        )

    def test_single_dim(self, op, dtype):
        image = _make_image((100,), dtype)
        rng = np.random.RandomState(1)
        labels = rng.randint(0, 4, 100).astype(np.int32)
        self._compare(op, (image, labels, np.array([1, 2, 3])))

    def test_multi_dim(self, op, dtype):
        image = _make_image((8, 8, 8), dtype)
        rng = np.random.RandomState(2)
        labels = rng.randint(0, 4, (8, 8, 8)).astype(np.int32)
        self._compare(op, (image, labels, np.array([1, 2, 3])))

    def test_only_input(self, op, dtype):
        self._compare(op, (_make_image((100,), dtype),))

    def test_no_index(self, op, dtype):
        image = _make_image((100,), dtype)
        rng = np.random.RandomState(3)
        labels = rng.randint(0, 4, 100).astype(np.int32)
        self._compare(op, (image, labels))

    def test_scalar_index(self, op, dtype):
        image = _make_image((100,), dtype)
        rng = np.random.RandomState(4)
        labels = rng.randint(0, 4, 100).astype(np.int32)
        self._compare(op, (image, labels, 1))

    def test_no_values(self, op, dtype):
        image = np.array([], dtype=dtype)
        exp = getattr(sndi, op)(image, np.array([]), np.array([]))
        got = getattr(tndi, op)(image, np.array([]), np.array([]))
        np.testing.assert_array_equal(
            np.asarray(got, dtype=float), np.asarray(exp, dtype=float)
        )


@pytest.mark.parametrize("op", ["sum", "mean", "variance",
                                "standard_deviation"])
class TestStatsErrors:
    def test_invalid_image_dtype(self, op):
        image = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64)
        labels = np.random.RandomState(0).randint(0, 4, 100).astype(np.int32)
        with pytest.raises(TypeError):
            getattr(tndi, op)(image, labels, np.array([1, 2, 3]))

    def test_invalid_labels_shape(self, op):
        image = np.arange(100, dtype=np.int32)
        labels = np.zeros(50, dtype=np.int32)
        with pytest.raises(ValueError):
            getattr(tndi, op)(image, labels, np.array([1, 2, 3]))


SELECT_CASES = [
    dict(op=op, labels=labels, index=index, shape=shape)
    for op in ["maximum", "median", "minimum", "maximum_position",
               "minimum_position", "extrema"]
    for labels, index in [
        (None, None), (5, 1), (5, "all"), (50, "subset"), (50, None),
    ]
    for shape in [(512,), (32, 64)]
]


@pytest.mark.parametrize("case", SELECT_CASES)
@pytest.mark.parametrize("dtype", [np.int32, np.uint8, np.float32,
                                   np.float64])
def test_measurements_select(case, dtype):
    shape = case["shape"]
    rstate = np.random.RandomState(0)
    x = (rstate.rand(*shape) * 32).astype(dtype)
    non_unique = np.unique(x).size < x.size

    if (
        case["op"] in ["minimum_position", "maximum_position"]
        and non_unique
        and case["index"] is not None
    ):
        pytest.skip("non-unique min or max position")

    if case["labels"] is None:
        labels = None
    else:
        labels = (
            rstate.choice(case["labels"], x.size).reshape(shape) + 1
        )
    if case["index"] is None or isinstance(case["index"], int):
        index = case["index"]
    elif case["index"] == "all":
        index = (
            np.arange(1, case["labels"] + 1, dtype=np.intp)
            if case["labels"] is not None
            else None
        )
    else:  # subset
        index = (
            np.arange(1, case["labels"] + 1, dtype=np.intp)[1::2]
            if case["labels"] is not None
            else None
        )

    exp = getattr(sndi, case["op"])(x, labels, index)
    got = getattr(tndi, case["op"])(x, labels, index)
    if case["op"] == "extrema":
        if non_unique and case["index"] is not None:
            exp, got = exp[:2], got[:2]
        for e, g in zip(exp, got):
            np.testing.assert_allclose(
                np.asarray(g, dtype=float), np.asarray(e, dtype=float),
                rtol=1e-6,
            )
    else:
        np.testing.assert_allclose(
            np.asarray(got, dtype=float), np.asarray(exp, dtype=float),
            rtol=1e-6,
        )
