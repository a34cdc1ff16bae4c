"""Dual-backend morphology products vs scipy.

Ported from the reference
/root/reference/cupyimg/scipy/ndimage/tests/test_morphology_from_cupy.py
(binary erosion/dilation 1-d and nd products over border_value / origin /
structure / output dtype / iterations, opening/closing, fill_holes,
hit_or_miss with separate structures, propagation under masks, grey
morphology with random footprints/structures over all boundary modes,
morphological gradient/laplace, tophats).  The dense reference grid is
sampled down; every case compares against scipy on identical inputs.

Divergence note: preallocated ``output`` ndarrays raise
NotImplementedError in this functional framework (PARITY.md); the
reference grid's "zeros" output cases assert that contract instead.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.scipy.ndimage as tndi


def _cmp(op, args, kwargs, exact=True):
    exp = getattr(sndi, op)(*args, **kwargs)
    got = getattr(tndi, op)(*args, **kwargs)
    got = np.asarray(got)
    # value-only comparison like the reference's array_equal decorator:
    # scipy's binary ops return bool even for dtype `output` requests
    if kwargs.get("output") is None and not (
        kwargs.get("output1") or kwargs.get("output2")
    ):
        assert got.dtype == exp.dtype, f"{got.dtype} != {exp.dtype}"
    if exact:
        np.testing.assert_array_equal(
            got.astype(np.float64), np.asarray(exp, dtype=np.float64)
        )
    else:
        np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)


BIN1D_CASES = [
    dict(x_dtype=dt, border_value=bv, structure=st, origin=o, data=data,
         filter=f, output=out)
    for dt in [bool, np.int8, np.float32]
    for bv in [0, 1]
    for st in [None, (1, 0, 1), (1, 1, 0)]
    for o in [-1, 0, 1]
    for data in [[], [1, 1, 0, 1, 1]]
    for f, out in [
        ("binary_erosion", None),
        ("binary_dilation", np.float32),
        ("binary_erosion", np.int8),
    ]
]


@pytest.mark.parametrize("case", BIN1D_CASES)
def test_binary_erosion_and_dilation_1d(case):
    if case["x_dtype"] == case["output"]:
        pytest.skip("redundant")
    x = np.asarray(case["data"], dtype=case["x_dtype"])
    structure = (
        None if case["structure"] is None else np.asarray(case["structure"])
    )
    _cmp(
        case["filter"],
        (x, structure),
        dict(
            iterations=1,
            mask=None,
            output=case["output"],
            border_value=case["border_value"],
            origin=case["origin"],
            brute_force=True,
        ),
    )


_OC_DATA = [
    [
        [0, 1, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 1, 1, 1, 1, 0],
        [0, 0, 1, 1, 0, 1, 0, 0],
        [0, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [
        [1, 1, 1, 0, 0, 0, 0, 0],
        [1, 1, 1, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 0, 1, 1, 0],
        [0, 1, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
]


@pytest.mark.parametrize("x_dtype", [bool, np.float64])
@pytest.mark.parametrize("border_value", [0, 1])
@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("origin", [0, 1])
@pytest.mark.parametrize("data_i", [0, 1])
@pytest.mark.parametrize("filt", ["binary_opening", "binary_closing"])
def test_binary_opening_and_closing(
    x_dtype, border_value, connectivity, origin, data_i, filt
):
    x = np.asarray(_OC_DATA[data_i], dtype=x_dtype)
    structure = sndi.generate_binary_structure(x.ndim, connectivity)
    _cmp(
        filt,
        (x, structure),
        dict(
            iterations=1,
            output=None,
            origin=origin,
            mask=None,
            border_value=border_value,
            brute_force=True,
        ),
    )


_FH_DATA = [
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 1, 1, 1, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 1, 1, 1, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 1, 1, 0, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 0, 1, 1, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
        [0, 1, 0, 1, 0, 1, 1, 1],
        [0, 1, 0, 1, 0, 1, 0, 1],
        [0, 1, 0, 1, 0, 1, 0, 1],
        [0, 0, 1, 0, 0, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
]


@pytest.mark.parametrize("x_dtype", [bool, np.float64])
@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("origin", [-1, 0, 1])
@pytest.mark.parametrize("data_i", [0, 1, 2])
@pytest.mark.parametrize("output", [None, np.float32, np.int8])
def test_binary_fill_holes(x_dtype, connectivity, origin, data_i, output):
    if x_dtype == output:
        pytest.skip("redundant")
    x = np.asarray(_FH_DATA[data_i], dtype=x_dtype)
    structure = sndi.generate_binary_structure(x.ndim, connectivity)
    _cmp(
        "binary_fill_holes",
        (x, structure),
        dict(output=output, origin=origin),
    )


_HOM_DATA = [
    [
        [0, 1, 0, 0, 0],
        [1, 1, 1, 0, 0],
        [0, 1, 0, 1, 1],
        [0, 0, 1, 1, 1],
        [0, 1, 1, 1, 0],
        [0, 1, 1, 1, 1],
        [0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0],
    ],
    [
        [0, 1, 0, 0, 1, 1, 1, 0],
        [1, 1, 1, 0, 0, 1, 0, 0],
        [0, 1, 0, 1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [
        [0, 1, 0, 0, 1, 1, 1, 0],
        [1, 1, 1, 0, 0, 0, 0, 0],
        [0, 1, 0, 1, 1, 1, 1, 0],
        [0, 0, 1, 1, 1, 1, 1, 0],
        [0, 1, 1, 1, 0, 1, 1, 0],
        [0, 0, 0, 0, 1, 1, 1, 0],
        [0, 1, 1, 1, 1, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
]


@pytest.mark.parametrize("x_dtype", [bool, np.float64])
@pytest.mark.parametrize("struct", ["same", "separate"])
@pytest.mark.parametrize("origins", [((0, 0), (0, 0)), ((0, 1), (-1, 0))])
@pytest.mark.parametrize("data_i", [0, 1, 2])
@pytest.mark.parametrize("output", [None, np.float32, np.int8])
def test_binary_hit_or_miss(x_dtype, struct, origins, data_i, output):
    if x_dtype == output:
        pytest.skip("redundant")
    x = np.asarray(_HOM_DATA[data_i], dtype=x_dtype)
    if struct == "same":
        structure1 = sndi.generate_binary_structure(x.ndim, 1)
        structure2 = structure1
    else:
        structure1 = np.asarray([[0, 0, 0], [1, 1, 1], [0, 0, 0]])
        structure2 = np.asarray([[1, 1, 1], [0, 0, 0], [1, 1, 1]])
    origin1, origin2 = origins
    _cmp(
        "binary_hit_or_miss",
        (x, structure1, structure2),
        dict(output=output, origin1=origin1, origin2=origin2),
    )


_PROP_MASKS = [
    [
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 1, 0],
        [0, 0, 0, 0, 1, 1, 0, 0],
        [0, 0, 1, 1, 1, 0, 0, 0],
        [0, 1, 1, 0, 1, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 1, 1, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 1, 1, 0, 0, 0],
        [0, 0, 1, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
]

_PROP_SEED = [
    [
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ],
    [[0] * 8 for _ in range(8)],
]


@pytest.mark.parametrize("x_dtype", [bool, np.float64])
@pytest.mark.parametrize("border_value", [0, 1])
@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("origin", [0, 1])
@pytest.mark.parametrize("mask_i", [0, 1])
@pytest.mark.parametrize("data_i", [0, 1])
def test_binary_propagation(
    x_dtype, border_value, connectivity, origin, mask_i, data_i
):
    x = np.asarray(_PROP_SEED[data_i], dtype=x_dtype)
    mask = np.asarray(_PROP_MASKS[mask_i])
    structure = sndi.generate_binary_structure(x.ndim, connectivity)
    _cmp(
        "binary_propagation",
        (x, structure),
        dict(
            mask=mask,
            output=None,
            border_value=border_value,
            origin=origin,
        ),
    )


BIN_ND_CASES = [
    dict(x_dtype=dt, border_value=bv, connectivity=c, origin=o,
         shape=shape, density=den, filter=f, iterations=it, output=out)
    for dt in [np.int8, np.float32]
    for bv, c, o in [(0, 1, 0), (1, 2, -1), (0, 2, 0), (1, 1, -1)]
    for shape, den in [((64,), 0.1), ((16, 15), 0.5), ((5, 7, 9), 0.9)]
    for f in ["binary_erosion", "binary_dilation"]
    for it, out in [(1, None), (2, np.float32), (0, None)]
]


@pytest.mark.parametrize("case", BIN_ND_CASES)
def test_binary_erosion_and_dilation_nd(case):
    if case["x_dtype"] == case["output"]:
        pytest.skip("redundant")
    rstate = np.random.RandomState(5)
    x = (rstate.randn(*case["shape"]) > case["density"]).astype(
        case["x_dtype"]
    )
    structure = sndi.generate_binary_structure(
        len(case["shape"]), case["connectivity"]
    )
    _cmp(
        case["filter"],
        (x, structure),
        dict(
            iterations=case["iterations"],
            mask=None,
            output=case["output"],
            border_value=case["border_value"],
            origin=case["origin"],
            brute_force=True,
        ),
    )


@pytest.mark.parametrize("x_dtype", [np.int8, np.float32])
@pytest.mark.parametrize("filt", ["binary_erosion", "binary_dilation"])
@pytest.mark.parametrize("iterations", [1, 2])
@pytest.mark.parametrize("contiguity", ["C", "F", "none"])
def test_binary_erosion_and_dilation_contiguity(
    x_dtype, filt, iterations, contiguity
):
    rstate = np.random.RandomState(5)
    x = (rstate.randn(16, 24) > 0.3).astype(x_dtype)
    if contiguity == "F":
        x = np.asfortranarray(x)
    elif contiguity == "none":
        x = x[::2, ::3]
    structure = sndi.generate_binary_structure(2, 1)
    _cmp(
        filt,
        (x, structure),
        dict(
            iterations=iterations,
            mask=None,
            output=None,
            border_value=0,
            origin=0,
            brute_force=True,
        ),
    )


def _random_footprint(shape, rng):
    fp = (rng.rand(*shape) < 0.5).astype(int)
    if not fp.any():
        fp = np.ones(shape, int)
    return fp


GREY_CASES = [
    dict(shape=shape, size=size, footprint=fp, structure=st, mode=mode,
         cval=cval, origin=o, x_dtype=dt, output=out, filter=f)
    for shape in [(3, 4), (2, 3, 4), (1, 2, 3, 4)]
    for size in [3, 4]
    for fp in [None, "random"]
    for st in [None, "random"]
    for mode, cval, o, dt, out in [
        ("reflect", 0.0, 0, np.int8, None),
        ("reflect", 0.0, 1, np.float32, np.int32),
        ("reflect", 0.0, None, np.float64, np.float64),
        ("constant", -1.0, 0, np.int32, None),
        ("constant", 1.0, 0, np.float64, None),
        ("nearest", 0.0, 0, np.int32, None),
        ("mirror", 0.0, 0, np.float64, None),
        ("wrap", 0.0, 0, np.int32, None),
    ]
    for f in ["grey_erosion", "grey_dilation"]
]


@pytest.mark.parametrize("case", GREY_CASES)
def test_grey_erosion_and_dilation(case):
    if case["mode"] == "mirror" and 1 in case["shape"]:
        pytest.skip("not testable against scipy")
    if case["x_dtype"] == case["output"]:
        pytest.skip("redundant")
    rng = np.random.RandomState(0)
    ndim = len(case["shape"])
    x = (rng.rand(*case["shape"]) * 10).astype(case["x_dtype"])
    origin = (
        (-1, 1, -1, 1)[:ndim] if case["origin"] is None else case["origin"]
    )
    fshape = (case["size"],) * ndim
    footprint = (
        None if case["footprint"] is None
        else _random_footprint(fshape, np.random.RandomState(1))
    )
    structure = (
        None if case["structure"] is None
        else np.random.RandomState(2).randint(0, 10, fshape).astype(np.int32)
    )
    exp = getattr(sndi, case["filter"])(
        x, size=case["size"], footprint=footprint, structure=structure,
        output=case["output"], mode=case["mode"], cval=case["cval"],
        origin=origin,
    )
    got = getattr(tndi, case["filter"])(
        x, size=case["size"], footprint=footprint, structure=structure,
        output=case["output"], mode=case["mode"], cval=case["cval"],
        origin=origin,
    )
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5, rtol=1e-5)


GREYOC_CASES = [
    dict(size=size, structure=st, mode=mode, origin=o, x_dtype=dt,
         output=out, filter=f)
    for size in [3, 4]
    for st in [None, "random"]
    for mode in ["reflect", "constant", "nearest", "mirror", "wrap"]
    for o, dt, out in [
        (0, np.int32, None),
        (None, np.float32, np.float64),
    ]
    for f in ["grey_closing", "grey_opening"]
]


@pytest.mark.parametrize("case", GREYOC_CASES)
def test_grey_closing_and_opening(case):
    rng = np.random.RandomState(3)
    x = (rng.rand(4, 5) * 10).astype(case["x_dtype"])
    origin = (-1, 1) if case["origin"] is None else case["origin"]
    structure = (
        None if case["structure"] is None
        else np.random.RandomState(4)
        .randint(0, 10, (case["size"],) * 2)
        .astype(np.int32)
    )
    exp = getattr(sndi, case["filter"])(
        x, size=case["size"], footprint=None, structure=structure,
        output=case["output"], mode=case["mode"], cval=0.0, origin=origin,
    )
    got = getattr(tndi, case["filter"])(
        x, size=case["size"], footprint=None, structure=structure,
        output=case["output"], mode=case["mode"], cval=0.0, origin=origin,
    )
    np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5, rtol=1e-5)


GRAD_CASES = [
    dict(x_dtype=np.int32, origin=o, filter=f, mode=m, output=None,
         size=s, footprint=fp, structure=st)
    for o in [-1, 0, 1]
    for f in ["morphological_gradient", "morphological_laplace"]
    for m in ["reflect", "constant"]
    for s in [(3, 3), (4, 3)]
    for fp in [None, "random"]
    for st in [None, "random"]
] + [
    dict(x_dtype=dt, origin=0, filter=f, mode=m, output=out, size=3,
         footprint=fp, structure=st)
    for dt, out in [(np.int32, np.float32), (np.float64, None)]
    for f in ["morphological_gradient", "morphological_laplace"]
    for m in ["reflect", "nearest", "mirror", "wrap"]
    for fp in [None, "random"]
    for st in [None, "random"]
]


@pytest.mark.parametrize("case", GRAD_CASES)
def test_morphological_gradient_and_laplace(case):
    x = np.zeros((7, 7), dtype=case["x_dtype"])
    x[2:5, 2:5] = 1
    x[4, 4] = 2
    x[2, 3] = 3
    shape = (
        (case["size"],) * 2 if np.isscalar(case["size"])
        else tuple(case["size"])
    )
    footprint = (
        None if case["footprint"] is None
        else _random_footprint(shape, np.random.RandomState(6))
    )
    structure = (
        None if case["structure"] is None
        else np.random.RandomState(7).randint(0, 10, shape).astype(np.int32)
    )
    _cmp(
        case["filter"],
        (x, case["size"], footprint, structure),
        dict(output=case["output"], mode=case["mode"], cval=0.0,
             origin=case["origin"]),
    )


TOPHAT_CASES = [
    dict(x_dtype=np.int32, shape=(5, 7), origin=o, filter=f, mode=m,
         output=None, size=s, footprint=fp, structure=st)
    for o in [-1, 0, 1]
    for f in ["white_tophat", "black_tophat"]
    for m in ["reflect", "constant"]
    for s in [(3, 3), (4, 3)]
    for fp in [None, "random"]
    for st in [None, "random"]
] + [
    dict(x_dtype=dt, shape=(6, 8), origin=0, filter=f, mode=m, output=out,
         size=3, footprint=fp, structure=st)
    for dt, out in [(np.int32, np.float32), (np.float64, None)]
    for f in ["white_tophat", "black_tophat"]
    for m in ["reflect", "nearest", "mirror", "wrap"]
    for fp in [None, "random"]
    for st in [None, "random"]
]


@pytest.mark.parametrize("case", TOPHAT_CASES)
def test_white_tophat_and_black_tophat(case):
    rng = np.random.RandomState(8)
    x = (rng.rand(*case["shape"]) * 10).astype(case["x_dtype"])
    shape = (
        (case["size"],) * 2 if np.isscalar(case["size"])
        else tuple(case["size"])
    )
    footprint = (
        None if case["footprint"] is None
        else _random_footprint(shape, np.random.RandomState(9))
    )
    structure = (
        None if case["structure"] is None
        else np.random.RandomState(10).randint(0, 10, shape).astype(np.int32)
    )
    _cmp(
        case["filter"],
        (x, case["size"], footprint, structure),
        dict(output=case["output"], mode=case["mode"], cval=0.0,
             origin=case["origin"]),
    )


def test_preallocated_output_raises():
    """Documented divergence: ndarray outputs are rejected (PARITY.md)."""
    x = np.zeros((7, 7), dtype=np.int32)
    with pytest.raises(NotImplementedError):
        tndi.morphological_gradient(x, 3, output=np.zeros_like(x))
