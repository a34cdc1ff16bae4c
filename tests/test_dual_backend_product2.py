"""Second dense product-grid dual-backend tier (SURVEY.md §4 tier 2):
interpolation shift/affine, grey morphology, 2-D signal boundaries,
labeled measurements, and Fourier-domain filters — each body runs under
xp=jax.numpy + cupyimg_tpu.scipy AND xp=numpy + scipy and must agree."""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing


INTERP_MODES = [
    "reflect", "constant", "nearest", "mirror", "wrap",
    "grid-mirror", "grid-wrap", "grid-constant",
]

SHIFT_CASES = testing.product(
    {
        "order": [0, 1, 3, 5],
        "mode": INTERP_MODES,
        "shift": [(1.3, -2.7), (0.0, 4.5)],
    }
)


@pytest.mark.parametrize("case", SHIFT_CASES)
def test_shift_product(case):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-5, atol=1e-5, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(3)
        x = xp.asarray(rng.rand(14, 15))
        return scp.ndimage.shift(
            x, case["shift"], order=case["order"], mode=case["mode"],
            cval=0.7,
        )

    run()


AFFINE_CASES = testing.product(
    {
        "order": [0, 1, 3],
        "mode": ["reflect", "constant", "nearest", "mirror", "wrap"],
        "matrix": ["full", "diag", "homogeneous"],
    }
)


@pytest.mark.parametrize("case", AFFINE_CASES)
def test_affine_product(case):
    if case["matrix"] == "full":
        matrix = np.array([[0.9, 0.15], [-0.1, 1.1]])
        offset = (0.5, -1.0)
    elif case["matrix"] == "diag":
        matrix = np.array([0.8, 1.25])
        offset = (1.0, 0.0)
    else:
        matrix = np.array(
            [[0.9, 0.1, 0.4], [-0.05, 1.05, -0.3], [0.0, 0.0, 1.0]]
        )
        offset = 0.0

    @testing.numpy_cupyimg_allclose(
        rtol=1e-5, atol=1e-5, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(4)
        x = xp.asarray(rng.rand(13, 12))
        return scp.ndimage.affine_transform(
            x, xp.asarray(matrix), offset=offset, order=case["order"],
            mode=case["mode"], cval=0.25,
        )

    run()


GREY_CASES = testing.product(
    {
        "shape": [(11, 12)],
        "sel": ["size", "footprint", "structure"],
        "mode": ["reflect", "constant", "nearest", "mirror", "wrap"],
    }
)


@pytest.mark.parametrize("case", GREY_CASES)
@pytest.mark.parametrize(
    "op",
    [
        "grey_erosion", "grey_dilation", "grey_opening", "grey_closing",
        "morphological_gradient", "morphological_laplace",
        "white_tophat", "black_tophat",
    ],
)
def test_grey_morphology_product(case, op):
    @testing.numpy_cupyimg_allclose(rtol=1e-12, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(11)
        x = xp.asarray(rng.rand(*case["shape"]))
        kw = {"mode": case["mode"], "cval": 0.3}
        if case["sel"] == "size":
            kw["size"] = (3, 3)
        elif case["sel"] == "footprint":
            fp = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
            kw["footprint"] = xp.asarray(fp)
        else:
            st = np.array(
                [[0.0, 0.1, 0.0], [0.1, 0.2, 0.1], [0.0, 0.1, 0.0]]
            )
            kw["structure"] = xp.asarray(st)
        return getattr(scp.ndimage, op)(x, **kw)

    run()


CONV2D_CASES = testing.product(
    {
        "mode": ["full", "same", "valid"],
        "boundary": ["fill", "wrap", "symm"],
        "kshape": [(3, 3), (4, 5)],
    }
)


@pytest.mark.parametrize("case", CONV2D_CASES)
@pytest.mark.parametrize("op", ["convolve2d", "correlate2d"])
def test_conv2d_product(case, op):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-10, atol=1e-10, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(21)
        x = xp.asarray(rng.rand(12, 13))
        k = xp.asarray(rng.rand(*case["kshape"]))
        return getattr(scp.signal, op)(
            x, k, mode=case["mode"], boundary=case["boundary"],
            fillvalue=0.4,
        )

    run()


MEAS_LABELS = np.array(
    [
        [1, 1, 0, 2, 2, 0],
        [1, 0, 0, 2, 2, 0],
        [0, 0, 3, 3, 0, 0],
        [4, 0, 3, 0, 5, 5],
        [4, 4, 0, 0, 5, 0],
    ]
)


@pytest.mark.parametrize(
    "op",
    [
        "sum", "mean", "variance", "standard_deviation", "median",
        "minimum", "maximum", "center_of_mass",
    ],
)
@pytest.mark.parametrize("index", [None, 2, [1, 3, 5], [5, 1]])
def test_labeled_measurement_product(op, index):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-12, atol=1e-12, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(31)
        x = xp.asarray(rng.rand(*MEAS_LABELS.shape))
        labels = xp.asarray(MEAS_LABELS)
        out = getattr(scp.ndimage, op)(x, labels=labels, index=index)
        if isinstance(out, list):
            out = np.asarray(out, dtype=float)
        return out

    run()


@pytest.mark.parametrize(
    "op", ["minimum_position", "maximum_position"]
)
@pytest.mark.parametrize("index", [None, 3, [1, 2, 4]])
def test_labeled_position_product(op, index):
    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(32)
        x = xp.asarray(rng.rand(*MEAS_LABELS.shape))
        labels = xp.asarray(MEAS_LABELS)
        out = getattr(scp.ndimage, op)(x, labels=labels, index=index)
        return np.asarray(out)

    run()


@pytest.mark.parametrize("index", [2, [1, 3, 5]])
def test_extrema_product(index):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-12, atol=1e-12, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(33)
        x = xp.asarray(rng.rand(*MEAS_LABELS.shape))
        labels = xp.asarray(MEAS_LABELS)
        mins, maxs, minpos, maxpos = scp.ndimage.extrema(
            x, labels=labels, index=index
        )
        return (
            np.asarray(mins), np.asarray(maxs),
            np.asarray(minpos, dtype=float),
            np.asarray(maxpos, dtype=float),
        )

    run()


FOURIER_CASES = testing.product(
    {
        "shape": [(16, 12), (8, 9, 10)],
        "op": [
            "fourier_gaussian", "fourier_uniform", "fourier_shift",
            "fourier_ellipsoid",
        ],
    }
)


@pytest.mark.parametrize("case", FOURIER_CASES)
def test_fourier_product(case):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-10, atol=1e-10, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(41)
        x = rng.rand(*case["shape"])
        freq = xp.asarray(np.fft.fftn(x))
        arg = (1.4, 2.0, 0.7)[: len(case["shape"])]
        if case["op"] == "fourier_shift":
            arg = (1.0, -2.0, 0.5)[: len(case["shape"])]
        fn = getattr(scp.ndimage, case["op"])
        return fn(freq, arg)

    run()


@pytest.mark.parametrize("order", [0, 1, 2, 3])
@pytest.mark.parametrize("axis", [0, 1, -1])
def test_gaussian_filter1d_order_product(order, axis):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-9, atol=1e-9, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(51)
        x = xp.asarray(rng.rand(17, 18))
        return scp.ndimage.gaussian_filter1d(
            x, sigma=2.1, order=order, axis=axis, mode="nearest"
        )

    run()
