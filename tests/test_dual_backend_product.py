"""Dense product-grid dual-backend tests (the reference's
test_filters_from_cupy.py strategy, SURVEY.md §4 tier 2): one test body
runs under xp=jax.numpy + cupyimg_tpu.scipy AND xp=numpy + scipy, and
results must agree."""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing


FILTER_CASES = testing.product(
    {
        "shape": [(13, 14), (7, 8, 9)],
        "ksize": [1, 3, 4],
        "mode": ["reflect", "constant", "nearest", "mirror", "wrap"],
        "origin": [0, 1, -1],
    }
)


@pytest.mark.parametrize("case", FILTER_CASES)
@pytest.mark.parametrize(
    "filt",
    ["uniform_filter", "minimum_filter", "maximum_filter"],
)
def test_filter_product(case, filt):
    if case["origin"] >= (case["ksize"] + 1) // 2 or (
        -case["origin"] > case["ksize"] // 2
    ):
        pytest.skip("origin outside footprint")

    @testing.numpy_cupyimg_allclose(
        rtol=1e-7, atol=1e-7, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(7)
        x = xp.asarray(rng.rand(*case["shape"]))
        fn = getattr(scp.ndimage, filt)
        return fn(
            x,
            size=case["ksize"],
            mode=case["mode"],
            cval=0.5,
            origin=case["origin"],
        )

    run()


CORR_CASES = testing.product(
    {
        "shape": [(17, 19)],
        "kshape": [(1, 1), (3, 3), (2, 4), (5, 1)],
        "mode": ["reflect", "constant", "nearest", "mirror", "wrap"],
        "adtype": [np.float64, np.float32, np.int32, np.uint8],
    }
)


@pytest.mark.parametrize("case", CORR_CASES)
@pytest.mark.parametrize("op", ["correlate", "convolve"])
def test_correlate_product(case, op):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-6, atol=1e-6, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(11)
        x = xp.asarray(
            (rng.rand(*case["shape"]) * 50).astype(case["adtype"])
        )
        w = xp.asarray(rng.rand(*case["kshape"]))
        fn = getattr(scp.ndimage, op)
        return fn(x, w, mode=case["mode"], cval=2.0)

    run()


GAUSS_CASES = testing.product(
    {
        "sigma": [0.5, 1.5, 3.0],
        "order": [0, 1, 2],
        "mode": ["reflect", "constant", "nearest", "mirror"],
        "truncate": [2.0, 4.0],
    }
)


@pytest.mark.parametrize("case", GAUSS_CASES)
def test_gaussian_product(case):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-6, atol=1e-9, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(3)
        x = xp.asarray(rng.rand(18, 23))
        return scp.ndimage.gaussian_filter(
            x,
            case["sigma"],
            order=case["order"],
            mode=case["mode"],
            truncate=case["truncate"],
        )

    run()


MORPH_CASES = testing.product(
    {
        "shape": [(15, 16), (6, 7, 8)],
        "connectivity": [1, 2],
        "iterations": [1, 2, 0],
        "border_value": [0, 1],
    }
)


@pytest.mark.parametrize("case", MORPH_CASES)
@pytest.mark.parametrize("op", ["binary_erosion", "binary_dilation"])
def test_binary_morphology_product(case, op):
    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(5)
        x = xp.asarray(rng.rand(*case["shape"]) > 0.4)
        ndim = len(case["shape"])
        structure = xp.asarray(
            np.asarray(
                __import__("scipy.ndimage", fromlist=["x"])
                .generate_binary_structure(
                    ndim, case["connectivity"]
                )
            )
        )
        fn = getattr(scp.ndimage, op)
        return fn(
            x,
            structure=structure,
            iterations=case["iterations"],
            border_value=case["border_value"],
        )

    run()


INTERP_CASES = testing.product(
    {
        "order": [0, 1, 2, 3, 4, 5],
        "mode": [
            "reflect", "constant", "nearest", "mirror",
            "grid-wrap", "grid-constant",
        ],
        "zoom": [0.7, 1.3],
    }
)


@pytest.mark.parametrize("case", INTERP_CASES)
def test_zoom_product(case):
    @testing.numpy_cupyimg_allclose(
        rtol=1e-4, atol=1e-4, scipy_name="scp"
    )
    def run(xp, scp):
        rng = np.random.RandomState(9)
        x = xp.asarray(rng.rand(14, 15))
        return scp.ndimage.zoom(
            x,
            case["zoom"],
            order=case["order"],
            mode=case["mode"],
            cval=0.25,
        )

    run()


RANK_CASES = testing.product(
    {
        "size": [3, 5],
        "mode": ["reflect", "constant", "nearest"],
        "rank_frac": [0.0, 0.3, 0.5, 1.0],
    }
)


@pytest.mark.parametrize("case", RANK_CASES)
def test_rank_product(case):
    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(13)
        x = xp.asarray((rng.rand(16, 17) * 1000).astype(np.int32))
        k = case["size"] ** 2
        rank = min(k - 1, int(case["rank_frac"] * k))
        return scp.ndimage.rank_filter(
            x, rank, size=case["size"], mode=case["mode"], cval=7
        )

    run()
