"""Third dense product-grid dual-backend tier (SURVEY.md §4 tier 2):
rotate, dense-coordinate map_coordinates, percentile/rank filters,
compound binary morphology, labeled_comprehension, ndimage histogram,
and fourier_ellipsoid — each body runs under xp=jax.numpy +
cupyimg_tpu.scipy AND xp=numpy + scipy and must agree."""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing


ROTATE_CASES = testing.product(
    {
        "angle": [17.0, -50.0, 90.0],
        "reshape": [True, False],
        "order": [0, 1, 3],
        "mode": ["constant", "nearest", "mirror"],
    }
)


@pytest.mark.parametrize("case", ROTATE_CASES)
def test_rotate_product(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-5, atol=1e-5, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(5)
        x = xp.asarray(rng.rand(15, 18))
        return scp.ndimage.rotate(
            x, case["angle"], reshape=case["reshape"],
            order=case["order"], mode=case["mode"], cval=0.3,
        )

    run()


MAPC_CASES = testing.product(
    {
        "order": [0, 1, 2, 3, 4, 5],
        "mode": ["reflect", "constant", "nearest", "mirror",
                 "grid-wrap", "grid-constant"],
    }
)


@pytest.mark.parametrize("case", MAPC_CASES)
def test_map_coordinates_random_product(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-4, atol=1e-4, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(6)
        x = xp.asarray(rng.rand(13, 17))
        coords = xp.asarray(
            rng.rand(2, 40) * np.array([[18.0], [22.0]]) - 2.5
        )
        return scp.ndimage.map_coordinates(
            x, coords, order=case["order"], mode=case["mode"], cval=0.8,
        )

    run()


RANK_CASES = testing.product(
    {
        "percentile": [0, 25, 50, 75, 100],
        "size": [3, 4],
        "mode": ["reflect", "nearest", "wrap"],
    }
)


@pytest.mark.parametrize("case", RANK_CASES)
def test_percentile_filter_product(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-12, atol=0, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(7)
        x = xp.asarray(rng.rand(14, 15))
        return scp.ndimage.percentile_filter(
            x, case["percentile"], size=case["size"], mode=case["mode"],
        )

    run()


def _footprints():
    fp = np.zeros((3, 4), bool)
    fp[1] = True
    fp[:, 2] = True
    return [None, fp]


@pytest.mark.parametrize("fp_idx", [0, 1])
@pytest.mark.parametrize("rank", [0, 2, 5, -1])
def test_rank_filter_footprint_product(rank, fp_idx):
    fp = _footprints()[fp_idx]

    @testing.numpy_cupyimg_allclose(rtol=1e-12, atol=0, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(8)
        x = xp.asarray(rng.rand(12, 13))
        if fp is None:
            return scp.ndimage.rank_filter(x, rank, size=3)
        return scp.ndimage.rank_filter(x, rank, footprint=xp.asarray(fp))

    run()


BIN_OPS = ["binary_opening", "binary_closing", "binary_propagation",
           "binary_fill_holes"]


@pytest.mark.parametrize("op", BIN_OPS)
@pytest.mark.parametrize("seed", [0, 3])
def test_compound_binary_product(op, seed):
    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(seed)
        x = xp.asarray(rng.rand(20, 21) > 0.4)
        if op == "binary_propagation":
            mask = xp.asarray(rng.rand(20, 21) > 0.2)
            out = scp.ndimage.binary_propagation(x, mask=mask)
        else:
            out = getattr(scp.ndimage, op)(x)
        return np.asarray(out)

    run()


def test_binary_hit_or_miss_product():
    s1 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    s2 = np.array([[1, 0, 1], [0, 0, 0], [1, 0, 1]])

    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(9)
        x = xp.asarray(rng.rand(18, 19) > 0.45)
        return np.asarray(
            scp.ndimage.binary_hit_or_miss(
                x, structure1=xp.asarray(s1), structure2=xp.asarray(s2)
            )
        )

    run()


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_binary_erosion_iterations_product(iterations):
    @testing.numpy_cupyimg_array_equal(scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(10)
        x = xp.asarray(rng.rand(22, 23) > 0.3)
        return np.asarray(
            scp.ndimage.binary_erosion(x, iterations=iterations)
        )

    run()


def _labels():
    rng = np.random.RandomState(11)
    return (rng.rand(12, 14) * 6).astype(np.int32)


@pytest.mark.parametrize("index", [2, [1, 3, 5]])
def test_labeled_comprehension_product(index):
    @testing.numpy_cupyimg_allclose(rtol=1e-12, atol=1e-12,
                                    scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(12)
        x = xp.asarray(rng.rand(12, 14))
        labels = xp.asarray(_labels())
        out = scp.ndimage.labeled_comprehension(
            x, labels, index, lambda v: float(np.asarray(v).sum()),
            float, -1.0,
        )
        return np.asarray(out)

    run()


@pytest.mark.parametrize("bins", [5, 9])
def test_ndimage_histogram_product(bins):
    @testing.numpy_cupyimg_allclose(rtol=0, atol=0, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(13)
        x = xp.asarray(rng.rand(15, 16))
        out = scp.ndimage.histogram(x, 0.0, 1.0, bins)
        return np.asarray(out)

    run()


def test_ndimage_histogram_labeled_product():
    @testing.numpy_cupyimg_allclose(rtol=0, atol=0, scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(14)
        x = xp.asarray(rng.rand(12, 14))
        labels = xp.asarray(_labels())
        out = scp.ndimage.histogram(x, 0.0, 1.0, 7, labels=labels,
                                    index=[1, 2, 4])
        return np.asarray([np.asarray(o) for o in out])

    run()


@pytest.mark.parametrize("size", [4.5, (3.0, 5.5)])
def test_fourier_ellipsoid_product(size):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(15)
        x = rng.rand(16, 18)
        fx = np.fft.fftn(x)
        if xp is np:
            out = scp.ndimage.fourier_ellipsoid(fx, size)
        else:
            out = scp.ndimage.fourier_ellipsoid(xp.asarray(fx), size)
        return np.asarray(out)

    run()


@pytest.mark.parametrize("order", [2, 4, 5])
@pytest.mark.parametrize("mode", ["mirror", "reflect", "grid-wrap"])
def test_spline_filter1d_exact_modes_product(order, mode):
    @testing.numpy_cupyimg_allclose(rtol=1e-5, atol=1e-5,
                                    scipy_name="scp")
    def run(xp, scp):
        rng = np.random.RandomState(16)
        x = xp.asarray(rng.rand(31, 9))
        return scp.ndimage.spline_filter1d(x, order=order, axis=0,
                                           mode=mode)

    run()
