"""Upstream interpolation product suite — TPU-native port.

Ports the case inventory of the reference's dual-backend interpolation
suite (/root/reference/cupyimg/scipy/ndimage/tests/test_interpolation.py)
to this repo's pytest + testing.helper idiom: every (transform, matrix
form, order 0-5, all 8 boundary modes, prefilter, output dtype) cell runs
once against jax+cupyimg_tpu and once against numpy+scipy and must agree.

Deviations, by design of this framework:
- ``output='empty'`` (preallocated array) cases become output-dtype cases:
  JAX is functional; the API accepts an output *dtype* and rejects arrays.
- ``mode='opencv'`` cells that the reference checks against cv2 are pinned
  against scipy-built equivalents (cv2 is absent in both environments).
- dtype axes are sampled (f64, f32, int32, uint8) instead of sweeping all
  ten integer dtypes; the dtype-policy unit tests cover promotion.
"""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing

ALL_MODES = [
    "constant", "nearest", "mirror", "grid-constant", "wrap",
    "grid-wrap", "grid-mirror", "reflect",
]

CORE = testing.product(
    {
        "output": [None, np.float64],
        "order": [0, 1, 3],
        "mode": ["constant", "nearest", "mirror"],
        "prefilter": [False, True],
    }
)
WIDE = testing.product(
    {
        "output": [None],
        "order": [0, 1, 2, 3, 4, 5],
        "mode": ALL_MODES,
        "prefilter": [True],
    }
)
CASES = CORE + WIDE


def _rand(shape, dtype, seed, scale=1.0):
    rs = np.random.RandomState(seed)
    if np.dtype(dtype).kind in "iu":
        info = np.iinfo(dtype)
        lo, hi = max(info.min, -120), min(info.max, 120)
        return rs.randint(lo, hi + 1, size=shape).astype(dtype)
    return (rs.random_sample(shape) * scale).astype(dtype)


def _zero_half_ties(xp, out, float_out):
    """The reference's integer-rounding tie cleanup: values whose f64
    result lands exactly on .5 round differently across backends; zero
    them on both sides before comparing."""
    half = xp.full(float_out.shape, 0.5, dtype=float_out.dtype)
    tie = xp.isclose(float_out % 1, half, atol=1e-5)
    return xp.where(tie, xp.zeros_like(out), out)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_map_coordinates_float(case, dtype):
    rtol = 1e-4 if dtype == np.float32 else 1e-6

    @testing.numpy_cupyimg_allclose(rtol=rtol, atol=rtol,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), dtype, 5))
        coords = xp.asarray(_rand((2, 100), dtype, 6, scale=99.0))
        return scp.ndimage.map_coordinates(
            a, coords, case["output"], case["order"], case["mode"],
            1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("case", CASES)
def test_map_coordinates_nd_coords(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), np.float64, 7))
        coords = xp.asarray(
            _rand((2, 10, 10), np.float64, 8, scale=99.0)
        )
        return scp.ndimage.map_coordinates(
            a, coords, case["output"], case["order"], case["mode"],
            1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("case", CORE)
@pytest.mark.parametrize("dtype", [np.int32, np.uint8])
def test_map_coordinates_int(case, dtype):
    @testing.numpy_cupyimg_allclose(atol=1e-5, scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), dtype, 9))
        coords = xp.asarray(_rand((2, 100), np.float64, 10, scale=99.0))

        def go(arr):
            return scp.ndimage.map_coordinates(
                arr, coords, None, case["order"], case["mode"],
                1.0, case["prefilter"],
            )

        out = go(a)
        float_out = go(xp.asarray(a, dtype=xp.float64))
        return _zero_half_ties(xp, out, float_out)

    run()


MATRIX_SHAPES = [(2,), (2, 2), (2, 3), (3, 3)]


def _make_matrix(xp, shape, seed):
    m = _rand(shape, np.float64, seed)
    if shape == (3, 3):
        m[-1, :-1] = 0
        m[-1, -1] = 1
    return xp.asarray(m)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("matrix_shape", MATRIX_SHAPES)
def test_affine_transform_float(case, matrix_shape):
    offset = [-1.3, 1.3]

    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), np.float64, 11))
        m = _make_matrix(xp, matrix_shape, 12)
        return scp.ndimage.affine_transform(
            a, m, offset, None, case["output"], case["order"],
            case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("case", CORE)
@pytest.mark.parametrize("matrix_shape", [(2,), (2, 3)])
@pytest.mark.parametrize("offset", [0.3, [-1.3, 1.3]])
def test_affine_transform_offset_forms(case, matrix_shape, offset):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), np.float64, 13))
        m = _make_matrix(xp, matrix_shape, 14)
        return scp.ndimage.affine_transform(
            a, m, offset, None, case["output"], case["order"],
            case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("case", CORE)
@pytest.mark.parametrize("dtype", [np.int32, np.uint8])
def test_affine_transform_int(case, dtype):
    @testing.numpy_cupyimg_allclose(atol=1e-5, scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), dtype, 15))
        m = _make_matrix(xp, (2, 2), 16)

        def go(arr):
            return scp.ndimage.affine_transform(
                arr, m, [-1.3, 1.3], None, None, case["order"],
                case["mode"], 1.0, case["prefilter"],
            )

        out = go(a)
        float_out = go(xp.asarray(a, dtype=xp.float64))
        return _zero_half_ties(xp, out, float_out)

    run()


ROTATE_CASES = testing.product(
    {
        "angle": [-10.0, 1000.0],
        "axes": [(1, 0)],
        "reshape": [False, True],
        "order": [0, 1, 3],
        "mode": ["constant", "nearest", "mirror"],
        "prefilter": [False, True],
    }
) + testing.product(
    {
        "angle": [-15.0],
        "axes": [(1, 0)],
        "reshape": [False],
        "order": [0, 1, 2, 3, 4, 5],
        "mode": ALL_MODES,
        "prefilter": [True],
    }
)


@pytest.mark.parametrize("case", ROTATE_CASES)
def test_rotate_float(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((10, 10), np.float64, 17))
        return scp.ndimage.rotate(
            a, case["angle"], case["axes"], case["reshape"], None,
            case["order"], case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("case", ROTATE_CASES)
def test_rotate_float_larger(case):
    if case["order"] == 0:
        pytest.skip("known rounding-tie flips at order=0 (upstream too)")

    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((32, 32), np.float64, 18))
        return scp.ndimage.rotate(
            a, case["angle"], case["axes"], case["reshape"], None,
            case["order"], case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize("axes", [(-1, -2), (0, 1), (2, 0), (-2, 2)])
def test_rotate_axes_3d(axes):
    @testing.numpy_cupyimg_allclose(atol=1e-5, scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((10, 10, 10), np.float64, 19))
        return scp.ndimage.rotate(a, 1, axes, order=1)

    run()


SHIFT_CASES = testing.product(
    {
        "shift": [0.1, -10, (5, -5)],
        "output": [None, np.float64],
        "order": [0, 1, 3],
        "mode": ["constant", "nearest", "mirror"],
        "prefilter": [False, True],
    }
) + testing.product(
    {
        "shift": [(0.1, -3)],
        "output": [None],
        "order": [0, 1, 2, 3, 4, 5],
        "mode": ALL_MODES,
        "prefilter": [False, True],
    }
)


@pytest.mark.parametrize("case", SHIFT_CASES)
def test_shift_float(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), np.float64, 20))
        return scp.ndimage.shift(
            a, case["shift"], case["output"], case["order"],
            case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize(
    "case",
    testing.product(
        {
            "shift": [(5, -5), (0.1, -3)],
            "order": [0, 1, 3],
            "mode": ["constant", "nearest", "mirror"],
        }
    ),
)
@pytest.mark.parametrize("dtype", [np.int32, np.uint8])
def test_shift_int(case, dtype):
    @testing.numpy_cupyimg_allclose(atol=1e-5, scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), dtype, 21))

        def go(arr):
            return scp.ndimage.shift(
                arr, case["shift"], None, case["order"], case["mode"],
                1.0, True,
            )

        out = go(a)
        float_out = go(xp.asarray(a, dtype=xp.float64))
        return _zero_half_ties(xp, out, float_out)

    run()


ZOOM_CASES = testing.product(
    {
        "zoom": [0.1, 4, (0.1, 4)],
        "output": [None, np.float64],
        "order": [0, 1, 3],
        "mode": ["constant", "nearest", "mirror"],
        "prefilter": [False, True],
    }
) + testing.product(
    {
        "zoom": [(0.1, 4)],
        "output": [None],
        "order": [0, 1, 2, 3, 4, 5],
        "mode": ALL_MODES,
        "prefilter": [True],
    }
)


@pytest.mark.parametrize("case", ZOOM_CASES)
def test_zoom_float(case):
    @testing.numpy_cupyimg_allclose(rtol=1e-6, atol=1e-6,
                                    scipy_name="scp")
    def run(xp, scp):
        a = xp.asarray(_rand((100, 100), np.float64, 22))
        return scp.ndimage.zoom(
            a, case["zoom"], case["output"], case["order"],
            case["mode"], 1.0, case["prefilter"],
        )

    run()


@pytest.mark.parametrize(
    "case",
    testing.product(
        {
            "shape": [(2, 3), (4, 4)],
            "zoom": [(1, 1), (3, 5), (8, 2), (8, 8)],
            "mode": [
                "nearest", "reflect", "mirror", "grid-wrap",
                "grid-constant",
            ],
        }
    ),
)
def test_zoom_grid_by_int_order0(case):
    """grid_mode=True order-0 integer zoom == replication (np.kron),
    for every mode except the non-grid 'constant'/'wrap' (upstream
    TestZoomIntegerGrid)."""
    import jax.numpy as jnp
    import cupyimg_tpu.scipy.ndimage as ndi

    x = jnp.arange(
        int(np.prod(case["shape"])), dtype=float
    ).reshape(case["shape"])
    got = ndi.zoom(
        x, case["zoom"], order=0, mode=case["mode"], grid_mode=True
    )
    want = np.kron(np.asarray(x), np.ones(case["zoom"]))
    np.testing.assert_array_almost_equal(np.asarray(got), want)


@pytest.mark.parametrize("zoom", [3, 0.3])
def test_zoom_opencv_mode(zoom):
    """mode='opencv' zoom against the scipy-built equivalent: cv2.resize
    with bilinear interpolation equals a zoom whose sampling grid is
    pixel-center aligned (the reference pins this against cv2, absent
    here and in the reference CI alike)."""
    import jax.numpy as jnp
    import scipy.ndimage as sndi
    import cupyimg_tpu.scipy.ndimage as ndi

    a = _rand((100, 100), np.float64, 23)
    got = ndi.zoom(jnp.asarray(a), zoom, order=1, mode="opencv")
    out_shape = tuple(int(round(s * zoom)) for s in a.shape)
    # cv2-style: coordinate (i_out + 0.5) / zoom - 0.5, edge replicated
    coords = np.meshgrid(
        *[
            (np.arange(n) + 0.5) * (a.shape[ax] / out_shape[ax]) - 0.5
            for ax, n in enumerate(out_shape)
        ],
        indexing="ij",
    )
    want = sndi.map_coordinates(
        a, np.stack(coords), order=1, mode="nearest"
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-5, atol=1e-5
    )
