"""Seeded differential mini-fuzz on the real TPU.

Fixed-seed random configurations (shapes, modes, matrices, tap sets)
compiled against scipy oracles — a compressed version of the ad-hoc
fuzz sweeps that validated the round-4 kernel changes (GTG planner,
fused-separable lane handling).  Wide randomized sweeps live outside
CI; these seeds pin the compiled paths those sweeps exercised.

Reference test strategy: the *_from_cupy.py product grids
(cupyimg/scipy/ndimage/tests/test_filters_from_cupy.py:18-60); this is
the TPU-compiled analog at fuzzed rather than gridded configurations.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndi
from cupyimg_tpu.ops import gtg_interp


def _gtg_cases():
    rng = np.random.default_rng(42)
    cases = []
    while len(cases) < 8:
        order = int(rng.choice([0, 1, 3]))
        mode = str(rng.choice(["nearest", "mirror", "grid-wrap",
                               "reflect"]))
        if order == 0:
            mode = "nearest"
        shape = (int(rng.integers(1100, 1500)),
                 int(rng.integers(1100, 1500)))
        th = rng.uniform(-1.2, 1.2)
        sc = rng.uniform(0.6, 1.5, 2)
        sh = rng.uniform(-0.4, 0.4)
        R = np.array([[np.cos(th), np.sin(th)],
                      [-np.sin(th), np.cos(th)]])
        m = R @ np.diag(sc) @ np.array([[1.0, sh], [0.0, 1.0]])
        off = rng.uniform(-30, 30, 2)
        if gtg_interp.gtg_plan(m, order, shape) is None:
            continue
        cases.append((order, mode, shape, m, off))
    return cases


@pytest.mark.parametrize(
    "idx,case",
    list(enumerate(_gtg_cases())),
    ids=lambda v: f"o{v[0]}-{v[1]}" if isinstance(v, tuple) else str(v),
)
def test_gtg_fuzzed_affine(idx, case):
    order, mode, shape, m, off = case
    rng = np.random.default_rng(900 + idx)
    x = sndi.gaussian_filter(
        rng.standard_normal(shape), 1.5
    ).astype(np.float32)
    y = gtg_interp.affine_gtg_2d(
        jnp.asarray(x), m.astype(np.float32), off, order, mode, 0.0,
        shape,
    )
    if y is None:
        # a dispatch gate (e.g. multi-period boundary folds) rejected
        # this transform; the gather fallback covers it elsewhere
        pytest.skip("plan gates reject this transform")
    exp = sndi.affine_transform(
        x.astype(np.float64), m, offset=off, order=order, mode=mode,
        prefilter=False,
    )
    err = np.abs(np.asarray(y) - exp)
    if order == 0:
        assert np.mean(err > 1e-5) < 2e-3
    else:
        assert err.max() < 5e-4


_STENCIL_SEEDS = list(range(10))


@pytest.mark.parametrize("seed", _STENCIL_SEEDS)
def test_stencil_fuzzed(seed):
    rng = np.random.default_rng(1000 + seed)
    nd = int(rng.choice([2, 3]))
    if nd == 2:
        shape = (int(rng.integers(150, 1200)),
                 int(rng.integers(150, 1200)))
    else:
        shape = tuple(int(v) for v in rng.integers(40, 200, 3))
    x = rng.standard_normal(shape).astype(np.float32)
    mode = str(rng.choice(["reflect", "nearest", "mirror", "constant",
                           "wrap"]))
    kind = str(rng.choice(["uniform", "gaussian", "min", "max",
                           "corr1d"]))
    xg = jnp.asarray(x)
    if kind == "uniform":
        sizes = tuple(int(v) for v in rng.integers(1, 8, nd))
        got = np.asarray(ndi.uniform_filter(xg, sizes, mode=mode,
                                            cval=1.5))
        exp = sndi.uniform_filter(x.astype(np.float64), sizes,
                                  mode=mode, cval=1.5)
        np.testing.assert_allclose(got, exp, atol=2e-5)
    elif kind == "gaussian":
        sig = [float(s) for s in rng.uniform(0, 3.0, nd)]
        got = np.asarray(ndi.gaussian_filter(xg, sig, mode=mode,
                                             cval=1.5))
        exp = sndi.gaussian_filter(x.astype(np.float64), sig,
                                   mode=mode, cval=1.5)
        np.testing.assert_allclose(got, exp, atol=2e-5)
    elif kind in ("min", "max"):
        sizes = tuple(int(v) for v in rng.integers(1, 8, nd))
        f = ndi.minimum_filter if kind == "min" else ndi.maximum_filter
        sf = (sndi.minimum_filter if kind == "min"
              else sndi.maximum_filter)
        got = np.asarray(f(xg, sizes, mode=mode, cval=1.5))
        exp = sf(x.astype(np.float64), sizes, mode=mode, cval=1.5)
        np.testing.assert_array_equal(got, exp)
    else:
        ax = int(rng.integers(0, nd))
        w = rng.standard_normal(int(rng.integers(2, 14))).astype(
            np.float32)
        og = int(rng.integers(-(len(w) // 2), (len(w) - 1) // 2 + 1))
        got = np.asarray(ndi.correlate1d(xg, w, axis=ax, mode=mode,
                                         cval=1.5, origin=og))
        exp = sndi.correlate1d(x.astype(np.float64),
                               w.astype(np.float64), axis=ax,
                               mode=mode, cval=1.5, origin=og)
        np.testing.assert_allclose(got, exp, atol=5e-4)


@pytest.mark.parametrize("seed", list(range(6)))
def test_shift_fuzzed(seed):
    # mirror/reflect premap folds at far-out coordinates (round-4 fix:
    # scipy's fold direction, not abs)
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(5, 40))
    sh = float(rng.uniform(-3 * n, 3 * n))
    order = int(rng.choice([0, 1, 3]))
    mode = str(rng.choice(["mirror", "reflect", "grid-wrap",
                           "nearest"]))
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(ndi.shift(jnp.asarray(x), sh, order=order,
                               mode=mode))
    exp = sndi.shift(x.astype(np.float64), sh, order=order, mode=mode)
    if order == 0:
        # f32 half-integer ties can flip; bound the flip count
        assert np.sum(np.abs(got - exp) > 1e-5) <= max(1, n // 10)
    else:
        np.testing.assert_allclose(got, exp, atol=1e-4)
