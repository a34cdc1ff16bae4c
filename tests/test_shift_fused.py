"""shift_spline_fused: spline prefilter composed into the shift-tap FIR.

Oracle = scipy.ndimage.shift in f64 (the reference's shift path is
cupyimg/scipy/ndimage/interpolation.py:701-818: per-axis spline-prefilter
RawKernels plus one gather kernel; here the whole pipeline is ONE fused
separable correlation, run in the Pallas interpreter on CPU).
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

from cupyimg_tpu.ops import interp

# repo-mode -> scipy-mode (scipy spells grid-mirror 'reflect')
_SCIPY_MODE = {"grid-mirror": "reflect"}


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize(
    "mode", ["mirror", "reflect", "grid-mirror", "grid-wrap"]
)
@pytest.mark.parametrize(
    "shift", [(2.3, -1.7), (0.4, 0.9), (0.0, 0.0), (-3.0, 5.5)]
)
def test_fused_vs_scipy_2d(order, mode, shift):
    rng = np.random.RandomState(0)
    x = rng.randn(60, 53).astype(np.float32)
    got = interp.shift_spline_fused(
        jnp.asarray(x), shift, order, mode, 0.0, interpret=True
    )
    if got is None:
        pytest.skip("window does not straddle: generic path covers this")
    want = sndi.shift(
        x.astype(np.float64), shift, order=order,
        mode=_SCIPY_MODE.get(mode, mode),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fused_vs_scipy_3d():
    rng = np.random.RandomState(1)
    v = rng.randn(24, 20, 22).astype(np.float32)
    sh = (1.3, -0.6, 2.9)
    got = interp.shift_spline_fused(
        jnp.asarray(v), sh, 3, "mirror", 0.0, interpret=True
    )
    want = sndi.shift(v.astype(np.float64), sh, order=3, mode="mirror")
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fused_big_shift():
    # shifts beyond the kernel half-width work via zero-padded tap
    # windows (integer shifts compose to a delta kernel off-center)
    rng = np.random.RandomState(3)
    x = rng.randn(40, 40).astype(np.float32)
    for sh, order in (((30.0, 0.0), 2), ((13.7, -9.2), 3)):
        got = interp.shift_spline_fused(
            jnp.asarray(x), sh, order, "mirror", 0.0, interpret=True
        )
        want = sndi.shift(x.astype(np.float64), sh, order=order,
                          mode="mirror")
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fused_declines_giant_shift():
    # a window wider than twice the axis declines (the caller then
    # runs prefilter + shift_fir instead)
    x = jnp.zeros((40, 40), np.float32)
    assert interp.shift_spline_fused(
        x, (120.0, 0.0), 2, "mirror", 0.0, interpret=True
    ) is None


def test_fused_declines_wrong_inputs():
    x64 = jnp.zeros((40, 40), np.float64)
    assert interp.shift_spline_fused(
        x64, (1.0, 1.0), 3, "mirror", 0.0, interpret=True
    ) is None
    x = jnp.zeros((40, 40), np.float32)
    assert interp.shift_spline_fused(
        x, (1.0, 1.0), 1, "mirror", 0.0, interpret=True
    ) is None  # order < 2: no prefilter to fuse
    assert interp.shift_spline_fused(
        x, (1.0, 1.0), 3, "constant", 0.0, interpret=True
    ) is None  # prepadded modes stay on the generic path


@pytest.mark.parametrize("order", [3, 5])
def test_fused_matches_repo_generic_path(order):
    # composition equivalence against this repo's own two-stage path
    # (prefilter scan + shift_fir), not just the scipy oracle
    import cupyimg_tpu.scipy.ndimage as ndi

    rng = np.random.RandomState(2)
    x = rng.randn(48, 51).astype(np.float32)
    sh = (2.3, -1.7)
    via_generic = ndi.shift(x, sh, order=order, mode="reflect")
    fused = interp.shift_spline_fused(
        jnp.asarray(x), sh, order, "reflect", 0.0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(via_generic), atol=2e-4
    )
