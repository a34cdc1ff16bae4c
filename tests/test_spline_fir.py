"""Spline-prefilter FIR fast path (ops/iir.spline_filter_fir) vs the
exact sequential IIR scan, on CPU via Pallas interpret mode.

The FIR path truncates each pole's symmetric-exponential impulse
response at |z|^nb < 1e-10 — the same tolerance the scan path applies
to its boundary-initialization sums — so the two agree to f32 roundoff.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.ops import iir


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize("mode", ["mirror", "reflect", "grid-wrap"])
def test_fir_matches_scan(order, mode):
    rng = np.random.RandomState(order)
    x = rng.rand(80, 140).astype(np.float32)
    ref = jnp.asarray(x)
    for ax in range(2):
        ref = iir.spline_filter1d(ref, order, ax, mode)
    got = iir.spline_filter_fir(
        jnp.asarray(x), order, (0, 1), mode, interpret=True
    )
    assert got is not None
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fir_single_axis():
    rng = np.random.RandomState(9)
    x = rng.rand(64, 96).astype(np.float32)
    ref = iir.spline_filter1d(jnp.asarray(x), 3, 1, "mirror")
    got = iir.spline_filter_fir(
        jnp.asarray(x), 3, (1,), "mirror", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fir_rejects_f64():
    x = jnp.asarray(np.random.rand(64, 64))
    assert iir.spline_filter_fir(x, 3, (0, 1), "mirror",
                                 interpret=True) is None
