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
import cupyimg_tpu.scipy.ndimage.interpolation as tinterp


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


def test_reflect_prefilter_exact_vs_collocation():
    """Short-axis reflect prefilter: we solve the collocation system
    exactly (closed-form periodic boundary sums), where scipy's own
    reflect init truncates (scipy diverges from the exact solution by
    ~2e-4 at n=4, order=5; ours by ~1e-14).  Oracle: direct solve of
    sum_k B_order(k) c[reflect(i+k)] = x[i]."""
    from scipy.interpolate import BSpline

    rs = np.random.RandomState(3)

    def bspline_int_weights(order):
        b = BSpline.basis_element(
            np.arange(order + 2) - (order + 1) / 2.0
        )
        xs = np.arange(-(order // 2) - 1, order // 2 + 2)
        w = np.where(
            np.abs(xs) <= (order + 1) / 2.0, b(xs.astype(float)), 0.0
        )
        return xs, np.nan_to_num(w)

    def refl(i, n):
        i = i % (2 * n)
        return i if i < n else 2 * n - 1 - i

    for n, order in [(4, 5), (5, 4), (5, 5), (9, 3), (16, 5)]:
        x = rs.randn(n)
        xs, w = bspline_int_weights(order)
        B = np.zeros((n, n))
        for i in range(n):
            for dx, ww in zip(xs, w):
                if ww:
                    B[i, refl(i + dx, n)] += ww
        c_exact = np.linalg.solve(B, x)
        got = np.asarray(
            tinterp.spline_filter1d(
                jnp.asarray(x), order=order, axis=0, mode="reflect",
                allow_float32=False,
            )
        )
        np.testing.assert_allclose(got, c_exact, rtol=1e-10, atol=1e-10)
