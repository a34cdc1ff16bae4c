"""Dense fused Pallas correlate (ops/pallas_stencil.fused_dense_correlate)
and its dispatch through scipy.ndimage.correlate / scipy.signal.

The lax.conv route it replaces was measured ~500x slower on v5e and
crashed the TPU runtime at 31x31 kernels; these tests pin the Pallas
engine to scipy f64 (tolerance scaled by sqrt(nnz) for f32 accumulation)
across modes, shapes, and origins.  Reference: the generated dense nd
stencil, cupyimg/scipy/ndimage/_filters_core.py:190-348.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.ndimage as sndi

from cupyimg_tpu.ops import pallas_stencil as ps
import cupyimg_tpu.scipy.ndimage as ndi
import cupyimg_tpu.scipy.signal as signal


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _check(x, w, mode, cval=0.0, origins=None):
    origins = origins or [0] * x.ndim
    out = ps.fused_dense_correlate(
        jnp.asarray(x), w, origins, mode, cval, interpret=True
    )
    ref = sndi.correlate(
        x.astype(np.float64), w.astype(np.float64), mode=mode,
        cval=cval, origin=origins,
    )
    tol = 3e-6 * max(1.0, np.sqrt(np.count_nonzero(w))) * max(
        1.0, np.abs(ref).max()
    )
    assert np.abs(np.asarray(out, np.float64) - ref).max() < tol


@pytest.mark.parametrize("mode", ["reflect", "constant", "nearest",
                                  "mirror", "wrap", "grid-wrap"])
@pytest.mark.parametrize("wshape", [(7, 7), (5, 9), (31, 31)])
def test_dense_2d(rng, mode, wshape):
    x = rng.rand(200, 300).astype(np.float32)
    w = rng.randn(*wshape).astype(np.float32)
    w[np.abs(w) < 0.3] = 0.0  # exercises static zero-tap skipping
    _check(x, w, mode, cval=1.5)


@pytest.mark.parametrize("mode", ["reflect", "constant", "grid-wrap"])
def test_dense_3d(rng, mode):
    x = rng.rand(40, 50, 60).astype(np.float32)
    w = rng.randn(3, 5, 7).astype(np.float32)
    _check(x, w, mode)


def test_dense_origins(rng):
    x = rng.rand(150, 170).astype(np.float32)
    w = rng.randn(4, 6).astype(np.float32)
    _check(x, w, "reflect", origins=[1, -2])


def test_api_dispatch_correlate(rng):
    # jnp weights through the public API must match scipy (on CPU the
    # Pallas gate is off; this pins the dispatch path end to end)
    x = rng.rand(64, 80).astype(np.float32)
    w = rng.randn(9, 9).astype(np.float32)
    out = ndi.correlate(jnp.asarray(x), jnp.asarray(w), mode="reflect",
                        dtype_mode="float")
    ref = sndi.correlate(x.astype(np.float64), w.astype(np.float64),
                         mode="reflect")
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 1e-4


def test_signal_direct_big_kernel(rng):
    x = rng.rand(128, 140).astype(np.float32)
    w = rng.randn(15, 15).astype(np.float32)
    out = signal.convolve(jnp.asarray(x), jnp.asarray(w), mode="same",
                          method="direct")
    import scipy.signal as ssig

    ref = ssig.convolve(x.astype(np.float64), w.astype(np.float64),
                        mode="same", method="direct")
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 2e-4


def test_supports_dense_gates():
    x = jnp.zeros((64, 64), jnp.float32)
    assert not ps.supports_dense(x, jnp.ones((3, 3)), interpret=True)
    assert not ps.supports_dense(
        x, np.zeros((3, 3), np.float32), interpret=True
    )
    assert not ps.supports_dense(
        x, np.ones((60, 60), np.float32), interpret=True
    )  # tap cap
    assert ps.supports_dense(
        x, np.ones((31, 31), np.float32), interpret=True
    )
