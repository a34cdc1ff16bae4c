"""Flagship pipeline tests (cupyimg_tpu.models): the graft entry's
forward step, its sharded variant on the virtual mesh, and the
Richardson-Lucy step identity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

import scipy.ndimage as sndi

from cupyimg_tpu import models


def _vol(shape=(4, 32, 24), seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_edge_enhance_matches_scipy_composition():
    x = _vol((24, 25), 1)
    got = np.asarray(models.edge_enhance_pipeline(jnp.asarray(x),
                                                  sigma=1.5, amount=0.7))
    sm = sndi.gaussian_filter(x.astype(np.float64), 1.5)
    grad = np.zeros_like(sm)
    for ax in range(2):
        d = sndi.sobel(sm, axis=ax)
        grad += d * d
    exp = 1.7 * x - 0.7 * sm + 0.1 * np.sqrt(grad)
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-4)


def test_edge_enhance_jits():
    x = jnp.asarray(_vol((16, 17, 18), 2))
    f = jax.jit(models.edge_enhance_pipeline)
    out = f(x)
    # jit fusion reorders f32 arithmetic slightly
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(models.edge_enhance_pipeline(x)),
                               rtol=1e-5, atol=1e-5)


def test_sharded_edge_enhance_matches_single_device():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("batch", "x"))
    spec = P("batch", "x", None)
    x = _vol((4, 32, 9), 3)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = np.asarray(models.sharded_edge_enhance(xg, mesh, spec, sigma=1.0))
    # single-device reference: same math per batch element
    exp = []
    for v in x:
        sm = sndi.gaussian_filter(v.astype(np.float64), 1.0)
        d0 = sndi.correlate1d(
            sndi.correlate1d(sm, [1.0, 0.0, -1.0], axis=0),
            [1.0, 2.0, 1.0], axis=1)
        d1 = sndi.correlate1d(
            sndi.correlate1d(sm, [1.0, 2.0, 1.0], axis=0),
            [1.0, 0.0, -1.0], axis=1)
        grad = np.sqrt(d0 * d0 + d1 * d1).astype(np.float32)
        sm = sm.astype(np.float32)
        exp.append(1.7 * v - 0.7 * sm + 0.1 * grad)
    np.testing.assert_allclose(got, np.stack(exp), rtol=2e-4, atol=2e-4)


def test_richardson_lucy_step_preserves_flat():
    # a flat estimate under a normalized PSF and matching image is a
    # fixed point of the RL update
    est = jnp.full((16, 16), 2.0)
    psf = np.zeros((16, 16))
    psf[:3, :3] = 1.0 / 9.0
    psf = np.roll(psf, (-1, -1), (0, 1))
    pf = jnp.fft.rfftn(jnp.asarray(psf))
    out = models.richardson_lucy_step(est, est, pf, jnp.conj(pf))
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)
