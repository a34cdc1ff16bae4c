"""Autodiff tier: smooth ops are differentiable under jax.grad (a
capability the CUDA reference cannot offer), with finite-difference
oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndi
import cupyimg_tpu.scipy.signal as csig


def _x(shape=(16, 17), seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape))


def _fd(f, x, idx, eps=1e-6):
    x2 = x.at[idx].add(eps)
    x3 = x.at[idx].add(-eps)
    return (f(x2) - f(x3)) / (2 * eps)


@pytest.mark.parametrize("op", [
    lambda v: ndi.gaussian_filter(v, 1.5),
    lambda v: ndi.uniform_filter(v, 3),
    lambda v: ndi.correlate(v, jnp.ones((3, 4)) / 12.0),
    lambda v: ndi.sobel(v, axis=0),
    lambda v: ndi.shift(v, (1.3, -0.7), order=1),
    lambda v: ndi.zoom(v, 1.3, order=3),
])
def test_grad_through_ops_matches_fd(op):
    x = _x()

    def f(v):
        return jnp.sum(op(v) ** 2)

    g = jax.grad(f)(x)
    assert bool(jnp.isfinite(g).all())
    for idx in [(5, 5), (0, 0), (15, 16)]:
        np.testing.assert_allclose(float(g[idx]), float(_fd(f, x, idx)),
                                   rtol=2e-4, atol=1e-7)


def test_grad_wrt_warp_coordinates():
    x = _x(seed=1)
    r, c = jnp.mgrid[0:16, 0:17].astype(jnp.float64)

    def h(dr):
        coords = jnp.stack([r + dr, c - 0.5 * dr])
        return jnp.sum(ndi.map_coordinates(x, coords, order=1) ** 2)

    g = jax.grad(h)(0.3)
    fd = (h(0.3 + 1e-6) - h(0.3 - 1e-6)) / 2e-6
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_grad_through_fftconvolve():
    x = _x((24, 25), seed=2)
    k = jnp.asarray(np.random.RandomState(3).rand(5, 5))

    def f(v):
        return jnp.sum(csig.fftconvolve(v, k, mode="same") ** 2)

    g = jax.grad(f)(x)
    assert bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(float(g[7, 7]),
                               float(_fd(f, x, (7, 7), eps=1e-6)),
                               rtol=2e-4)


def test_grad_through_ssim():
    from cupyimg_tpu.skimage.metrics import structural_similarity

    a = _x((32, 32), seed=4)
    b = _x((32, 32), seed=5)

    def f(v):
        return structural_similarity(v, b, data_range=1.0)

    g = jax.grad(f)(a)
    assert g.shape == a.shape and bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(float(g[10, 10]),
                               float(_fd(f, a, (10, 10), eps=1e-6)),
                               rtol=5e-4, atol=1e-9)


def test_vmap_over_batch():
    xb = jnp.asarray(np.random.RandomState(6).rand(4, 12, 13))
    out = jax.vmap(lambda v: ndi.gaussian_filter(v, 1.0))(xb)
    ref = jnp.stack([ndi.gaussian_filter(xb[i], 1.0) for i in range(4)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12)
