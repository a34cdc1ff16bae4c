"""Routing-based map_coordinates kernel (ops/warp_gather.py).

Interpret-mode runs on the CPU backend; oracles are scipy (f64,
prefilter=False) for the modes whose tap family matches scipy exactly,
and the library's own dense-gather engine (ops/interp.gather_general)
everywhere — the kernel must reproduce the dense path to float noise.
Reference behavior: cupyimg map_coordinates kernels,
cupyimg/scipy/ndimage/_interp_kernels.py:186-213, 595-621.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.ndimage as sndi

from cupyimg_tpu.ops import interp, warp_gather


@pytest.fixture(scope="module")
def image():
    return np.random.RandomState(0).rand(300, 280).astype(np.float32)


def _warp(kind, H=260, W=300):
    ii, jj = np.mgrid[0:H, 0:W].astype(np.float64)
    if kind == "identityish":
        return (ii * 0.97 + 2.1 + 3 * np.sin(jj / 40),
                jj * 0.99 - 1.3 + 2 * np.cos(ii / 30))
    if kind == "swirlish":
        return (ii + 6 * np.sin(jj / 25) * np.cos(ii / 35),
                jj + 5 * np.cos(jj / 30))
    if kind == "translate":
        return ii + 17.25, jj - 8.6
    if kind == "minify":
        return ii * 1.7 + 1.0, jj * 1.45 - 2.0
    if kind == "oob":
        return ii * 1.2 - 30.0, jj * 1.2 - 40.0
    raise ValueError(kind)


def _run(image, kind, order, mode):
    r, c = _warp(kind)
    coords = [jnp.asarray(r, jnp.float32), jnp.asarray(c, jnp.float32)]
    out = warp_gather.map_gather_2d(
        jnp.asarray(image), coords, order, mode, 0.0, interpret=True
    )
    assert out is not None
    return np.asarray(out, np.float64), (r, c), coords


@pytest.mark.parametrize("kind", ["identityish", "swirlish", "minify"])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_vs_scipy_reflect(image, kind, order):
    got, (r, c), _ = _run(image, kind, order, "reflect")
    ref = sndi.map_coordinates(
        image.astype(np.float64), np.stack([r, c]), order=order,
        mode="reflect", prefilter=False,
    )
    err = np.abs(got - ref)
    if order == 0:
        assert (err > 1e-6).mean() < 2e-3
    else:
        assert err.max() < 3e-4, err.max()


@pytest.mark.parametrize("mode", ["constant", "grid-constant", "wrap",
                                  "grid-wrap", "mirror", "nearest"])
def test_vs_scipy_modes_order1(image, mode):
    got, (r, c), _ = _run(image, "oob", 1, mode)
    ref = sndi.map_coordinates(
        image.astype(np.float64), np.stack([r, c]), order=1,
        mode=mode, cval=0.0, prefilter=False,
    )
    assert np.abs(got - ref).max() < 3e-4


@pytest.mark.parametrize("kind", ["identityish", "translate", "oob"])
@pytest.mark.parametrize("order", [1, 3])
@pytest.mark.parametrize("mode", ["constant", "nearest", "grid-wrap"])
def test_vs_dense_gather(image, kind, order, mode):
    # the kernel must reproduce the library's own dense engine (incl.
    # the documented spline-boundary approximations) to float noise
    got, _, coords = _run(image, kind, order, mode)
    ref = np.asarray(
        interp.gather_general(
            jnp.asarray(image), coords, order, mode, 0.0
        ),
        np.float64,
    )
    if mode == "constant":
        mask = np.asarray(
            (coords[0] < 0) | (coords[0] > image.shape[0] - 1)
            | (coords[1] < 0) | (coords[1] > image.shape[1] - 1)
        )
        ref = np.where(mask, 0.0, ref)
    assert np.abs(got - ref).max() < 2e-5


def test_fallback_cond_scattered(image):
    # scattered coordinates break per-tile locality: the lax.cond picks
    # the dense path and the result must still be exact
    rng = np.random.RandomState(1)
    r = rng.uniform(0, image.shape[0] - 1, size=(192, 256))
    c = rng.uniform(0, image.shape[1] - 1, size=(192, 256))
    coords = [jnp.asarray(r, jnp.float32), jnp.asarray(c, jnp.float32)]
    out = warp_gather.map_gather_2d(
        jnp.asarray(image), coords, 1, "reflect", 0.0, interpret=True
    )
    ref = interp.gather_general(jnp.asarray(image), coords, 1,
                                "reflect", 0.0)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_jittable(image):
    import jax

    r, c = _warp("identityish")
    coords = [jnp.asarray(r, jnp.float32), jnp.asarray(c, jnp.float32)]

    @jax.jit
    def f(img, r, c):
        out = warp_gather.map_gather_2d(
            img, [r, c], 1, "reflect", 0.0, interpret=True
        )
        assert out is not None
        return out

    got = f(jnp.asarray(image), *coords)
    ref = warp_gather.map_gather_2d(
        jnp.asarray(image), coords, 1, "reflect", 0.0, interpret=True
    )
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() == 0.0


def test_gates():
    x = jnp.zeros((64, 64), jnp.float32)
    c = [jnp.zeros((8, 8), jnp.float32)] * 2
    assert warp_gather.map_gather_2d(x, c, 2, "reflect", 0.0,
                                     interpret=True) is None
    assert warp_gather.map_gather_2d(x, c, 1, "bogus", 0.0,
                                     interpret=True) is None
