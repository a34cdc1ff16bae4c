"""scipy >= 1.11 ``axes`` kwarg support across filters, morphology, and
the laplace family — beyond the reference (its scipy era predates
``axes``), oracle = installed scipy 1.17."""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.scipy.ndimage as ndi


def _x(shape=(7, 8, 9), seed=0):
    return np.random.RandomState(seed).rand(*shape)


AXES_CASES = [(0,), (2,), (0, 2), (1, 2), (-1,), (0, -1)]


@pytest.mark.parametrize("axes", AXES_CASES)
def test_uniform_gaussian_axes(axes):
    x = _x()
    got = ndi.uniform_filter(jnp.asarray(x), 3, axes=axes)
    np.testing.assert_allclose(np.asarray(got),
                               sndi.uniform_filter(x, 3, axes=axes),
                               rtol=1e-10)
    got = ndi.gaussian_filter(jnp.asarray(x), 1.2, axes=axes)
    np.testing.assert_allclose(np.asarray(got),
                               sndi.gaussian_filter(x, 1.2, axes=axes),
                               rtol=1e-9)


def test_per_axes_sequences():
    x = _x()
    axes = (0, 2)
    got = ndi.uniform_filter(jnp.asarray(x), (3, 5), origin=(1, -1),
                             mode=("nearest", "wrap"), axes=axes)
    exp = sndi.uniform_filter(x, (3, 5), origin=(1, -1),
                              mode=("nearest", "wrap"), axes=axes)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)


@pytest.mark.parametrize("axes", [(0,), (1, 2)])
def test_minmax_median_axes(axes):
    x = _x(seed=1)
    for fn in (ndi.minimum_filter, ndi.maximum_filter, ndi.median_filter):
        sfn = getattr(sndi, fn.__name__)
        got = fn(jnp.asarray(x), 3, axes=axes)
        np.testing.assert_array_equal(np.asarray(got),
                                      sfn(x, 3, axes=axes),
                                      err_msg=fn.__name__)


def test_footprint_axes_embedding():
    x = _x(seed=2)
    fp = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
    got = ndi.maximum_filter(jnp.asarray(x), footprint=jnp.asarray(fp),
                             axes=(0, 2))
    exp = sndi.maximum_filter(x, footprint=fp, axes=(0, 2))
    np.testing.assert_array_equal(np.asarray(got), exp)
    got = ndi.rank_filter(jnp.asarray(x), 2, footprint=jnp.asarray(fp),
                          axes=(1, 2))
    exp = sndi.rank_filter(x, 2, footprint=fp, axes=(1, 2))
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_correlate_axes():
    x = _x(seed=3)
    w = np.random.RandomState(4).rand(3, 2)
    got = ndi.correlate(jnp.asarray(x), jnp.asarray(w), axes=(0, 2))
    exp = sndi.correlate(x, w, axes=(0, 2))
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)
    got = ndi.convolve(jnp.asarray(x), jnp.asarray(w), axes=(1, 2),
                       origin=(1, 0))
    exp = sndi.convolve(x, w, axes=(1, 2), origin=(1, 0))
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10)


@pytest.mark.parametrize("axes", [(0,), (0, 1)])
def test_binary_morphology_axes(axes):
    m = _x(seed=5) > 0.5
    for fn in (ndi.binary_erosion, ndi.binary_dilation,
               ndi.binary_opening, ndi.binary_closing):
        sfn = getattr(sndi, fn.__name__)
        got = fn(jnp.asarray(m), axes=axes)
        np.testing.assert_array_equal(np.asarray(got), sfn(m, axes=axes),
                                      err_msg=fn.__name__)
    st = np.ones((3,) * len(axes), bool)
    got = ndi.binary_dilation(jnp.asarray(m), jnp.asarray(st),
                              iterations=2, axes=axes)
    exp = sndi.binary_dilation(m, st, iterations=2, axes=axes)
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.parametrize("axes", [(1,), (0, 2)])
def test_grey_morphology_axes(axes):
    x = _x(seed=6)
    sz = (3,) * len(axes)
    for name in ("grey_erosion", "grey_dilation", "grey_opening",
                 "grey_closing", "morphological_gradient",
                 "morphological_laplace", "white_tophat", "black_tophat"):
        got = getattr(ndi, name)(jnp.asarray(x), size=sz, axes=axes)
        exp = getattr(sndi, name)(x, size=sz, axes=axes)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-10,
                                   err_msg=name)


def test_laplace_family_axes():
    x = _x(seed=7)
    for axes in [(0,), (0, 2)]:
        np.testing.assert_allclose(
            np.asarray(ndi.laplace(jnp.asarray(x), axes=axes)),
            sndi.laplace(x, axes=axes), rtol=1e-10)
        sig = tuple(1.1 for _ in axes)
        np.testing.assert_allclose(
            np.asarray(ndi.gaussian_laplace(jnp.asarray(x), sig,
                                            axes=axes)),
            sndi.gaussian_laplace(x, sig, axes=axes), rtol=1e-9)
        # scipy quirk: ggm smooths over ALL axes even with axes given
        np.testing.assert_allclose(
            np.asarray(ndi.gaussian_gradient_magnitude(
                jnp.asarray(x), 1.0, axes=axes)),
            sndi.gaussian_gradient_magnitude(x, 1.0, axes=axes),
            rtol=1e-9)


def test_axes_validation():
    x = jnp.zeros((4, 5))
    with pytest.raises(ValueError):
        ndi.uniform_filter(x, 3, axes=(0, 0))  # duplicate
    with pytest.raises(ValueError):
        ndi.uniform_filter(x, 3, axes=(2,))  # out of range
    with pytest.raises(RuntimeError):
        ndi.uniform_filter(x, (3, 3), axes=(0,))  # wrong seq length
