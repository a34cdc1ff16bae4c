"""Public-API composition with GSPMD: ops called under jit on
mesh-sharded inputs partition automatically (no shard_map wrapper
needed) and match the single-device oracle.  The parallel/ layer is the
communication-optimal path; this tier proves the baseline story — any
cupyimg_tpu op is safe to use on sharded arrays."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

import scipy.ndimage as sndi

import cupyimg_tpu.scipy.ndimage as ndi


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _sharded(x, mesh, spec):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def _labels(shape, seed=0):
    return (np.random.RandomState(seed).rand(*shape) * 5).astype(np.int32)


@pytest.mark.parametrize("op", ["sum", "mean", "variance",
                                "center_of_mass"])
def test_labeled_measurements_on_sharded(op):
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    x = np.random.RandomState(1).rand(64, 18)
    labels = _labels((64, 18), 2)
    xg = _sharded(x, mesh, spec)
    lg = _sharded(labels, mesh, spec)
    got = getattr(ndi, op)(xg, lg, index=[1, 2, 4])
    exp = getattr(sndi, op)(x, labels, index=[1, 2, 4])
    np.testing.assert_allclose(np.asarray(got, dtype=float),
                               np.asarray(exp, dtype=float), rtol=1e-6)


def test_histogram_on_sharded():
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    x = np.random.RandomState(3).rand(64, 18)
    labels = _labels((64, 18), 4)
    got = ndi.histogram(_sharded(x, mesh, spec), 0.0, 1.0, 6,
                        labels=_sharded(labels, mesh, spec), index=2)
    exp = sndi.histogram(x, 0.0, 1.0, 6, labels=labels, index=2)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_gaussian_filter_jit_on_sharded():
    mesh = _mesh((4, 2), ("x", "y"))
    spec = P("x", "y")
    x = np.random.RandomState(5).rand(48, 32).astype(np.float32)
    xg = _sharded(x, mesh, spec)

    @jax.jit
    def f(v):
        return ndi.gaussian_filter(v, 1.5, mode="reflect")

    got = f(xg)
    exp = sndi.gaussian_filter(x.astype(np.float64), 1.5,
                               mode="reflect").astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=3e-5, atol=3e-5)


def test_binary_closing_jit_on_sharded():
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    m = np.random.RandomState(6).rand(64, 22) > 0.4
    xg = _sharded(m, mesh, spec)

    @jax.jit
    def f(v):
        return ndi.binary_closing(v)

    got = f(xg)
    np.testing.assert_array_equal(np.asarray(got), sndi.binary_closing(m))


def test_label_on_sharded_input():
    # the single-device label algorithm is pure lax, so GSPMD can run it
    # on a sharded input too (the parallel.sharded_label path is the
    # communication-optimal variant)
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    m = np.random.RandomState(7).rand(64, 20) > 0.55
    lab, num = ndi.label(_sharded(m, mesh, spec))
    exp, enum = sndi.label(m)
    assert int(num) == enum
    np.testing.assert_array_equal(np.asarray(lab), exp)
