"""Sharded filtering on an 8-device virtual CPU mesh vs single-device oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

import scipy.ndimage as ndi
from cupyimg_tpu import parallel


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mode", ["reflect", "nearest", "constant", "wrap",
                                  "mirror"])
def test_sharded_uniform_filter_1axis(mode):
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(0).randn(64, 17).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_uniform_filter(xg, 5, mesh, spec, mode=mode,
                                          cval=2.0)
    exp = ndi.uniform_filter(
        x.astype(np.float64), size=5, mode=mode, cval=2.0
    ).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["reflect", "wrap"])
def test_sharded_gaussian_2d_mesh(mode):
    mesh = _mesh((4, 2), ("x", "y"))
    x = np.random.RandomState(1).randn(48, 32).astype(np.float32)
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_gaussian_filter(xg, 1.5, mesh, spec, mode=mode)
    exp = ndi.gaussian_filter(x.astype(np.float64), 1.5, mode=mode).astype(
        np.float32
    )
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


def test_sharded_batch_plus_spatial():
    """dp (batch) x sp (spatial) mesh — the flagship sharding layout."""
    mesh = _mesh((2, 4), ("batch", "x"))
    x = np.random.RandomState(2).randn(4, 32, 9).astype(np.float32)
    spec = P("batch", "x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_uniform_filter(
        xg, (1, 5, 3), mesh, spec, mode="reflect"
    )
    exp = np.stack(
        [
            ndi.uniform_filter(v.astype(np.float64), size=(5, 3)).astype(
                np.float32
            )
            for v in x
        ]
    )
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


def test_jit_sharded():
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    x = np.random.RandomState(3).randn(64, 16).astype(np.float32)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    @jax.jit
    def f(v):
        return parallel.sharded_uniform_filter(v, 3, mesh, spec)

    got = f(xg)
    exp = ndi.uniform_filter(x.astype(np.float64), size=3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)
    # output keeps the sharding
    assert got.sharding.spec == spec


@pytest.mark.parametrize("is_min", [True, False])
def test_sharded_min_max(is_min):
    mesh = _mesh((4, 2), ("x", "y"))
    x = np.random.RandomState(3).randn(40, 24).astype(np.float32)
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    fn = (
        parallel.sharded_minimum_filter
        if is_min
        else parallel.sharded_maximum_filter
    )
    got = fn(xg, 5, mesh, spec, mode="reflect")
    oracle = ndi.minimum_filter if is_min else ndi.maximum_filter
    exp = oracle(x, size=5, mode="reflect")
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_sharded_median():
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(4).randn(64, 19).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_median_filter(xg, 3, mesh, spec,
                                         mode="nearest")
    exp = ndi.median_filter(x, size=3, mode="nearest")
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_sharded_fftconvolve_batch():
    import scipy.signal as ss

    mesh = _mesh((8,), ("batch",))
    x = np.random.RandomState(5).randn(8, 24, 25).astype(np.float32)
    k = np.random.RandomState(6).randn(5, 5).astype(np.float32)
    spec = P("batch", None, None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_fftconvolve(xg, jnp.asarray(k), mesh, spec)
    exp = np.stack(
        [ss.fftconvolve(v, k, mode="same") for v in x]
    )
    np.testing.assert_allclose(
        np.asarray(got), exp, rtol=1e-4, atol=1e-4
    )
    with pytest.raises(ValueError):
        parallel.sharded_fftconvolve(
            xg, jnp.asarray(k), mesh, P(None, "batch", None)
        )


@pytest.mark.parametrize("connectivity_box", [False, True])
def test_sharded_label_2d(connectivity_box):
    mesh = _mesh((8,), ("x",))
    spec = P("x", None)
    rng = np.random.RandomState(3)
    x = rng.rand(64, 50) > 0.6
    structure = np.ones((3, 3)) if connectivity_box else None
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    lab, num = parallel.sharded_label(xg, mesh, spec, structure=structure)
    exp, enum = ndi.label(x, structure=structure)
    assert int(num) == enum
    np.testing.assert_array_equal(np.asarray(lab), exp)


def test_sharded_label_3d_spanning_components():
    mesh = _mesh((8,), ("x",))
    spec = P("x", None, None)
    # a snake crossing every shard boundary forces multi-round merging
    x = np.zeros((32, 9, 7), bool)
    x[:, 4, 3] = True          # vertical column through all shards
    x[::3, :, 3] = True        # combs off the column
    x[5, 1, 1] = True          # isolated voxel
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    lab, num = parallel.sharded_label(xg, mesh, spec)
    exp, enum = ndi.label(x)
    assert int(num) == enum
    np.testing.assert_array_equal(np.asarray(lab), exp)


def test_sharded_label_axis1():
    mesh = _mesh((8,), ("x",))
    rs = np.random.RandomState(21)
    m = rs.rand(24, 32) > 0.55
    spec = P(None, "x")
    xg = jax.device_put(jnp.asarray(m), NamedSharding(mesh, spec))
    labels, num = parallel.sharded_label(xg, mesh, spec)
    exp_labels, exp_num = ndi.label(m)
    assert int(num) == exp_num
    np.testing.assert_array_equal(np.asarray(labels), exp_labels)


def test_sharded_label_2d_tiles():
    mesh = _mesh((4, 2), ("x", "y"))
    rs = np.random.RandomState(22)
    m = rs.rand(40, 36) > 0.5
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(m), NamedSharding(mesh, spec))
    labels, num = parallel.sharded_label(xg, mesh, spec)
    exp_labels, exp_num = ndi.label(m)
    assert int(num) == exp_num
    np.testing.assert_array_equal(np.asarray(labels), exp_labels)


def test_sharded_label_2d_tiles_full_structure():
    mesh = _mesh((2, 2, 2), ("x", "y", "z"))
    rs = np.random.RandomState(23)
    m = rs.rand(16, 12, 10) > 0.6
    spec = P("x", "y", "z")
    s8 = np.ones((3, 3, 3), bool)
    xg = jax.device_put(jnp.asarray(m), NamedSharding(mesh, spec))
    labels, num = parallel.sharded_label(xg, mesh, spec, structure=s8)
    exp_labels, exp_num = ndi.label(m, structure=s8)
    assert int(num) == exp_num
    np.testing.assert_array_equal(np.asarray(labels), exp_labels)


def test_sharded_label_validates_spec():
    mesh = _mesh((8,), ("x",))
    with pytest.raises(ValueError):
        parallel.sharded_label(
            jnp.zeros((16, 16)), mesh, P(None, None)
        )


@pytest.mark.parametrize("mode", ["reflect", "wrap", "constant"])
def test_sharded_dense_correlate(mode):
    mesh = _mesh((4, 2), ("x", "y"))
    rs = np.random.RandomState(5)
    x = rs.randn(48, 40).astype(np.float32)
    w = rs.randn(5, 7).astype(np.float32)
    w[np.abs(w) < 0.3] = 0.0
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_correlate(xg, w, mesh, spec, mode=mode,
                                     cval=1.5)
    exp = ndi.correlate(x.astype(np.float64), w.astype(np.float64),
                        mode=mode, cval=1.5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


def test_sharded_convolve_origin():
    mesh = _mesh((8,), ("x",))
    rs = np.random.RandomState(6)
    x = rs.randn(64, 21).astype(np.float32)
    w = rs.randn(4, 3).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_convolve(xg, w, mesh, spec, mode="nearest",
                                    origin=(1, 0))
    exp = ndi.convolve(x.astype(np.float64), w.astype(np.float64),
                       mode="nearest", origin=(1, 0)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("border_value", [0, 1])
def test_sharded_binary_erosion_dilation(border_value):
    mesh = _mesh((8,), ("x",))
    rs = np.random.RandomState(7)
    x = rs.rand(64, 33) > 0.4
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    st = ndi.generate_binary_structure(2, 2)
    got_e = parallel.sharded_binary_erosion(
        xg, st, mesh=mesh, spec=spec, border_value=border_value
    )
    exp_e = ndi.binary_erosion(x, st, border_value=border_value)
    np.testing.assert_array_equal(np.asarray(got_e), exp_e)
    got_d = parallel.sharded_binary_dilation(
        xg, st, mesh=mesh, spec=spec, border_value=border_value
    )
    exp_d = ndi.binary_dilation(x, st, border_value=border_value)
    np.testing.assert_array_equal(np.asarray(got_d), exp_d)


def test_sharded_binary_default_structure():
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(8).rand(32, 19) > 0.5
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_binary_erosion(xg, mesh=mesh, spec=spec)
    exp = ndi.binary_erosion(x)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_sharded_map_overlap_custom_fn():
    # user-provided local op through the generic primitive: a 3x3 mean
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(9).randn(64, 24).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    def local_mean3(ext):
        acc = sum(
            ext[i : ext.shape[0] - 2 + i, j : ext.shape[1] - 2 + j]
            for i in range(3)
            for j in range(3)
        ) / 9.0
        return jnp.pad(acc, ((1, 1), (1, 1)))

    got = parallel.sharded_map_overlap(
        local_mean3, xg, 1, mesh, spec, mode="reflect"
    )
    exp = ndi.uniform_filter(x.astype(np.float64), 3,
                             mode="reflect").astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["reflect", "constant", "nearest",
                                  "grid-wrap"])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_sharded_shift(order, mode):
    mesh = _mesh((4,), ("x",))
    x = np.random.RandomState(7).randn(128, 19).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_shift(xg, (2.3, -1.7), mesh, spec, order=order,
                                 mode=mode, cval=0.5)
    exp = ndi.shift(x.astype(np.float64), (2.3, -1.7), order=order,
                    mode=mode, cval=0.5)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("order", [1, 3])
def test_sharded_map_coordinates_smooth_warp(order):
    mesh = _mesh((2, 2), ("x", "y"))
    n0, n1 = 96, 80
    x = np.random.RandomState(8).randn(n0, n1).astype(np.float32)
    r, c = np.mgrid[0:n0, 0:n1].astype(np.float64)
    coords = np.stack([
        r + 2.0 * np.sin(c / 13.0),
        c - 1.5 * np.cos(r / 11.0),
    ])
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    cg = jax.device_put(jnp.asarray(coords),
                        NamedSharding(mesh, P(None, "x", "y")))
    got = parallel.sharded_map_coordinates(
        xg, cg, mesh, spec, max_displacement=2.0, order=order,
        mode="reflect",
    )
    exp = ndi.map_coordinates(x.astype(np.float64), coords, order=order,
                              mode="reflect")
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


def test_sharded_map_coordinates_constant_edge():
    mesh = _mesh((4,), ("x",))
    n0, n1 = 128, 17
    x = np.random.RandomState(9).randn(n0, n1).astype(np.float32)
    r, c = np.mgrid[0:n0, 0:n1].astype(np.float64)
    coords = np.stack([r - 2.5, c + 1.25])  # pushes past both edges
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    cg = jax.device_put(jnp.asarray(coords),
                        NamedSharding(mesh, P(None, "x", None)))
    got = parallel.sharded_map_coordinates(
        xg, cg, mesh, spec, max_displacement=2.5, order=1,
        mode="constant", cval=3.5,
    )
    exp = ndi.map_coordinates(x.astype(np.float64), coords, order=1,
                              mode="constant", cval=3.5)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5, atol=2e-5)


def test_sharded_shift_legacy_wrap_rejected():
    mesh = _mesh((4,), ("x",))
    x = jnp.zeros((64, 8), jnp.float32)
    with pytest.raises(NotImplementedError):
        parallel.sharded_shift(x, (1.0, 0.0), mesh, P("x", None),
                               mode="wrap")


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("mode", ["reflect", "constant", "nearest"])
def test_sharded_affine_small_rotation(order, mode):
    mesh = _mesh((2, 2), ("x", "y"))
    n0, n1 = 96, 88
    x = np.random.RandomState(11).randn(n0, n1).astype(np.float32)
    th = np.deg2rad(2.0)
    c = np.array([(n0 - 1) / 2, (n1 - 1) / 2])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    off = c - R @ c
    spec = P("x", "y")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_affine_transform(
        xg, R, off, mesh, spec, order=order, mode=mode, cval=1.5,
    )
    exp = ndi.affine_transform(x.astype(np.float64), R, off, order=order,
                               mode=mode, cval=1.5)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# transpose-based distributed FFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sh_ax", [0, 1])
def test_sharded_fft2_vs_numpy(sh_ax):
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(2).randn(64, 48).astype(np.float32)
    spec = P("x", None) if sh_ax == 0 else P(None, "x")
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_fft2(xg, mesh, spec)
    exp = np.fft.fft2(x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-3)


def test_sharded_fft2_roundtrip_transposed():
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(3).randn(32, 64).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    F = parallel.sharded_fft2(xg, mesh, spec, transposed_out=True)
    # F is sharded along axis 1 now; invert from that layout
    back = parallel.sharded_fft2(F, mesh, P(None, "x"), inverse=True)
    np.testing.assert_allclose(
        np.asarray(jnp.real(back)), x, rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", ["same", "full"])
def test_sharded_fftconvolve2d_spatial(mode):
    import scipy.signal as ssig

    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(4).randn(72, 40).astype(np.float32)
    k = np.random.RandomState(5).randn(9, 7).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    got = parallel.sharded_fftconvolve2d_spatial(xg, jnp.asarray(k), mesh,
                                                 spec, mode=mode)
    exp = ssig.fftconvolve(x.astype(np.float64), k.astype(np.float64),
                           mode=mode)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-4, atol=2e-4)


def test_sharded_median_5x5_and_7x3():
    mesh = _mesh((8,), ("x",))
    x = np.random.RandomState(6).randn(64, 33).astype(np.float32)
    spec = P("x", None)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    for size in ((5, 5), (7, 3)):
        got = parallel.sharded_median_filter(xg, size, mesh, spec)
        exp = ndi.median_filter(x, size=size)
        np.testing.assert_array_equal(np.asarray(got), exp)
