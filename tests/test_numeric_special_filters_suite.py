"""numpy convolve/correlate, special convex, filters-new, morphology
iteration-validation suites.

Ported from the reference suites
/root/reference/cupyimg/numpy/core/tests/test_numeric.py,
/root/reference/cupyimg/numpy/core/tests/test_convolve_correlate_vs_numpy.py,
/root/reference/cupyimg/scipy/special/tests/test_basic.py,
/root/reference/cupyimg/scipy/ndimage/tests/test_filters_new.py,
/root/reference/cupyimg/scipy/ndimage/tests/test_morphology.py.
Oracles = numpy/scipy run on identical inputs plus the reference's
hard-coded vectors.
"""

import itertools

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal, assert_array_equal
import scipy.special as sp_special
import jax.numpy as jnp

from cupyimg_tpu.numpy import convolve, correlate
import cupyimg_tpu.scipy.special as tspecial
import cupyimg_tpu.scipy.ndimage as tndi


class TestCorrelateNumeric:
    def _setup(self, dt):
        self.x = np.array([1, 2, 3, 4, 5], dtype=dt)
        self.xs = np.arange(1, 20)[::3]
        self.y = np.array([-1, -2, -3], dtype=dt)
        self.z1 = np.array(
            [-3.0, -8.0, -14.0, -20.0, -26.0, -14.0, -5.0], dtype=dt
        )
        self.z1_4 = np.array([-2.0, -5.0, -8.0, -11.0, -14.0, -5.0], dtype=dt)
        self.z1r = np.array(
            [-15.0, -22.0, -22.0, -16.0, -10.0, -4.0, -1.0], dtype=dt
        )
        self.z2 = np.array(
            [-5.0, -14.0, -26.0, -20.0, -14.0, -8.0, -3.0], dtype=dt
        )
        self.z2r = np.array(
            [-1.0, -4.0, -10.0, -16.0, -22.0, -22.0, -15.0], dtype=dt
        )
        self.zs = np.array(
            [-3.0, -14.0, -30.0, -48.0, -66.0, -84.0, -102.0, -54.0, -19.0],
            dtype=dt,
        )

    @pytest.mark.parametrize("dtype", [float, np.float32])
    def test_float(self, dtype):
        self._setup(dtype)
        z = correlate(self.x, self.y, "full")
        assert_array_almost_equal(np.asarray(z), self.z1)
        z = correlate(self.x, self.y[:-1], "full")
        assert_array_almost_equal(np.asarray(z), self.z1_4)
        z = correlate(self.y, self.x, "full")
        assert_array_almost_equal(np.asarray(z), self.z2)
        z = correlate(self.x[::-1], self.y, "full")
        assert_array_almost_equal(np.asarray(z), self.z1r)
        z = correlate(self.y, self.x[::-1], "full")
        assert_array_almost_equal(np.asarray(z), self.z2r)
        z = correlate(self.xs, self.y, "full")
        assert_array_almost_equal(np.asarray(z), self.zs)

    def test_no_overwrite(self):
        d = jnp.ones(100)
        k = jnp.ones(3)
        correlate(d, k)
        assert_array_equal(np.asarray(d), np.ones(100))
        assert_array_equal(np.asarray(k), np.ones(3))

    def test_complex(self):
        x = np.array([1, 2, 3, 4 + 1j], dtype=complex)
        y = np.array([-1, -2j, 3 + 1j], dtype=complex)
        r_z = np.array(
            [3 - 1j, 6, 8 + 1j, 11 + 5j, -5 + 8j, -4 - 1j], dtype=complex
        )
        r_z = r_z[::-1].conj()
        z = correlate(y, x, mode="full")
        assert_array_almost_equal(np.asarray(z), r_z)


class TestConvolveNumeric:
    def test_list_input(self):
        d = [1.0] * 100
        k = [1.0] * 3
        assert_array_almost_equal(
            np.asarray(convolve(d, k))[2:-2], np.full(98, 3)
        )

    def test_no_overwrite(self):
        d = jnp.ones(100)
        k = jnp.ones(3)
        convolve(d, k)
        assert_array_equal(np.asarray(d), np.ones(100))
        assert_array_equal(np.asarray(k), np.ones(3))


@pytest.mark.parametrize(
    "dtype_x, dtype_h, len_x, mode, function",
    itertools.product(
        [np.float32, np.float64],
        [np.float32, np.float64],
        [2, 3, 6, 7],
        ["full", "valid", "same"],
        ["correlate", "convolve"],
    ),
)
def test_convolve_and_correlate(dtype_x, dtype_h, len_x, mode, function):
    x_cpu = np.arange(1, 1 + len_x, dtype=dtype_x)
    for len_h in range(1, len_x):
        h_cpu = np.arange(1, 1 + len_h, dtype=dtype_h)
        func_cpu = getattr(np, function)
        func_tpu = convolve if function == "convolve" else correlate
        y = func_cpu(x_cpu, h_cpu, mode=mode)
        y2 = func_tpu(jnp.asarray(x_cpu), jnp.asarray(h_cpu), mode=mode)
        np.testing.assert_allclose(y, np.asarray(y2), rtol=1e-6)


@pytest.mark.parametrize(
    "dtype_x, dtype_h, len_x, mode, function",
    itertools.product(
        [np.float32, np.complex64, np.float64, np.complex128],
        [np.float32, np.complex64],
        [2, 3, 6, 7],
        ["full", "valid", "same"],
        ["correlate", "convolve"],
    ),
)
def test_convolve_and_correlate_complex(
    dtype_x, dtype_h, len_x, mode, function
):
    x_cpu = np.arange(1, 1 + len_x, dtype=dtype_x)
    if x_cpu.dtype.kind == "c":
        x_cpu = x_cpu + 1j * x_cpu
    for len_h in range(1, len_x):
        h_cpu = np.arange(1, 1 + len_h, dtype=dtype_h)
        if h_cpu.dtype.kind == "c":
            h_cpu = h_cpu + 1j * h_cpu
        func_cpu = getattr(np, function)
        func_tpu = convolve if function == "convolve" else correlate
        y = func_cpu(x_cpu, h_cpu, mode=mode)
        y2 = func_tpu(jnp.asarray(x_cpu), jnp.asarray(h_cpu), mode=mode)
        np.testing.assert_allclose(y, np.asarray(y2), rtol=1e-6)


class TestSpecialConvex:
    def test_huber_basic(self):
        huber = tspecial.huber
        assert float(huber(-1, 1.5)) == np.inf
        np.testing.assert_allclose(float(huber(2, 1.5)), 0.5 * 1.5 ** 2)
        np.testing.assert_allclose(float(huber(2, 2.5)), 2 * (2.5 - 0.5 * 2))

    @pytest.mark.parametrize("dtype", [np.float16, np.float32, np.float64])
    def test_huber(self, dtype):
        rng = np.random.RandomState(0)
        z = rng.rand(10, 2).astype(dtype)
        np.testing.assert_allclose(
            np.asarray(tspecial.huber(z[:, 0], z[:, 1])),
            sp_special.huber(z[:, 0], z[:, 1]),
            rtol=2e-3 if dtype == np.float16 else 1e-6,
        )

    @pytest.mark.parametrize("dtype", [np.float16, np.float32, np.float64])
    def test_entr(self, dtype):
        values = (0, 0.5, 1.0, np.inf)
        signs = [-1, 1]
        arr = [sgn * v for sgn, v in itertools.product(signs, values)]
        z = np.asarray(arr, dtype=dtype)
        np.testing.assert_allclose(
            np.asarray(tspecial.entr(z)), sp_special.entr(z),
            rtol=2e-3 if dtype == np.float16 else 1e-6,
        )

    @pytest.mark.parametrize("dtype", [np.float16, np.float32, np.float64])
    def test_kl_div_grid(self, dtype):
        values = (0, 0.5, 1.0)
        signs = [-1, 1]
        arr = [
            (sgna * va, sgnb * vb)
            for sgna, va, sgnb, vb in itertools.product(
                signs, values, signs, values
            )
        ]
        z = np.array(arr, dtype=dtype)
        np.testing.assert_allclose(
            np.asarray(tspecial.kl_div(z[:, 0], z[:, 1])),
            sp_special.kl_div(z[:, 0], z[:, 1]),
            rtol=2e-3 if dtype == np.float16 else 1e-6,
        )

    @pytest.mark.parametrize("dtype", [np.float16, np.float32, np.float64])
    def test_pseudo_huber(self, dtype):
        rng = np.random.RandomState(1)
        z = rng.rand(10, 2).tolist()
        z = np.asarray(z + [[0, 0.5], [0.5, 0]], dtype=dtype)
        np.testing.assert_allclose(
            np.asarray(tspecial.pseudo_huber(z[:, 0], z[:, 1])),
            sp_special.pseudo_huber(z[:, 0], z[:, 1]),
            rtol=2e-3 if dtype == np.float16 else 1e-6,
        )


@pytest.mark.parametrize(
    "w_spec, func",
    itertools.product(
        ["ones", "sparse", "laplace"],
        [tndi.correlate, tndi.convolve],
    ),
)
def test_convolve_with_masked_weights(w_spec, func):
    w = {
        "ones": np.ones((5, 5), dtype=float),
        "sparse": np.asarray([[1, 0], [0, 0], [0, -1]]),
        "laplace": np.asarray([[0, -1, 0], [-1, 4, -1], [0, -1, 0]]),
    }[w_spec]
    rstate = np.random.RandomState(5)
    x = rstate.randn(16, 7)
    y1 = func(x, w, use_weights_mask=False)
    y2 = func(x, w, use_weights_mask=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize(
    "dtype, func",
    itertools.product(
        [np.float32, np.float64, np.complex64, np.complex128],
        [tndi.correlate, tndi.convolve],
    ),
)
def test_convolve_precision(dtype, func):
    rstate = np.random.RandomState(5)
    x = rstate.randn(16, 7).astype(dtype)
    w = rstate.randn(3, 4).astype(dtype)

    y1 = func(x, w, dtype_mode="ndimage")
    assert np.asarray(y1).dtype == x.dtype
    y2 = func(x, w, dtype_mode="float")
    assert np.asarray(y2).dtype == x.dtype
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4)


@pytest.mark.parametrize(
    "dtype, func",
    itertools.product(
        [np.float32, np.float64, np.complex64, np.complex128],
        [tndi.correlate1d, tndi.convolve1d],
    ),
)
def test_convolve1d_precision(dtype, func):
    rstate = np.random.RandomState(5)
    x = rstate.randn(16, 7).astype(dtype)
    w = rstate.randn(5).astype(dtype)

    y1 = func(x, w, dtype_mode="ndimage")
    assert np.asarray(y1).dtype == x.dtype
    y2 = func(x, w, dtype_mode="float")
    assert np.asarray(y2).dtype == x.dtype
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4)


@pytest.mark.parametrize(
    "op",
    ["binary_erosion", "binary_dilation", "binary_opening",
     "binary_closing"],
)
def test_binary_noninteger_iterations(op):
    # scipy gh-9905/gh-9909 regression: TypeError for non-integer iterations
    data = np.ones([1])
    with pytest.raises(TypeError):
        getattr(tndi, op)(data, iterations=0.5)
    with pytest.raises(TypeError):
        getattr(tndi, op)(data, iterations=1.5)


@pytest.mark.parametrize(
    "op",
    ["binary_erosion", "binary_dilation", "binary_opening",
     "binary_closing"],
)
def test_binary_integerlike_iterations_pass(op):
    data = np.ones([1])
    for it in (1, 2, np.int32(2), True):
        getattr(tndi, op)(data, iterations=it)
