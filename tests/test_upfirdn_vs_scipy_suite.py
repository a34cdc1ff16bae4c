"""upfirdn vs scipy.signal suite — TPU-native port.

Ports /root/reference/cupyimg/scipy/signal/tests/test_upfirdn_vs_scipy.py
(which drove the external fast_upfirdn CUDA extension) against the
first-party polyphase upfirdn (scipy/signal/_upfirdn.py): dtype combos,
every input/filter length pairing, all up/down factors, nd axes.
float16 data is promoted (TPU tier computes f32; the CPU parity tier
follows scipy's promotion).
"""

import itertools

import numpy as np
import pytest
import scipy.signal as ssig

import jax.numpy as jnp

from cupyimg_tpu.scipy.signal import upfirdn


def _assert_same(y_cpu, y_dev, **kw):
    np.testing.assert_allclose(y_cpu, np.asarray(y_dev), **kw)


@pytest.mark.parametrize(
    "dtype_data, dtype_filter",
    itertools.product(
        [
            np.float32, np.float64, np.complex64, np.complex128,
            np.float16, np.uint8, np.int16, np.int32, int,
        ],
        [np.float32, np.float64, np.complex64, np.complex128],
    ),
)
def test_dtype_combos(dtype_data, dtype_filter):
    shape = (64, 64)
    size = int(np.prod(shape))
    x_cpu = np.arange(size, dtype=dtype_data).reshape(shape)
    h_cpu = np.arange(5, dtype=dtype_filter)
    x = jnp.asarray(x_cpu)
    h = jnp.asarray(h_cpu)

    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=1, down=2),
        upfirdn(h, x, up=1, down=2), rtol=1e-5,
    )
    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=2, down=1),
        upfirdn(h, x, up=2, down=1), rtol=1e-5,
    )


@pytest.mark.parametrize(
    "nh, nx",
    itertools.product([2, 3, 4, 5, 6, 7, 8], [16, 17, 18, 19, 20]),
)
def test_input_and_filter_sizes(nh, nx):
    x_cpu = np.arange(nx, dtype=np.float32)
    h_cpu = np.arange(1, nh + 1, dtype=np.float32)
    x, h = jnp.asarray(x_cpu), jnp.asarray(h_cpu)

    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=1, down=2),
        upfirdn(h, x, up=1, down=2), rtol=1e-6,
    )
    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=2, down=1),
        upfirdn(h, x, up=2, down=1), rtol=1e-6,
    )


@pytest.mark.parametrize("down", [1, 2, 3, 4, 5, 6, 7, 8])
def test_down(down):
    x_cpu = np.arange(16, dtype=np.float32)
    h_cpu = np.arange(1, 5, dtype=np.float32)
    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=1, down=down),
        upfirdn(jnp.asarray(h_cpu), jnp.asarray(x_cpu), up=1, down=down),
        rtol=1e-6,
    )


@pytest.mark.parametrize("up", [1, 2, 3, 4, 5, 6, 7, 8])
def test_up(up):
    x_cpu = np.arange(16, dtype=np.float32)
    h_cpu = np.arange(1, 5, dtype=np.float32)
    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=up, down=1),
        upfirdn(jnp.asarray(h_cpu), jnp.asarray(x_cpu), up=up, down=1),
        rtol=1e-6,
    )


@pytest.mark.parametrize(
    "shape, axis, order",
    itertools.product(
        [(16, 8), (24, 16, 8), (8, 9, 10, 11)],
        [0, 1, 2, 3, -1],
        ["C", "F"],
    ),
)
def test_axis_and_order(shape, axis, order):
    size = int(np.prod(shape))
    x_cpu = np.arange(size, dtype=np.float32).reshape(shape, order=order)
    h_cpu = np.arange(3, dtype=np.float32)
    x = jnp.asarray(x_cpu)  # jax is C-order; values match regardless
    h = jnp.asarray(h_cpu)
    ndim = len(shape)
    if -ndim <= axis < ndim:
        _assert_same(
            ssig.upfirdn(h_cpu, x_cpu, up=1, down=2, axis=axis),
            upfirdn(h, x, up=1, down=2, axis=axis), rtol=1e-6,
        )
        _assert_same(
            ssig.upfirdn(h_cpu, x_cpu, up=2, down=1, axis=axis),
            upfirdn(h, x, up=2, down=1, axis=axis), rtol=1e-6,
        )
    else:
        with pytest.raises(ValueError):
            upfirdn(h, x, up=2, down=1, axis=axis)


@pytest.mark.parametrize(
    "up, down, nx, nh",
    itertools.product([1, 2, 3, 4, 5], [1, 2, 3, 4, 5], [16, 17], [3, 4]),
)
def test_general_up_and_down(up, down, nx, nh):
    x_cpu = np.arange(nx, dtype=np.float32)
    h_cpu = np.arange(1, nh + 1, dtype=np.float32)
    _assert_same(
        ssig.upfirdn(h_cpu, x_cpu, up=up, down=down),
        upfirdn(jnp.asarray(h_cpu), jnp.asarray(x_cpu), up=up,
                down=down),
        rtol=1e-6,
    )
