"""Experiments: dense-correlate kernel variants on the real chip.

A: HEAD shift path (k7) / lane-MM path (k15) — baseline via public API.
B: k15 forced through the shift path (_LANE_MM2_MIN_TAPS raised).
C: k7/k15 shift path with a local accumulator chain instead of the
   out_ref read-modify-write per column group.
"""
import functools, json, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

import cupyimg_tpu.ops.pallas_stencil as ps


def _slope_ms(fn, x, n1=4, n2=24, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def many(v, n):
        return lax.fori_loop(0, n, lambda i, acc: fn(acc), v)

    def timed(n):
        t0 = time.perf_counter()
        float(many(x, n).ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    timed(n1); timed(n2)
    slopes = []
    for _ in range(reps + 2):
        t1, t2 = timed(n1), timed(n2)
        slopes.append((t2 - t1) / (n2 - n1))
    pos = [s for s in slopes if s > 0]
    return float(np.median(pos if pos else slopes))


def emit(name, ms, nbytes):
    print(json.dumps({"metric": name, "value": round(ms, 4),
                      "GBps": round(nbytes / 1e9 / (ms / 1e3), 1)}),
          flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))
nb2 = img.size * 4 * 2

k7 = rng.randn(7, 7).astype(np.float32)
k15 = rng.randn(15, 15).astype(np.float32)


def run(k, name):
    emit(name, _slope_ms(
        lambda v: ps.fused_dense_correlate(v, k, (0, 0), "reflect"), img),
        nb2)


# C
_orig = ps._make_dense_kernel_2d


def _make_dense_kernel_2d_localacc(taps, S1, B0, sl0):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = ps._group_taps_by_col(taps)

    def kernel(x_any, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :], slab.at[sl], sem.at[sl]
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        acc = None
        for kj, row_taps in cols:
            strip = x[:, kj: kj + S1]
            for ki, w in row_taps:
                term = w * strip[ki: ki + B0]
                acc = term if acc is None else acc + term
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


ps._make_dense_kernel_2d = _make_dense_kernel_2d_localacc
ps._LANE_MM2_MIN_TAPS = 999
ps._fused_dense.clear_cache()
run(k7, "C_k7_localacc")
run(k15, "C_k15_localacc")
ps._make_dense_kernel_2d = _orig
ps._LANE_MM2_MIN_TAPS = 9
