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


# A
run(k7, "A_k7_head")
run(k15, "A_k15_head_laneMM")
