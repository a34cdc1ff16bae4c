"""Routing data: XLA shift-add vs Pallas dense across ndim/taps."""
import functools, json, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

import cupyimg_tpu.ops.pallas_stencil as ps
import cupyimg_tpu.ops.stencil as st


def _slope_ms(fn, x, n1=2, n2=10, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def many(v, n):
        return lax.fori_loop(0, n, lambda i, acc: fn(acc), v)

    def timed(n):
        t0 = time.perf_counter()
        float(many(x, n).ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    timed(n1); timed(n2)
    slopes = []
    for _ in range(reps):
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
vol = jnp.asarray(rng.randn(256, 256, 256).astype(np.float32))
nb2 = img.size * 4 * 2
nb3 = vol.size * 4 * 2

k5_3 = rng.randn(5, 5, 5).astype(np.float32)
k15 = rng.randn(15, 15).astype(np.float32)

# XLA shift-add path (what correlate_nd does)
def xla_corr(x, w):
    taps = [(tuple(int(v) for v in i), float(w[tuple(i)]))
            for i in np.argwhere(w != 0)]
    pads = [(s // 2, s - 1 - s // 2) for s in w.shape]
    from cupyimg_tpu.core import boundary
    xp = boundary.pad(x, pads, "reflect", 0.0)
    acc = None
    for idx, wv in taps:
        sl = tuple(slice(i, i + n) for i, n in zip(idx, x.shape))
        t = wv * xp[sl]
        acc = t if acc is None else acc + t
    return acc

emit("xla_3d_k5", _slope_ms(lambda v: xla_corr(v, k5_3), vol), nb3)
emit("pallas_3d_k5", _slope_ms(
    lambda v: ps.fused_dense_correlate(v, k5_3, (0, 0, 0), "reflect"), vol),
    nb3)
emit("xla_2d_k15", _slope_ms(lambda v: xla_corr(v, k15), img), nb2)
