"""Probes: what dominates GTG affine cost on v5e."""
import functools, json, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
import cupyimg_tpu.scipy.ndimage as ndi


def _slope_ms(fn, x, n1=2, n2=8, reps=4):
    @functools.partial(jax.jit, static_argnums=1)
    def many(v, n):
        return lax.fori_loop(0, n, lambda i, acc: fn(acc), v)

    def timed(n):
        t0 = time.perf_counter()
        float(many(x, n).ravel()[0])
        return (time.perf_counter() - t0) * 1e3

    timed(n1); timed(n2)
    s = []
    for _ in range(reps):
        t1, t2 = timed(n1), timed(n2)
        s.append((t2 - t1) / (n2 - n1))
    pos = [v for v in s if v > 0]
    return float(np.median(pos if pos else s))


def emit(name, ms, nbytes):
    print(json.dumps({"metric": name, "value": round(ms, 4),
                      "GBps": round(nbytes / 1e9 / (ms / 1e3), 1)}),
          flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))
nb2 = img.size * 4 * 2

m_np2 = np.array([[0.9, 0.1], [-0.1, 0.9]], np.float32)   # NP=2
m_np1 = np.array([[1.12, 0.1], [-0.1, 1.12]], np.float32)  # |a00|>1 -> NP=1

for name, m in (("NP2", m_np2), ("NP1", m_np1)):
    for order in (0, 1):
        emit(f"affine_{name}_order{order}",
             _slope_ms(lambda v, m=m, o=order: ndi.affine_transform(
                 v, m, order=o, mode="nearest", prefilter=False), img),
             nb2)

# pure shear (a01 only; a00=a11=1): NP=1, NW probably 2
m_shear = np.array([[1.0, 0.12], [0.0, 1.0]], np.float32)
emit("affine_shear_order1",
     _slope_ms(lambda v: ndi.affine_transform(
         v, m_shear, order=1, mode="nearest", prefilter=False), img), nb2)
