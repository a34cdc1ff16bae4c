"""Quick slice of bench_suite for the VERDICT perf-gap groups at HEAD."""
import functools, json, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax

import cupyimg_tpu.scipy.ndimage as ndi
import cupyimg_tpu.scipy.signal as signal


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


def emit(name, ms, nbytes=None):
    rec = {"metric": name, "value": round(ms, 4), "unit": "ms"}
    if nbytes:
        rec["GBps"] = round(nbytes / 1e9 / (ms / 1e3), 1)
    print(json.dumps(rec), flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.randn(4096, 4096).astype(np.float32))
vol = jnp.asarray(rng.randn(256, 256, 256).astype(np.float32))
nb2 = img.size * 4 * 2
nb3 = vol.size * 4 * 2

for k in (7, 15):
    kd = jnp.asarray(rng.randn(k, k).astype(np.float32))
    emit(f"correlate_dense_2d_4096_k{k}",
         _slope_ms(lambda v, kd=kd: ndi.correlate(v, kd, mode="reflect",
                                                  dtype_mode="float"), img),
         nb2)

emit("median_2d_4096_s3",
     _slope_ms(lambda v: ndi.median_filter(v, 3), img), nb2)
emit("median_2d_4096_s5",
     _slope_ms(lambda v: ndi.median_filter(v, 5), img), nb2)
emit("minimum_3d_256c_s5",
     _slope_ms(lambda v: ndi.minimum_filter(v, 5), vol), nb3)

mat = np.array([[0.9, 0.1], [-0.1, 0.9]], np.float32)
for order in (0, 1, 3):
    emit(f"affine_2d_4096_order{order}",
         _slope_ms(lambda v, o=order: ndi.affine_transform(
             v, mat, order=o, mode="nearest", prefilter=False),
             img, n1=1, n2=4), nb2)
emit("rotate_3d_256c_order1",
     _slope_ms(lambda v: ndi.rotate(v, 17.0, axes=(1, 2), reshape=False,
                                    order=1, mode="nearest",
                                    prefilter=False), vol, n1=1, n2=4), nb3)

k2 = jnp.asarray(rng.randn(31, 31).astype(np.float32))
emit("fftconvolve_2d_4096_k31",
     _slope_ms(lambda v: signal.fftconvolve(v, k2, mode="same"), img,
               n1=2, n2=8), nb2)
emit("oaconvolve_2d_4096_k31",
     _slope_ms(lambda v: signal.oaconvolve(v, k2, mode="same"), img,
               n1=2, n2=8), nb2)
