#!/usr/bin/env python
"""Virtual-mesh scaling table for the sharded ops (VERDICT r1 item #9).

Runs the sharded pipelines on a virtual CPU mesh at 1/2/4/8 devices and
prints one JSON line per (op, n_devices) with wall-clock per step.  On
virtual CPU devices all shards share the same host cores, so the point of
this table is NOT speedup — it demonstrates that the shard_map programs
(halo exchange, all_to_all FFT retiles, fixpoint label rounds) compile and
execute at every mesh size with flat-ish per-element cost, i.e. the
collective structure adds no super-linear overhead.  Real-chip scaling
needs a pod slice; the driver validates the same programs via
__graft_entry__.dryrun_multichip.

Usage:  python bench_multichip.py     (forces CPU + 8 virtual devices)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("CUPYIMG_TPU_NO_CACHE", "1")

import json
import time

import numpy as np
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cupyimg_tpu import parallel


def timed_ms(fn, x, reps=5):
    out = fn(x)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    base = rng.randn(512, 512).astype(np.float32)

    for n in (1, 2, 4, 8):
        devs = np.array(jax.devices()[:n])
        mesh = Mesh(devs, ("x",))
        spec = P("x", None)
        xg = jax.device_put(jnp.asarray(base), NamedSharding(mesh, spec))

        cases = {
            "uniform_s5": jax.jit(
                lambda v: parallel.sharded_uniform_filter(
                    v, 5, mesh, spec
                )
            ),
            "median_5x5": jax.jit(
                lambda v: parallel.sharded_median_filter(
                    v, (5, 5), mesh, spec
                )
            ),
            "fft2": jax.jit(
                lambda v: parallel.sharded_fft2(v, mesh, spec)
            ),
            "fftconv2d_k9": jax.jit(
                lambda v: parallel.sharded_fftconvolve2d_spatial(
                    v, jnp.ones((9, 9), jnp.float32) / 81.0, mesh, spec
                )
            ),
            "rank_min_s7": jax.jit(
                lambda v: parallel.sharded_minimum_filter(
                    v, 7, mesh, spec
                )
            ),
            # weights/matrix stay CONCRETE numpy: the sharded drivers
            # enumerate taps / plan shardings at trace time
            "dense_correlate_k5": jax.jit(
                lambda v, _w=np.random.RandomState(3)
                .randn(5, 5)
                .astype(np.float32): parallel.sharded_correlate(
                    v, _w, mesh, spec
                )
            ),
            "affine_order1": jax.jit(
                lambda v: parallel.sharded_affine_transform(
                    v,
                    np.array([1.013, 0.987]),
                    offset=(3.1, -2.2),
                    mesh=mesh,
                    spec=spec,
                    order=1,
                )
            ),
            # blob-like mask: dense speckle (randn > t) is the CCL
            # worst case (23 s/step at 8 virtual devices); labeling
            # smoothed blobs is the representative workload
            "label": lambda v: parallel.sharded_label(
                parallel.sharded_uniform_filter(v, 9, mesh, spec) > 0.1,
                mesh, spec,
            )[0],
        }
        for name, fn in cases.items():
            ms = timed_ms(fn, xg)
            print(
                json.dumps(
                    {
                        "metric": f"sharded_{name}",
                        "n_devices": n,
                        "value": round(ms, 3),
                        "unit": "ms",
                        "mpix_per_s": round(
                            base.size / 1e6 / (ms / 1e3), 1
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
