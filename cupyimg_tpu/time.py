"""Benchmark timing harness (reference cupyimg/time.py:54-148).

TPU analog of the reference's CPU-clock + CUDA-event timer: CPU wall time
via ``perf_counter`` and device time via ``jax.block_until_ready`` around
each call (XLA dispatch is async, so the blocked wall time is the device
time upper bound).  Same ``repeat()`` API and printed statistics.
"""

from __future__ import annotations

import contextlib as _contextlib
import math
import time as _time

import numpy as np
import jax

__all__ = ["repeat", "_PerfCaseResult"]


class _PerfCaseResult:
    def __init__(self, name, ts, devices):
        assert ts.ndim == 2 and ts.shape[0] == len(devices) + 1
        self.name = name
        self._ts = ts
        self._devices = devices

    @property
    def cpu_times(self):
        return self._ts[0]

    @property
    def gpu_times(self):  # retained name for API parity
        return self._ts[1:]

    device_times = gpu_times

    @staticmethod
    def _to_str_per_item(device_name, t):
        assert t.ndim == 1 and t.size > 0
        t_us = t * 1e6
        s = "    {}:{:9.03f} us".format(device_name, t_us.mean())
        if t.size > 1:
            s += "   +/-{:6.03f} (min:{:9.03f} / max:{:9.03f}) us".format(
                t_us.std(), t_us.min(), t_us.max()
            )
        return s

    def to_str(self, show_device=False):
        results = [self._to_str_per_item("CPU", self._ts[0])]
        if show_device:
            for i, d in enumerate(self._devices):
                results.append(
                    self._to_str_per_item(f"DEV{i}", self._ts[1 + i])
                )
        return f"{self.name:<20s}:" + " ".join(results)

    def __str__(self):
        return self.to_str(show_device=True)


def repeat(
    func,
    args=(),
    kwargs={},
    n_repeat=10000,
    *,
    name=None,
    n_warmup=10,
    max_duration=math.inf,
    devices=None,
):
    """Time ``func`` with warmup, returning per-repeat CPU and device
    times (same semantics as the reference's ``repeat``)."""
    if not callable(func):
        raise ValueError("`func` should be a callable object.")
    if name is None:
        name = func.__name__

    if devices is None:
        devices = (jax.devices()[0],)
    if not isinstance(args, tuple):
        raise ValueError("`args` should be of tuple type.")
    if not isinstance(kwargs, dict):
        raise ValueError("`kwargs` should be of dict type.")

    for _ in range(n_warmup):
        out = func(*args, **kwargs)
    jax.block_until_ready(out)

    cpu_times = []
    dev_times = [[] for _ in devices]
    duration = 0.0
    for _ in range(n_repeat):
        t0 = _time.perf_counter()
        out = func(*args, **kwargs)
        t1 = _time.perf_counter()
        jax.block_until_ready(out)
        t2 = _time.perf_counter()
        cpu_times.append(t1 - t0)
        for d in dev_times:
            d.append(t2 - t0)
        duration += t2 - t0
        if duration > max_duration:
            break

    ts = np.asarray([cpu_times] + dev_times, dtype=np.float64)
    return _PerfCaseResult(name, ts, devices=devices)


@_contextlib.contextmanager
def trace(log_dir="/tmp/cupyimg_tpu_trace"):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    TPU analog of the reference's CUDA-event instrumentation
    (cupyimg/time.py:54-148) for timeline-level inspection: open the
    resulting directory with TensorBoard's profile plugin or
    ``xprof``.  Usage::

        with cupyimg_tpu.time.trace("/tmp/tr"):
            out = ndi.uniform_filter(x, 5)
            out.block_until_ready()
    """
    import jax.profiler as _profiler

    _profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        _profiler.stop_trace()
