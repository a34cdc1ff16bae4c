"""Misc utilities (reference cupyimg/_misc.py).

``convolve_separable`` is the separable nd convolution driver
(reference _misc.py:39-77); ``cache_source`` is the compiled-program
inspection hook — the reference dumps generated CUDA source
(_misc.py:80-124), the TPU analog saves jaxpr/HLO text for a traced call.
"""

from __future__ import annotations

import contextlib
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "convolve_separable",
    "cache_source",
    "get_hlo",
    "PerformanceWarning",
]


class PerformanceWarning(UserWarning):
    """Warning raised when a code path is known to be slow on TPU
    (reference _misc.py:224-229)."""


def convolve_separable(x, w, axes=None, **kwargs):
    """n-dimensional convolution via separable 1-d filters
    (reference _misc.py:39-77).

    Parameters
    ----------
    x : array
        The input array.
    w : array or sequence of array
        If a single 1-d array, it is applied along each axis in
        ``axes``; otherwise one filter per axis.
    axes : sequence of int, optional
        Axes to filter (all by default).
    """
    from cupyimg_tpu.scipy.ndimage import convolve1d

    x = jnp.asarray(x)
    if axes is None:
        axes = range(x.ndim)
    axes = list(axes)
    w = jnp.asarray(w) if not isinstance(w, (list, tuple)) else w
    if isinstance(w, (list, tuple)):
        filters = [jnp.asarray(f) for f in w]
        if len(filters) != len(axes):
            raise ValueError(
                "must have one filter per axis"
            )
    else:
        if w.ndim != 1:
            raise ValueError("w must be 1-d or a sequence of 1-d")
        filters = [w] * len(axes)
    for ax, f in zip(axes, filters):
        x = convolve1d(x, f, axis=ax, **kwargs)
    return x


def get_hlo(fn, *args, **kwargs):
    """Return the optimized HLO text of ``fn`` traced on ``args``
    (the TPU analog of inspecting generated CUDA source)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        return lowered.compile().as_text()
    except Exception:
        return lowered.as_text()


@contextlib.contextmanager
def cache_source(out_dir=None):
    """Context manager for dumping compiled-program text.

    Yields a ``dump(name, fn, *args)`` callable that writes the jaxpr
    and HLO of ``fn`` traced on ``args`` into ``out_dir`` (defaults to
    ``./jax_source_cache``).  Replacement for the reference's CUDA
    source-cache inspection (_misc.py:80-124).
    """
    out_dir = out_dir or os.path.join(os.getcwd(), "jax_source_cache")
    os.makedirs(out_dir, exist_ok=True)

    def dump(name, fn, *args, **kwargs):
        jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
        with open(os.path.join(out_dir, name + ".jaxpr.txt"), "w") as f:
            f.write(str(jaxpr))
        with open(os.path.join(out_dir, name + ".hlo.txt"), "w") as f:
            f.write(get_hlo(fn, *args, **kwargs))
        return os.path.join(out_dir, name)

    yield dump
