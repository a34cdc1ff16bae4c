"""Boundary-mode semantics as pure index-space functions.

The reference implements the 8 ndimage boundary modes as generated CUDA C++
index-remap snippets (cupyimg/scipy/ndimage/_util.py:170-228,
``_generate_boundary_condition_ops``).  Here the same math is expressed once
as vectorized JAX integer functions, shared by:

- the jnp pad-based stencil engine (pad out-of-range via gather),
- the Pallas kernels (same functions traced inside a kernel body),
- the interpolation coordinate mapping.

Mode semantics (scipy.ndimage convention, for integer sample index ``i`` in
an axis of length ``n``)::

    'reflect'       (d c b a | a b c d | d c b a)   period 2n   (== grid-mirror)
    'constant'      (k k k k | a b c d | k k k k)   cval outside
    'nearest'       (a a a a | a b c d | d d d d)   clamp
    'mirror'        (d c b   | a b c d | c b a)     period 2n-2
    'wrap'          (a b c d | a b c d | a b c d)   period n    (== grid-wrap
                                                    for integer indices; they
                                                    differ only for the
                                                    non-integer coordinates of
                                                    the interpolation path)
    'grid-constant' same as constant for integer indices
"""

from __future__ import annotations

import jax.numpy as jnp

#: All modes accepted by ndimage-layer functions
#: (cf. reference _util.py:105-119 ``_check_mode``).
BOUNDARY_MODES = frozenset(
    {
        "reflect",
        "constant",
        "nearest",
        "mirror",
        "wrap",
        "grid-mirror",
        "grid-wrap",
        "grid-constant",
    }
)

# modes whose out-of-range samples take the constant value
_CONSTANT_MODES = frozenset({"constant", "grid-constant"})


def check_mode(mode: str) -> str:
    """Validate a boundary mode string (reference _util.py:105-119)."""
    if mode not in BOUNDARY_MODES:
        raise RuntimeError(f"boundary mode not supported (actual: {mode})")
    return mode


def ndimage_mode_to_pad_mode(mode: str) -> str:
    """ndimage mode -> numpy.pad-style mode name (reference _util.py:154-167)."""
    return {
        "reflect": "symmetric",
        "grid-mirror": "symmetric",
        "mirror": "reflect",
        "nearest": "edge",
        "wrap": "wrap",
        "grid-wrap": "wrap",
        "constant": "constant",
        "grid-constant": "constant",
    }[mode]


def map_indices(idx, n: int, mode: str):
    """Map arbitrary integer indices onto ``[0, n)`` for a boundary mode.

    Parameters
    ----------
    idx : integer jnp array (any shape, may be far out of range)
    n : static axis length
    mode : one of BOUNDARY_MODES

    Returns
    -------
    (mapped, oob) : mapped indices (safe for gather) and, for constant modes,
    a boolean mask of positions whose value must be replaced by cval
    (``None`` for non-constant modes).

    The math mirrors the CUDA snippets in reference _util.py:170-228 but is
    branch-free (jnp.where) — the natural form for the VPU.
    """
    idx = jnp.asarray(idx)
    if mode in ("reflect", "grid-mirror"):
        if n == 1:
            return jnp.zeros_like(idx), None
        period = 2 * n
        im = idx % period  # jnp % is non-negative for positive divisor
        return jnp.where(im < n, im, period - 1 - im), None
    if mode == "mirror":
        if n == 1:
            return jnp.zeros_like(idx), None
        period = 2 * n - 2
        im = idx % period
        return jnp.where(im < n, im, period - im), None
    if mode == "nearest":
        return jnp.clip(idx, 0, n - 1), None
    if mode in ("wrap", "grid-wrap"):
        return idx % n, None
    if mode in _CONSTANT_MODES:
        oob = (idx < 0) | (idx >= n)
        return jnp.clip(idx, 0, n - 1), oob
    raise RuntimeError(f"boundary mode not supported (actual: {mode})")


def map_indices_np(idx, n: int, mode: str):
    """NumPy twin of :func:`map_indices` for trace-time constant tables
    (e.g. the banded lane matrices in ops/pallas_stencil.py); returns
    (mapped, oob) with ``oob`` always a boolean array."""
    import numpy as _np

    idx = _np.asarray(idx)
    oob = _np.zeros(idx.shape, bool)
    if mode in ("reflect", "grid-mirror"):
        if n == 1:
            return _np.zeros_like(idx), oob
        period = 2 * n
        im = idx % period
        return _np.where(im < n, im, period - 1 - im), oob
    if mode == "mirror":
        if n == 1:
            return _np.zeros_like(idx), oob
        period = 2 * n - 2
        im = idx % period
        return _np.where(im < n, im, period - im), oob
    if mode == "nearest":
        return _np.clip(idx, 0, n - 1), oob
    if mode in ("wrap", "grid-wrap"):
        return idx % n, oob
    if mode in _CONSTANT_MODES:
        oob = (idx < 0) | (idx >= n)
        return _np.clip(idx, 0, n - 1), oob
    raise RuntimeError(f"boundary mode not supported (actual: {mode})")


def pad(x, pad_width, mode: str, cval=0.0):
    """N-d boundary extension of ``x`` by gather, honoring ndimage semantics.

    Unlike ``jnp.pad`` this supports every ndimage mode uniformly (including
    arbitrary pad widths that exceed the axis length, where numpy's
    'reflect'/'symmetric' also work but 'wrap' semantics differ per numpy
    version) — one code path for all modes, jit-friendly.

    Parameters
    ----------
    x : jnp array
    pad_width : sequence of (lo, hi) static ints, one per axis
    mode : boundary mode
    cval : fill value for constant modes
    """
    check_mode(mode)
    pad_width = [(int(lo), int(hi)) for lo, hi in pad_width]
    if all(lo == 0 and hi == 0 for lo, hi in pad_width):
        return x

    # Fast path: one fused jnp.pad for all axes. A gather per axis (the
    # general path below) costs one full HBM round trip *per axis*,
    # which dominated the fused-stencil kernels. jnp.pad's 'reflect'
    # and 'symmetric' require pad < axis length; fall back otherwise.
    pad_mode = ndimage_mode_to_pad_mode(mode)
    fits = all(
        max(lo, hi) < x.shape[ax] or (lo == 0 and hi == 0)
        for ax, (lo, hi) in enumerate(pad_width)
    )
    if fits or pad_mode in ("constant", "edge", "wrap"):
        if pad_mode == "constant":
            return jnp.pad(
                x, pad_width, mode="constant", constant_values=cval
            )
        return jnp.pad(x, pad_width, mode=pad_mode)

    y = x
    for axis, (lo, hi) in enumerate(pad_width):
        if lo == 0 and hi == 0:
            continue
        n = y.shape[axis]
        idx = jnp.arange(-lo, n + hi)
        mapped, oob = map_indices(idx, n, mode)
        y = jnp.take(y, mapped, axis=axis)
        if oob is not None:
            shape = [1] * y.ndim
            shape[axis] = oob.shape[0]
            fill = jnp.asarray(cval).astype(y.dtype)
            y = jnp.where(oob.reshape(shape), fill, y)
    return y
