"""Shared argument-normalization utilities.

Semantics follow reference cupyimg/_misc.py and
cupyimg/scipy/ndimage/_util.py (see SURVEY.md C2/C3); re-implemented for a
functional JAX framework (no output-array plumbing, no C typename maps —
jit tracing replaces codegen specialization).
"""

from __future__ import annotations

import operator
import warnings

import numpy as np


class PerformanceWarning(Warning):
    """Warns about paths known to be slow on TPU (cf. reference _misc.py:224-229)."""


def fix_sequence_arg(arg, ndim: int, name: str, conv=lambda x: x):
    """Broadcast a scalar arg to a length-``ndim`` list (reference _util.py:85-96)."""
    if isinstance(arg, str):
        return [conv(arg)] * ndim
    try:
        arg = iter(arg)
    except TypeError:
        return [conv(arg)] * ndim
    lst = [conv(x) for x in arg]
    if len(lst) != ndim:
        raise RuntimeError(f"{name} must have length equal to input rank")
    return lst


def check_origin(origin, width: int) -> int:
    """Validate a filter origin against the footprint width (reference _util.py:99-103)."""
    origin = int(origin)
    if (width // 2 + origin < 0) or (width // 2 + origin >= width):
        raise ValueError("invalid origin")
    return origin


def check_axis(axis: int, rank: int) -> int:
    """Normalize a (possibly negative) axis index (reference _util.py:20-25)."""
    axis = operator.index(axis)
    if axis < 0:
        axis += rank
    if axis < 0 or axis >= rank:
        raise ValueError("invalid axis")
    return axis


def normalize_axis_index(ax: int, ndim: int) -> int:
    if ax < -ndim or ax >= ndim:
        raise np.exceptions.AxisError(ax, ndim)
    return ax % ndim


def check_cval(mode: str, cval, integer_output: bool):
    if mode == "constant" and integer_output and not np.isfinite(cval):
        raise NotImplementedError(
            "Non-finite cval is not supported for outputs with integer dtype."
        )


def warn_unused(**kwargs):
    """Warn about accepted-but-ignored args (cf. reference _filters_core.py:25-31)."""
    for name, value in kwargs.items():
        if value is not None:
            warnings.warn(f"argument {name!r} is ignored", UserWarning)


def check_axes(axes, ndim: int):
    """Normalize scipy's ``axes`` argument: None -> all axes, scalar ->
    1-tuple; negative axes wrap; duplicates rejected (scipy >= 1.11
    filter semantics)."""
    if axes is None:
        return tuple(range(ndim))
    if np.isscalar(axes):
        axes = (axes,)
    axes = tuple(check_axis(int(a), ndim) for a in axes)
    if len(set(axes)) != len(axes):
        raise ValueError("axes must be unique")
    return axes


def expand_axes_arg(arg, axes, ndim: int, name: str, default, conv):
    """Per-axis argument given over ``axes`` -> full-ndim list with
    ``default`` on excluded axes."""
    vals = fix_sequence_arg(arg, len(axes), name, conv)
    out = [default] * ndim
    for a, v in zip(axes, vals):
        out[a] = v
    return out
