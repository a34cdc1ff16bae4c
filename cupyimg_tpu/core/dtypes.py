"""dtype-promotion policy for filters (``dtype_mode``).

Mirrors the semantics of the reference's precision policy
(cupyimg/scipy/ndimage/_util.py:28-40 ``_get_weights_dtype`` and the
``dtype_mode={'ndimage','float','numpy'}`` kwarg, reference README.md:160-167):

- ``'ndimage'``: SciPy-parity — accumulate in float64 (complex128 for complex
  data).  On TPU (x64 disabled) JAX transparently degrades this to f32/c64;
  CPU tests enable x64 for exact parity.
- ``'float'``: accumulate in the nearest floating type of the input, at least
  float32/complex64 — the performant TPU-native default path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def promote_weights_dtype(input_dtype, weights_dtype, dtype_mode: str):
    """Compute dtype used for the filter weights/accumulation."""
    input_dtype = np.dtype(input_dtype)
    weights_dtype = np.dtype(weights_dtype)
    is_complex = input_dtype.kind == "c" or weights_dtype.kind == "c"
    if dtype_mode == "ndimage":
        return np.dtype(np.complex128 if is_complex else np.float64)
    elif dtype_mode == "float":
        real = _real_dtype(input_dtype)
        if is_complex:
            return np.promote_types(real, np.complex64)
        return np.promote_types(real, np.float32)
    else:
        raise ValueError(f"unsupported dtype_mode: {dtype_mode}")


def _real_dtype(dtype):
    dtype = np.dtype(dtype)
    if dtype.kind == "c":
        return np.dtype(f"f{dtype.itemsize // 2}")
    return dtype


def is_integer_dtype(dtype) -> bool:
    return np.dtype(dtype).kind in "iu"


def is_complex_dtype(dtype) -> bool:
    return np.dtype(dtype).kind == "c"


def resolve_output_dtype(output, input_dtype, weights_dtype=None):
    """Resolve the output dtype of a filter call (reference _util.py:43-81).

    ``output`` may be None (default: input dtype, promoted to complex if the
    weights are complex) or a dtype-like.  Returning an actual array for
    in-place semantics is not supported in a functional framework; instead
    every op returns a fresh array of the resolved dtype, and passing an
    ndarray as ``output`` raises.
    """
    input_dtype = np.dtype(input_dtype)
    if isinstance(output, (np.ndarray, jnp.ndarray)):
        raise NotImplementedError(
            "cupyimg_tpu is functional: preallocated `output` arrays are not "
            "supported; pass a dtype instead"
        )
    if weights_dtype is not None:
        weights_dtype = np.dtype(weights_dtype)
        if output is None:
            if weights_dtype.kind == "c":
                return np.promote_types(input_dtype, np.complex64)
            return input_dtype
        out_dtype = np.dtype(output)
        if (
            input_dtype.kind == "c" or weights_dtype.kind == "c"
        ) and out_dtype.kind != "c":
            raise RuntimeError(
                "output must have complex dtype if either the input or "
                "weights are complex-valued."
            )
        return out_dtype
    return input_dtype if output is None else np.dtype(output)
