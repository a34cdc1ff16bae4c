"""skimage.util.map_array (reference cupyimg/skimage/util/_map_array.py).

TPU-native replacement for the reference's lookup ElementwiseKernel
(SURVEY.md N9): sorted ``searchsorted`` on the input values + gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["map_array"]


def map_array(input_arr, input_vals, output_vals, out=None):
    """Map values in ``input_arr`` from ``input_vals`` to ``output_vals``;
    unmapped values become 0 (skimage parity)."""
    if out is not None:
        raise NotImplementedError(
            "cupyimg_tpu is functional: `out` is not supported"
        )
    input_arr = jnp.asarray(input_arr)
    input_vals = jnp.asarray(input_vals)
    output_vals = jnp.asarray(output_vals)
    if np.dtype(input_arr.dtype).kind not in "iu":
        raise TypeError(
            "The dtype of an array to be remapped should be integer."
        )
    order = jnp.argsort(input_vals)
    sorted_in = input_vals[order]
    sorted_out = output_vals[order]
    pos = jnp.searchsorted(sorted_in, input_arr)
    pos = jnp.clip(pos, 0, sorted_in.shape[0] - 1)
    hit = sorted_in[pos] == input_arr
    mapped = sorted_out[pos]
    zero = jnp.zeros((), dtype=output_vals.dtype)
    return jnp.where(hit, mapped, zero)
