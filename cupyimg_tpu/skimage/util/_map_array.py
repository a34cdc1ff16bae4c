"""skimage.util.map_array (reference cupyimg/skimage/util/_map_array.py).

TPU-native replacement for the reference's lookup ElementwiseKernel
(SURVEY.md N9): sorted ``searchsorted`` on the input values + gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["map_array", "ArrayMap"]


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


class ArrayMap:
    """Mapping that mimics NumPy-array indexing without materializing a
    dense lookup table (reference _map_array.py:84-260).

    ``ArrayMap(in_values, out_values)[labels]`` maps each element of
    ``labels`` through the sparse (in -> out) table via ``map_array``.
    """

    def __init__(self, in_values, out_values):
        self.in_values = jnp.asarray(in_values)
        self.out_values = jnp.asarray(out_values)
        self._max_str_lines = 4
        self._array = None
        self._max_label = int(jnp.max(self.in_values))

    def __len__(self):
        """One more than the maximum label value being remapped."""
        return self._max_label + 1

    def _asarray(self, dtype=None):
        """Dense device lookup array equivalent to this map."""
        if dtype is None:
            dtype = self.out_values.dtype
        output = jnp.zeros(self._max_label + 1, dtype=dtype)
        return output.at[self.in_values].set(
            self.out_values.astype(dtype)
        )

    def __array__(self, dtype=None):
        return np.asarray(self._asarray(dtype))

    @property
    def dtype(self):
        return self.out_values.dtype

    def __repr__(self):
        return (
            f"ArrayMap({repr(self.in_values)}, {repr(self.out_values)})"
        )

    def __str__(self):
        if len(self.in_values) <= self._max_str_lines + 1:
            rows = range(len(self.in_values))
            return "\n".join(
                ["ArrayMap:"]
                + [
                    f"  {self.in_values[i]} → {self.out_values[i]}"
                    for i in rows
                ]
            )
        rows0 = list(range(0, self._max_str_lines // 2))
        rows1 = list(range(-self._max_str_lines // 2, 0))
        return "\n".join(
            ["ArrayMap:"]
            + [
                f"  {self.in_values[i]} → {self.out_values[i]}"
                for i in rows0
            ]
            + ["  ..."]
            + [
                f"  {self.in_values[i]} → {self.out_values[i]}"
                for i in rows1
            ]
        )

    def __call__(self, arr):
        return self.__getitem__(arr)

    def __getitem__(self, index):
        scalar = np.isscalar(index)
        if scalar:
            index = jnp.asarray([index])
        elif isinstance(index, slice):
            start = index.start or 0
            stop = index.stop if index.stop is not None else len(self)
            step = index.step
            index = jnp.arange(start, stop, step)
        index = jnp.asarray(index)
        if index.dtype == bool:
            index = jnp.flatnonzero(index)

        out = map_array(
            index,
            self.in_values.astype(index.dtype),
            self.out_values,
        )
        if scalar:
            out = out[0]
        return out

    def __setitem__(self, indices, values):
        if self._array is None:
            self._array = self._asarray()
        if isinstance(indices, (jnp.ndarray, np.ndarray)) and np.dtype(
            jnp.asarray(indices).dtype
        ) == bool:
            indices = jnp.flatnonzero(jnp.asarray(indices))
        self._array = self._array.at[indices].set(values)
        self.in_values = jnp.flatnonzero(self._array)
        self._max_label = int(jnp.max(self.in_values))
        self.out_values = self._array[self.in_values]
