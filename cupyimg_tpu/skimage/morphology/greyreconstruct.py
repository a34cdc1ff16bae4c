"""Morphological reconstruction (reference
cupyimg/skimage/morphology/greyreconstruct.py).

TPU-native redesign (SURVEY.md §2.3 N14): the reference sorts all pixels into
a linked list and runs skimage's *host* Cython ``reconstruction_loop``
(greyreconstruct.py:139, 227-231) — a sequential downhill filter.  Here
reconstruction is computed entirely on device as iterated *geodesic
dilation/erosion to fixpoint*::

    rec <- min(rec (+) selem, mask)      (dilation method)
    rec <- max(rec (-) selem, mask)      (erosion method)

under ``lax.while_loop`` with a whole-array convergence reduction.  Each
sweep is one bandwidth-bound fused stencil; values propagate one selem
radius per sweep.  This is deterministic and stays on device, trading the
sequential algorithm's O(N log N) host work for a few dozen parallel sweeps.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["reconstruction"]


def _shift_fill(x, offset, fill):
    """x shifted so out(i) = x(i - offset), out-of-range filled."""
    pads = []
    slices = []
    for ax, off in enumerate(offset):
        off = int(off)
        if off >= 0:
            pads.append((off, 0))
            slices.append(slice(0, x.shape[ax]))
        else:
            pads.append((0, -off))
            slices.append(slice(-off, x.shape[ax] - off))
    return jnp.pad(x, pads, constant_values=fill)[tuple(slices)]


@functools.partial(
    jax.jit, static_argnames=("offsets", "method", "steps_per_check")
)
def _reconstruct_loop(seed, mask, offsets, method, steps_per_check=4):
    dt = seed.dtype
    if np.issubdtype(dt, np.floating):
        lo, hi = -jnp.inf, jnp.inf
    else:
        info = np.iinfo(dt)
        lo, hi = info.min, info.max

    if method == "dilation":
        fill, combine, clamp = lo, jnp.maximum, jnp.minimum
    else:
        fill, combine, clamp = hi, jnp.minimum, jnp.maximum

    def sweep(r):
        acc = r
        for off in offsets:
            acc = combine(acc, _shift_fill(r, off, fill))
        return clamp(acc, mask)

    def body(carry):
        r, _ = carry
        new = r
        # amortize the convergence reduction over a few sweeps
        for _ in range(steps_per_check):
            new = sweep(new)
        return new, jnp.any(new != r)

    def cond(carry):
        return carry[1]

    rec, _ = lax.while_loop(cond, body, (seed, jnp.asarray(True)))
    return rec


def reconstruction(seed, mask, method="dilation", selem=None, offset=None):
    """Morphological reconstruction of ``seed`` under ``mask``.

    API parity with reference greyreconstruct.py:18-238 (same argument
    semantics and validation); algorithm is device-side geodesic
    dilation/erosion to fixpoint instead of the host linked-list loop.
    """
    seed = jnp.asarray(seed)
    mask = jnp.asarray(mask)
    if tuple(seed.shape) != tuple(mask.shape):
        raise ValueError("seed and mask must have the same shape")
    if method == "dilation" and bool(jnp.any(seed > mask)):
        raise ValueError(
            "Intensity of seed image must be less than that "
            "of the mask image for reconstruction by dilation."
        )
    if method == "erosion" and bool(jnp.any(seed < mask)):
        raise ValueError(
            "Intensity of seed image must be greater than that "
            "of the mask image for reconstruction by erosion."
        )
    if method not in ("dilation", "erosion"):
        raise ValueError(
            "Reconstruction method can be one of 'erosion' "
            "or 'dilation'. Got '%s'." % method
        )

    if selem is None:
        selem = np.ones((3,) * seed.ndim, dtype=bool)
    else:
        selem = np.asarray(selem).astype(bool)

    if offset is None:
        if not all(d % 2 == 1 for d in selem.shape):
            raise ValueError("Footprint dimensions must all be odd")
        offset = np.array([d // 2 for d in selem.shape])
    else:
        offset = np.asarray(offset)
        if offset.ndim != selem.ndim:
            raise ValueError("Offset and selem ndims must be equal.")
        if not all(0 <= o < d for o, d in zip(offset, selem.shape)):
            raise ValueError("Offset must be included inside selem")

    # neighbor offsets (centre excluded; the identity term is implicit in
    # the sweep's monotone accumulate)
    coords = np.argwhere(selem) - offset[None, :]
    offsets = tuple(
        tuple(int(c) for c in row)
        for row in coords
        if not all(c == 0 for c in row)
    )

    dtype = jnp.promote_types(seed.dtype, mask.dtype)
    seed = seed.astype(dtype)
    mask = mask.astype(dtype)
    return _reconstruct_loop(seed, mask, offsets, method)
