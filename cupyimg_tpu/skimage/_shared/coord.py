"""Coordinate de-duplication (reference cupyimg/skimage/_shared/coord.py).

TPU-native redesign (SURVEY.md N14): the reference round-trips to
``scipy.spatial.cKDTree`` on the host; here suppression runs on-device as a
priority-ordered sequential sweep over the pairwise distance matrix under
``lax.fori_loop`` — a point survives unless an earlier surviving point lies
within ``spacing``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["ensure_spacing"]


def ensure_spacing(coord, spacing=1, p_norm=np.inf, *, max_out=None,
                   strict=True):
    """Return a subset of ``coord`` (priority = row order) pairwise
    separated by at least ``spacing``.

    The first parameter is named ``coord`` for keyword-call parity with
    the reference (cupyimg/skimage/_shared/coord.py:7).

    Returns the surviving coordinates (host-side compaction at the API
    boundary, like the reference's variable-length returns).
    """
    coords = jnp.asarray(coord)
    if coords.ndim == 1:
        coords = coords[:, None]
    n = coords.shape[0]
    if n == 0:
        return coords
    diff = coords[:, None, :] - coords[None, :, :]
    if np.isinf(p_norm):
        dist = jnp.max(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sum(jnp.abs(diff) ** p_norm, axis=-1) ** (1.0 / p_norm)
    # strict=True (skimage ensure_spacing): points at EXACTLY `spacing`
    # survive. strict=False (corner_peaks' raw query_ball_point loop):
    # distance == spacing also suppresses.
    close = dist < spacing if strict else dist <= spacing

    def body(i, keep):
        # suppressed if any earlier kept point is within spacing
        earlier = jnp.arange(n) < i
        conflict = jnp.any(close[i] & keep & earlier)
        return keep.at[i].set(~conflict)

    keep = lax.fori_loop(0, n, body, jnp.ones(n, dtype=bool))
    keep_np = np.asarray(keep)
    out = np.asarray(coords)[keep_np]
    if max_out is not None:
        out = out[:max_out]
    return jnp.asarray(out)
