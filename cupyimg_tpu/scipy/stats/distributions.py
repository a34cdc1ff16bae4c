"""scipy.stats.entropy (reference cupyimg/scipy/stats, SURVEY.md C15)."""

from __future__ import annotations

import jax.numpy as jnp

from cupyimg_tpu.scipy.special import entr, rel_entr

__all__ = ["entropy"]


def entropy(pk, qk=None, base=None, axis=0):
    """Shannon entropy / relative entropy (scipy parity)."""
    pk = jnp.asarray(pk)
    pk = 1.0 * pk / jnp.sum(pk, axis=axis, keepdims=True)
    if qk is None:
        vec = entr(pk)
    else:
        qk = jnp.asarray(qk)
        if qk.shape != pk.shape:
            raise ValueError("qk and pk must have same shape.")
        qk = 1.0 * qk / jnp.sum(qk, axis=axis, keepdims=True)
        vec = rel_entr(pk, qk)
    S = jnp.sum(vec, axis=axis)
    if base is not None:
        S /= jnp.log(base)
    return S
