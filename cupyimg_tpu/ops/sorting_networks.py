"""Rank selection via pruned sorting networks.

The reference embeds hand-generated CUDA median networks for footprint
sizes up to ~49 (cupyimg _filters_optimal_medians.py, SURVEY.md C9/N2).
The TPU analog emits the same compare-exchange structure as a DAG of
``jnp.minimum``/``jnp.maximum`` over whole shifted arrays — XLA fuses the
chain into one elementwise pass, so no window tensor is materialized and
no generic sort runs.  The network is Batcher's odd-even mergesort,
*pruned backward* from the single requested rank wire, which removes the
large fraction of compare-exchanges that cannot influence that output
(for a median-of-9 this leaves ~20 of 25 CEs; for rank 0/k-1 it
degenerates to a min/max tree).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = ["rank_select", "batcher_network", "pruned_network"]


@functools.lru_cache(maxsize=None)
def batcher_network(n: int):
    """Batcher odd-even mergesort compare-exchange list for n wires."""
    pairs = []

    def merge(lo, length, r):
        step = r * 2
        if step < length:
            merge(lo, length, step)
            merge(lo + r, length, step)
            for i in range(lo + r, lo + length - r, step):
                if i + r < lo + length:
                    pairs.append((i, i + r))
        else:
            if lo + r < lo + length:
                pairs.append((lo, lo + r))

    def sort(lo, length):
        if length > 1:
            m = length // 2
            sort(lo, m)
            sort(lo + m, length - m)
            merge(lo, length, 1)

    # Batcher's classic formulation needs power-of-two lengths; pad the
    # wire count up and drop CEs touching virtual wires, which is valid
    # when virtual wires are +inf sentinels ordered last — instead use
    # the recursive odd-even transposition-free variant below that
    # handles arbitrary n directly.
    def oddeven_merge(lo, hi, r):
        step = r * 2
        if step < hi - lo:
            oddeven_merge(lo, hi, step)
            oddeven_merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def oddeven_sort(lo, hi):
        if hi - lo >= 1:
            mid = lo + ((hi - lo) // 2)
            oddeven_sort(lo, mid)
            oddeven_sort(mid + 1, hi)
            oddeven_merge(lo, hi, 1)

    pairs.clear()
    # pad to power of two; CEs with a virtual wire (index >= n) are
    # dropped — virtual wires hold +inf, so such CEs are no-ops for the
    # real wires they touch only if the real wire is on the min side;
    # Batcher CEs always order (low index = min), and virtual wires sit
    # at high indices, so dropping them is exact.
    m = 1
    while m < n:
        m *= 2
    oddeven_sort(0, m - 1)
    return tuple((a, b) for a, b in pairs if a < n and b < n)


@functools.lru_cache(maxsize=None)
def pruned_network(n: int, rank: int):
    """CE list reduced to those that can influence output wire ``rank``.

    Backward slice: walk the network in reverse keeping a live-wire set
    initialized to {rank}; a CE is kept iff it touches a live wire, and
    both of its wires become live.
    """
    pairs = batcher_network(n)
    live = {rank}
    kept = []
    for (a, b) in reversed(pairs):
        if a in live or b in live:
            kept.append((a, b))
            live.add(a)
            live.add(b)
    return tuple(reversed(kept))


def rank_select(values, rank: int):
    """Select the rank-th smallest across a list of same-shape arrays.

    Applies the pruned Batcher network with jnp.minimum/maximum over
    whole arrays; XLA fuses the DAG into one elementwise pass.
    """
    n = len(values)
    wires = list(values)
    for (a, b) in pruned_network(n, rank):
        lo = jnp.minimum(wires[a], wires[b])
        hi = jnp.maximum(wires[a], wires[b])
        wires[a] = lo
        wires[b] = hi
    return wires[rank]
