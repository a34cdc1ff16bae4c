"""Fused separable stencils as Pallas TPU kernels.

The jnp separable driver (ops/stencil.py) runs one HBM round trip per
axis — 3 reads + 3 writes of the whole volume for a 3-D filter.  This
module fuses all axes into ONE pass: each grid step DMAs a halo'd slab
from HBM into VMEM (double-buffered, overlapping the previous step's
compute), applies every per-axis 1-D correlation in VMEM (unrolled
static-shift multiply-adds on the VPU), and writes the interior block
once.  Traffic drops to ~1 read + 1 write of the volume, which is the
HBM roofline for this op (SURVEY.md §6: the reference's 1080 Ti number
is bandwidth-bound for exactly this reason).

Boundary handling: the input is pre-padded with the ndimage mode in a
single fused ``boundary.pad`` (one HBM round trip) that also covers the
grid tail and sublane alignment, so the kernel only ever reads
in-bounds.  The lane axis is special: a leading lane pad shifts every
128-lane tile (a misaligned whole-array HBM copy that measured ~2x the
kernel time for 3-D min filters), so the lo-halo columns are instead
stored at the END of the aligned lane extent and each kernel restores
the shifted layout with ONE static in-VMEM ``pltpu.roll`` per slab.
(Per-tap in-kernel rolls — one per slice — were measured 2.7x slower;
a single roll per slab amortizes to noise.)
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cupyimg_tpu.core import boundary

__all__ = [
    "fused_dense_correlate",
    "fused_rank_filter",
    "fused_separable_correlate",
    "fused_separable_minmax",
    "fused_separable_morph_pair",
    "fused_separable_open_close",
    "supports",
    "supports_dense",
    "supports_rank",
]

# raise Mosaic's scoped-VMEM ceiling from the 16 MiB default — v5e has
# 128 MiB of VMEM per core, and wide-halo kernels want bigger slabs
_VMEM_LIMIT = 96 * 1024 * 1024
# per-block VMEM budget (bytes) used to choose block sizes
_VMEM_BUDGET = 6 * 1024 * 1024
# unrolling very long taps bloats the kernel; fall back beyond this
_MAX_TAPS = 64
# 2-D lane-axis correlations at or above this tap count route to the
# Toeplitz MXU matmul instead of unaligned lane-shift accumulation
# (measured crossover on v5e: 7-tap shifts 0.47 ms vs matmul 0.52 ms,
# 25-tap shifts 1.59 ms vs matmul 0.61 ms on a 4096^2 f32 gaussian)
_LANE_MM2_MIN_TAPS = 10  # v5e: shift path 92.5 GB/s vs lane-MM 79.2 at 9
                         # taps wide; lane-MM wins from ~10-15 (62 vs 33
                         # at 15) — measured crossover, round 2


def supports(x, weights):
    """Whether the fused Pallas path applies to this call."""
    if jax.default_backend() != "tpu":
        return False
    if np.dtype(x.dtype).kind != "f" or np.dtype(x.dtype).itemsize > 4:
        return False
    if x.ndim not in (2, 3):
        return False
    if any(w is not None and len(w) > _MAX_TAPS for w in weights):
        return False
    if x.size < (1 << 20):  # small arrays: dispatch overhead dominates
        return False
    return True


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _choose_blocks(shape, halos, lane, itemsize):
    """Pick grid block sizes for the leading (non-lane) axes so the
    slab + temporaries fit the VMEM budget.

    3-D blocks are chosen halo-aware: wide kernels (e.g. a truncated
    gaussian with 16-sample halos) need bigger blocks to keep the
    slab-read amplification (slab bytes / interior bytes) down — the
    fixed (16, 64) starting point degraded to (16, 8) under budget and
    read 9x the interior for sigma=2 gaussians."""
    ndim = len(shape)
    if ndim == 2:
        b0 = 256
        while (b0 + halos[0]) * lane * itemsize > _VMEM_BUDGET and b0 > 8:
            b0 //= 2
        return [b0]
    # (16, 64) measured best-or-equal across 5..17-tap 3-D kernels on
    # v5e (block-shape sensitivity is within run-to-run noise once the
    # slab fits); the 6 MiB budget — backed by the raised Mosaic VMEM
    # ceiling — keeps wide-halo kernels (truncated gaussians) from
    # degrading to slivers like (16, 8) that read 9x the interior.
    b0, b1 = 16, 64
    while (
        (b0 + halos[0]) * _round_up(b1 + halos[1], 8) * lane * itemsize
        > _VMEM_BUDGET
        and b1 > 8
    ):
        b1 //= 2
    while (
        (b0 + halos[0]) * _round_up(b1 + halos[1], 8) * lane * itemsize
        > _VMEM_BUDGET
        and b0 > 8
    ):
        b0 //= 2
    return [b0, b1]


def _axis_apply(spec, get_slice):
    """Apply one axis's 1-D operation over shifted slices.

    ``spec`` is ('corr', taps) for weighted correlation or
    ('min'|'max', size) for a running extremum (separable morphology).
    """
    kind, arg = spec
    if kind == "corr":
        return _axis_corr(arg, get_slice)
    op = jnp.minimum if kind == "min" else jnp.maximum
    acc = get_slice(0)
    for k in range(1, arg):
        acc = op(acc, get_slice(k))
    return acc


def _axis_minmax_log(kind, size, arr, axis, out_len):
    """Running min/max over a ``size`` window along ``axis`` in
    O(log size) shifted-slice ops (min/max windows may overlap, so
    window ``n`` folds as op(window ``p``, window ``p`` shifted by
    ``n - p``) for any power of two ``p >= n/2`` — each unaligned
    lane/sublane slice costs one VPU rotation, which dominates the
    separable morphology kernels)."""
    op = jnp.minimum if kind == "min" else jnp.maximum

    def sl(a, k, ln):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(k, k + ln)
        return a[tuple(idx)]

    m = sl(arr, 0, out_len + size - 1)  # window 1
    w = 1
    while 2 * w <= size:
        ln = m.shape[axis] - w
        m = op(sl(m, 0, ln), sl(m, w, ln))
        w *= 2
    if w < size:
        d = size - w  # <= w, overlapping final fold
        ln = m.shape[axis] - d
        m = op(sl(m, 0, ln), sl(m, d, ln))
    return m


def _axis_sum_log(arr, axis, n, out_len):
    """Length-``n`` window sum along ``axis`` in O(log n) shifted-slice
    adds via binary decomposition: doubling builds the 2^k-window
    partial sums (p_{2w} = p_w + shift(p_w, w), windows disjoint so —
    unlike min/max — no overlapping fold is allowed) and each set bit
    of ``n`` contributes its partial at the running offset.  Cuts the
    uniform-filter VPU work per axis from n-1 adds (+ rotations) to
    ~popcount(n) + floor(log2 n) - 1."""

    def sl(a, k, ln):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(k, k + ln)
        return a[tuple(idx)]

    p = arr  # 1-window partial sums
    w = 1
    acc = None
    offset = 0
    nn = n
    while nn:
        if nn & 1:
            seg = sl(p, offset, out_len)
            acc = seg if acc is None else acc + seg
            offset += w
        nn >>= 1
        if nn:
            ln = p.shape[axis] - w
            p = sl(p, 0, ln) + sl(p, w, ln)
            w *= 2
    return acc


def _axis_apply_arr(spec, arr, axis, out_len, off=0):
    """Like :func:`_axis_apply` but operating on the array directly so
    min/max and uniform sums can use logarithmic folds.  ``off`` skips
    that many leading elements of ``axis`` before the window starts
    (used by the padless plan's sublane-alignment lead rows)."""
    kind, arg = spec
    if kind != "corr":
        if off:
            arr = jax.lax.slice_in_dim(
                arr, off, arr.shape[axis], axis=axis
            )
        return _axis_minmax_log(kind, arg, arr, axis, out_len)

    n = len(arg)
    if n >= 4 and all(v == arg[0] for v in arg):
        if off:
            arr = jax.lax.slice_in_dim(
                arr, off, arr.shape[axis], axis=axis
            )
        acc = _axis_sum_log(arr, axis, n, out_len)
        return acc * arg[0] if arg[0] != 1.0 else acc

    def get_slice(k):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(off + k, off + k + out_len)
        return arr[tuple(idx)]

    return _axis_corr(arg, get_slice)


def _axis_corr(w, get_slice):
    """Emit the 1-D correlation sum, exploiting equal or symmetric taps
    to cut VPU multiplies (the kernel is compute-bound on the VPU for
    small footprints)."""
    n = len(w)
    uniform = all(v == w[0] for v in w)
    symmetric = all(w[k] == w[n - 1 - k] for k in range(n // 2))
    if uniform:
        acc = get_slice(0)
        for k in range(1, n):
            acc = acc + get_slice(k)
        return acc * w[0] if w[0] != 1.0 else acc
    if symmetric and n > 2:
        mid = n // 2
        acc = w[mid] * get_slice(mid) if n % 2 == 1 else None
        for k in range(n // 2):
            term = w[k] * (get_slice(k) + get_slice(n - 1 - k))
            acc = term if acc is None else acc + term
        return acc
    acc = w[0] * get_slice(0)
    for k in range(1, n):
        acc = acc + w[k] * get_slice(k)
    return acc


def _roll_lane(arr, shift, interpret):
    """Circular shift along the lane (last) axis; jnp.roll semantics
    (element j of the result is input element j - shift, mod n)."""
    n = arr.shape[-1]
    shift %= n
    if shift == 0:
        return arr
    if interpret:
        return jnp.roll(arr, shift, axis=arr.ndim - 1)
    return pltpu.roll(arr, shift, arr.ndim - 1)


def _lane_apply_circ(spec, arr, lo, hi, mode, cval, interpret):
    """Apply a 1-D spec along the lane axis with circular indexing plus
    static boundary-column repair: the body is computed with hardware
    lane rotations (``pltpu.roll``), and only the ``lo`` left / ``hi``
    right output columns — whose circular windows wrapped around — are
    rebuilt from boundary-mapped single-column slices.

    This is the padless lane-axis treatment for ops the banded-matrix
    trick can't serve (min/max are not linear), and is also cheaper
    than the MXU matmul for small tap counts.
    """
    kind, arg = spec
    n = arr.shape[-1]
    size = arg if kind != "corr" else len(arg)

    if kind == "corr":
        acc = None
        for k, w in enumerate(arg):
            term = w * _roll_lane(arr, lo - k, interpret)
            acc = term if acc is None else acc + term
        out = acc
    else:
        op = jnp.minimum if kind == "min" else jnp.maximum
        m = arr
        span = 1
        while span < size:
            s = min(span, size - span)
            m = op(m, _roll_lane(m, -s, interpret))
            span += s
        out = _roll_lane(m, lo, interpret)

    if mode in ("wrap", "grid-wrap") or (lo == 0 and hi == 0):
        return out  # circular IS the boundary mode

    def fixed_col(j):
        src = np.arange(size) + j - lo
        mapped, oob = boundary.map_indices_np(src, n, mode)
        vals = []
        for k, (mi, ob) in enumerate(zip(mapped, oob)):
            if ob:
                col = jnp.full(arr.shape[:-1] + (1,), cval, arr.dtype)
            else:
                col = jax.lax.slice_in_dim(
                    arr, int(mi), int(mi) + 1, axis=arr.ndim - 1
                )
            if kind == "corr":
                col = arg[k] * col
            vals.append(col)
        if kind == "corr":
            v = vals[0]
            for c in vals[1:]:
                v = v + c
            return v
        op2 = jnp.minimum if kind == "min" else jnp.maximum
        v = vals[0]
        for c in vals[1:]:
            v = op2(v, c)
        return v

    # lane-masked writes: Mosaic rejects lane-axis concatenation of
    # 1-wide columns (offset mismatch), so each repaired column is
    # broadcast across lanes and selected by an iota mask instead
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, out.shape,
                                        out.ndim - 1)
    for j in list(range(lo)) + list(range(n - hi, n)):
        out = jnp.where(lane_idx == j, fixed_col(j), out)
    return out


def _banded_lane_matrix(taps, origin, n, mode, cval):
    """(n, n) matrix B and additive row c such that ``x @ B + c`` equals
    the 1-D boundary-extended correlation along the lane axis.

    Folding the boundary mode into a banded matrix removes both the
    lane-axis halo (which rounds the slab to full 128-lane tiles, a
    1.5x read amplification at 256^3) and the lane portion of the
    pre-pad pass; the matmul itself is one MXU contraction per block.
    Any ndimage mode works because 1-D boundary extension is linear in
    the input (plus a constant for (grid-)constant modes).
    """
    size = len(taps)
    lo = size // 2 + origin
    B = np.zeros((n, n), dtype=np.float64)
    c = np.zeros((n,), dtype=np.float64)
    idx = np.arange(n)
    for k, w in enumerate(taps):
        src = idx + k - lo
        mapped, oob = boundary.map_indices_np(src, n, mode)
        inb = ~oob
        np.add.at(B, (mapped[inb], idx[inb]), w)
        c[idx[~inb]] += w * cval
    return B.astype(np.float32), c.astype(np.float32)


def _edge_fix_lo(s, axis, srcs, cval):
    """Rebuild a slab whose DMA start was clamped to 0: the boundary
    rows (static ``srcs`` slab indices, ``None`` = cval) go in front and
    the read data shifts back by ``len(srcs)``."""
    parts = []
    for src in srcs:
        if src is None:
            shp = list(s.shape)
            shp[axis] = 1
            parts.append(jnp.full(shp, cval, s.dtype))
        else:
            parts.append(jax.lax.slice_in_dim(s, src, src + 1, axis=axis))
    body = jax.lax.slice_in_dim(s, 0, s.shape[axis] - len(srcs), axis=axis)
    return jnp.concatenate(parts + [body], axis=axis)


def _edge_fix_hi(s, axis, srcs, body_start, body_len, cval):
    """Rebuild a slab whose DMA start was clamped to the array end:
    valid rows sit ``body_start`` deep, the boundary rows follow, and
    any alignment tail keeps (unused) garbage to hold the shape."""
    parts = [
        jax.lax.slice_in_dim(
            s, body_start, body_start + body_len, axis=axis
        )
    ]
    for src in srcs:
        if src is None:
            shp = list(s.shape)
            shp[axis] = 1
            parts.append(jnp.full(shp, cval, s.dtype))
        else:
            parts.append(jax.lax.slice_in_dim(s, src, src + 1, axis=axis))
    tail = s.shape[axis] - body_len - len(srcs)
    if tail:
        parts.append(jax.lax.slice_in_dim(s, 0, tail, axis=axis))
    return jnp.concatenate(parts, axis=axis)


def _apply_edge_fixes(slab, slot, gids, gnums, edges, cval):
    """Patch the just-DMA'd slab in VMEM for blocks on the array
    border (first/last grid position per axis).  Interior blocks — the
    vast majority — skip both branches."""
    for ax, (gid, gnum, e) in enumerate(zip(gids, gnums, edges)):
        lo_srcs, hi_srcs, body_start, body_len = e
        if lo_srcs:
            @pl.when(gid == 0)
            def _(ax=ax, lo_srcs=lo_srcs):
                slab[slot] = _edge_fix_lo(slab[slot], ax, lo_srcs, cval)
        if hi_srcs or body_start > 0:
            @pl.when(gid == gnum - 1)
            def _(ax=ax, hi_srcs=hi_srcs, body_start=body_start,
                  body_len=body_len):
                slab[slot] = _edge_fix_hi(
                    slab[slot], ax, hi_srcs, body_start, body_len, cval
                )


def _divisors_near(n, pref, step=1):
    """Divisors of ``n`` (multiples of ``step``) ordered by closeness to
    ``pref`` (larger-first on ties)."""
    divs = [
        d for d in range(step, min(n, 8 * pref) + 1, step) if n % d == 0
    ]
    return sorted(divs, key=lambda d: (abs(math.log2(d / pref)), -d))


def _plan_padless_lanemm(shape, halos, pads, modes, cval, lane, itemsize):
    """Block plan for the 3-D lane-matmul kernel reading the UNPADDED
    input: DMA starts clamp into bounds and border blocks repair their
    halo rows in VMEM (static boundary-index tables), so the pre-pad
    HBM round trip — about half the total time of a 256^3 separable
    filter — disappears.  Returns (blocks, slabs, grid, edges, lead1)
    or None when the shape/mode combination can't satisfy the
    static-patch constraints (fallback: the padded path).  ``lead1`` is
    the count of sublane-alignment lead rows on axis 1 that the kernel
    must skip before the axis-1 window starts."""
    if lane != shape[2]:
        return None  # lane tail pad still needed

    # HBM slices on the sublane axis must start 8-aligned, so axis 1
    # leads with lo rounded up to 8 ("lead" extra rows, skipped by a
    # static in-kernel slice); axis 0 offsets are unconstrained.
    lead1 = _round_up(pads[1][0], 8) - pads[1][0]
    lo_eff = [pads[0][0], pads[1][0] + lead1]

    def slab_of(ax, b):
        if ax == 0:
            return b + halos[0]
        return lo_eff[1] + _round_up(b + pads[1][1], 8)

    def axis_ok(ax, b):
        S = shape[ax]
        sl = slab_of(ax, b)
        lo = lo_eff[ax]
        if sl > S or lo > b or sl > 2 * b + lo:
            return False
        if (lo or pads[ax][1] or sl > b) and S // b < 2:
            return False
        return True

    if shape[1] % 8:
        return None
    c0 = [d for d in _divisors_near(shape[0], 16) if axis_ok(0, d)]
    c1 = [d for d in _divisors_near(shape[1], 64, step=8)
          if axis_ok(1, d)]
    if not c0 or not c1:
        return None
    # shrink toward the VMEM budget along axis 1 first, then axis 0
    def fits(b0, b1):
        return (
            slab_of(0, b0) * slab_of(1, b1) * lane * itemsize
            <= _VMEM_BUDGET
        )
    b0, b1 = c0[0], c1[0]
    while not fits(b0, b1):
        n1 = [d for d in c1 if d < b1]
        if n1:
            b1 = max(n1)
            continue
        n0 = [d for d in c0 if d < b0]
        if not n0:
            return None
        b0 = max(n0)
    blocks = [b0, b1]
    slabs = [slab_of(0, b0), slab_of(1, b1)]
    grid = [shape[0] // b0, shape[1] // b1]
    edges = []
    for ax in (0, 1):
        S, B, sl = shape[ax], blocks[ax], slabs[ax]
        lo, hi = pads[ax]
        lo_srcs = []
        if lo or (ax == 1 and lead1 and (lo or hi)):
            # lead rows are never read — fill from row 0
            lo_srcs = [0] * (lo_eff[ax] - lo)
            m, oob = boundary.map_indices_np(
                np.arange(-lo, 0), S, modes[ax]
            )
            for mi, ob in zip(m, oob):
                if ob:
                    lo_srcs.append(None)
                elif 0 <= mi < sl:
                    lo_srcs.append(int(mi))
                else:
                    return None  # e.g. wrap: needs the far end
        hi_srcs = []
        if hi:
            m, oob = boundary.map_indices_np(
                np.arange(S, S + hi), S, modes[ax]
            )
            for mi, ob in zip(m, oob):
                if ob:
                    hi_srcs.append(None)
                elif S - sl <= mi < S:
                    hi_srcs.append(int(mi - (S - sl)))
                else:
                    return None
        edges.append(
            (
                tuple(lo_srcs), tuple(hi_srcs),
                sl - B - lo_eff[ax], B + lo_eff[ax],
            )
        )
    return blocks, slabs, grid, tuple(edges), lead1


def _make_kernel_3d_lanemm(sp0, sp1, S2, B0, B1, sl0, sl1, exact=False,
                           clamp=None, edges=None, cval=0.0, lead1=0):
    """3-D kernel: sublane-axis passes as shifted adds, lane-axis pass
    as a banded-matrix MXU matmul (3-pass bf16 hi/lo split, ~2^-22
    relative — below the f32 tap-sum roundoff of the shift path)."""

    def split3(m):
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def kernel(x_any, bmat, crow, out_ref, slab, sem):
        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        i = i32(pl.program_id(0))
        j = i32(pl.program_id(1))
        g1 = i32(pl.num_programs(1))
        t = i * g1 + j
        n_t = i32(pl.num_programs(0)) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            ii = jnp.asarray(jax.lax.div(tt, g1), jnp.int32)
            jj = jnp.asarray(jax.lax.rem(tt, g1), jnp.int32)
            if clamp is None:
                s0, s1 = ii * B0, jj * B1
            else:
                lo0, lim0, lo1, lim1 = clamp
                s0 = jnp.clip(ii * B0 - lo0, 0, lim0)
                s1 = jnp.clip(jj * B1 - lo1, 0, lim1)
                # B1, lo1 and lim1 are all multiples of 8 by plan
                # construction; Mosaic can't prove that through the
                # clip, so assert the sublane tile alignment
                s1 = pl.multiple_of(s1, 8)
            return pltpu.make_async_copy(
                x_any.at[pl.ds(s0, sl0), pl.ds(s1, sl1), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()

        if edges is not None:
            _apply_edge_fixes(
                slab, slot, (i, j), (i32(pl.num_programs(0)), g1),
                edges, cval,
            )

        x = slab[slot]
        acc = (
            _axis_apply_arr(sp0, x, 0, B0)
            if sp0 is not None else x
        )
        acc1 = (
            _axis_apply_arr(sp1, acc, 1, B1, off=lead1)
            if sp1 is not None else acc
        )
        flat = acc1.reshape(B0 * B1, S2)
        if exact:
            # interpret mode (CPU tests): true-f32 dot.  Pallas
            # interpret lowers default-precision dots at TPU-emulating
            # bf16 even on CPU, so HIGHEST is required for the tier's
            # 1e-6 tolerances.
            out = jnp.dot(flat, bmat[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        else:
            fhi, flo = split3(flat)
            bhi, blo = split3(bmat[:])
            out = jnp.dot(fhi, bhi, preferred_element_type=jnp.float32)
            out = out + jnp.dot(
                fhi, blo, preferred_element_type=jnp.float32)
            out = out + jnp.dot(
                flo, bhi, preferred_element_type=jnp.float32)
        out = out + crow[:]
        out_ref[:] = out.reshape(B0, B1, S2).astype(out_ref.dtype)

    return kernel


def _make_kernel_3d_laneroll(sp0, sp1, sp2, B0, B1, sl0, sl1,
                             lane_edge, mode2, cval=0.0, exact=False,
                             clamp=None, edges=None, lead1=0):
    """3-D padless kernel for ANY per-axis spec mix: sublane-axis passes
    as shifted slices, lane-axis pass with circular hardware rotations +
    static boundary-column repair (:func:`_lane_apply_circ`).  Unlike the
    banded-matmul variant this serves min/max (non-linear) lane passes,
    and for small tap counts it beats the MXU matmul on the VPU.
    ``lane_edge`` is (lo2, hi2) of the lane window."""

    def kernel(x_any, out_ref, slab, sem):
        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        i = i32(pl.program_id(0))
        j = i32(pl.program_id(1))
        g1 = i32(pl.num_programs(1))
        t = i * g1 + j
        n_t = i32(pl.num_programs(0)) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            ii = jnp.asarray(jax.lax.div(tt, g1), jnp.int32)
            jj = jnp.asarray(jax.lax.rem(tt, g1), jnp.int32)
            if clamp is None:
                s0, s1 = ii * B0, jj * B1
            else:
                lo0, lim0, lo1, lim1 = clamp
                s0 = jnp.clip(ii * B0 - lo0, 0, lim0)
                s1 = jnp.clip(jj * B1 - lo1, 0, lim1)
                s1 = pl.multiple_of(s1, 8)
            return pltpu.make_async_copy(
                x_any.at[pl.ds(s0, sl0), pl.ds(s1, sl1), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()

        if edges is not None:
            _apply_edge_fixes(
                slab, slot, (i, j), (i32(pl.num_programs(0)), g1),
                edges, cval,
            )

        x = slab[slot]
        acc = (
            _axis_apply_arr(sp0, x, 0, B0)
            if sp0 is not None else x
        )
        acc = (
            _axis_apply_arr(sp1, acc, 1, B1, off=lead1)
            if sp1 is not None else acc
        )
        if sp2 is not None:
            acc = _lane_apply_circ(
                sp2, acc, lane_edge[0], lane_edge[1], mode2, cval,
                exact,
            )
        out_ref[:] = acc.astype(out_ref.dtype)

    return kernel


def _toeplitz_lane_w(taps, k_width=256):
    """(k_width, 128) Toeplitz tap matrix W with W[b + k, b] = taps[k].

    With the input pre-padded by the boundary mode, the lane-axis
    correlation of output tile j is ``xp[:, 128j : 128j + k_width] @ W``
    — a 128-aligned lane slice (no VPU lane rotations) contracted on
    the MXU.  One shared W serves every tile."""
    W = np.zeros((k_width, 128), dtype=np.float32)
    for k, w in enumerate(taps):
        a = np.arange(128) + k
        W[a, np.arange(128)] = w
    return W


def _make_kernel_2d_lanemm(sp0, B0, sl0, lane_in, n_tiles, exact=False,
                           lane_roll=0):
    """2-D kernel: sublane-axis pass as shifted adds, lane-axis pass as
    per-tile Toeplitz matmuls on the MXU (same hi/lo bf16 3-pass split
    as the 3-D variant; ~2^-22 relative)."""

    def split3(m):
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def kernel(x_any, wmat, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()

        x = _lane_unroll(slab[slot], lane_roll, exact)
        acc = (
            _axis_apply_arr(sp0, x, 0, B0)
            if sp0 is not None else x
        )
        if exact:
            for j in range(n_tiles):
                seg = acc[:, 128 * j : 128 * j + 256]
                out_ref[:, 128 * j : 128 * (j + 1)] = jnp.dot(
                    seg, wmat[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(out_ref.dtype)
        else:
            whi, wlo = split3(wmat[:])
            for j in range(n_tiles):
                seg = acc[:, 128 * j : 128 * j + 256]
                shi, slo = split3(seg)
                o = jnp.dot(shi, whi, preferred_element_type=jnp.float32)
                o = o + jnp.dot(
                    shi, wlo, preferred_element_type=jnp.float32)
                o = o + jnp.dot(
                    slo, whi, preferred_element_type=jnp.float32)
                out_ref[:, 128 * j : 128 * (j + 1)] = o.astype(
                    out_ref.dtype
                )

    return kernel


def _lane_unroll(v, amt, interpret):
    """Undo the circular lane layout: one static right-roll that puts
    the lo-halo columns (stored at the end of the aligned extent) back
    in front of the data."""
    if not amt:
        return v
    if interpret:
        return jnp.roll(v, amt, axis=-1)
    if v.ndim > 2:
        shp = v.shape
        flat = v.reshape(-1, shp[-1])
        return pltpu.roll(flat, amt, 1).reshape(shp)
    return pltpu.roll(v, amt, v.ndim - 1)


def _pair_combine_out(pair, x, chains, lens):
    """Combine the min/max chains of a pair-fused kernel: ``grad`` =
    max - min, ``laplace`` = max + min - 2x (x = the interior block,
    sliced at each axis's static window-lo offset)."""
    combine, *los = pair
    mn, mx = chains
    if combine == "grad":
        return mx - mn
    idx = tuple(
        slice(lo, lo + ln) for lo, ln in zip(los, lens)
    )
    return mx + mn - 2.0 * x[idx]


def _make_kernel_3d(sp0, sp1, sp2, S2, B0, B1, sl0, sl1,
                    lane_roll=0, interpret=False, sps2=None,
                    exts2=(0, 0, 0), pair=None):
    def kernel(x_any, out_ref, slab, sem):
        # double-buffered halo'd slab loads: kick off the next grid
        # step's DMA before waiting on this step's
        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        i = i32(pl.program_id(0))
        j = i32(pl.program_id(1))
        g1 = i32(pl.num_programs(1))
        t = i * g1 + j
        n_t = i32(pl.num_programs(0)) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            ii = jax.lax.div(tt, g1)
            jj = jax.lax.rem(tt, g1)
            ii = jnp.asarray(ii, jnp.int32)
            jj = jnp.asarray(jj, jnp.int32)
            return pltpu.make_async_copy(
                x_any.at[
                    pl.ds(ii * B0, sl0), pl.ds(jj * B1, sl1), :
                ],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()

        x = _lane_unroll(slab[slot], lane_roll, interpret)
        # stage-1 keeps the stage-2 halo (exts2) on each filtered axis;
        # single-stage and pair runs have exts2 == 0 everywhere
        e0, e1, e2 = exts2

        def chain(s0, s1, s2):
            acc = (
                _axis_apply_arr(s0, x, 0, B0 + e0)
                if s0 is not None else x
            )
            acc1 = (
                _axis_apply_arr(s1, acc, 1, B1 + e1)
                if s1 is not None else acc
            )
            # no lane-axis filter: the slab is still lane-padded to a
            # full 128-lane extent — slice back to the block width
            return (
                _axis_apply_arr(s2, acc1, 2, S2 + e2)
                if s2 is not None else acc1[:, :, :S2 + e2]
            )

        out = chain(sp0, sp1, sp2)
        if pair is not None:
            out = _pair_combine_out(
                pair, x, (out, chain(*sps2)), (B0, B1, S2)
            )
        elif sps2 is not None:
            for ax, (sb, ln) in enumerate(zip(sps2, (B0, B1, S2))):
                if sb is not None:
                    out = _axis_apply_arr(sb, out, ax, ln)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _make_kernel_2d(sp0, sp1, S1, B0, sl0, lane_roll=0,
                    interpret=False, sps2=None, exts2=(0, 0),
                    pair=None):
    def kernel(x_any, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()

        x = _lane_unroll(slab[slot], lane_roll, interpret)
        e0, e1 = exts2

        def chain(s0, s1):
            acc = (
                _axis_apply_arr(s0, x, 0, B0 + e0)
                if s0 is not None else x
            )
            # no lane-axis filter: the slab is still lane-padded to a
            # full 128-lane extent — slice back to the block width
            return (
                _axis_apply_arr(s1, acc, 1, S1 + e1)
                if s1 is not None else acc[:, :S1 + e1]
            )

        out = chain(sp0, sp1)
        if pair is not None:
            out = _pair_combine_out(
                pair, x, (out, chain(*sps2)), (B0, S1)
            )
        elif sps2 is not None:
            for ax, (sb, ln) in enumerate(zip(sps2, (B0, S1))):
                if sb is not None:
                    out = _axis_apply_arr(sb, out, ax, ln)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def fused_separable_correlate(
    x, weights, origins, modes, cval=0.0, interpret=False
):
    """Apply per-axis 1-D correlations in one fused Pallas pass.

    Parameters
    ----------
    x : (S0, S1[, S2]) float array
    weights : tuple of (tuple of float) or None, one per axis
        Static filter taps (None = skip axis).
    origins : tuple of int, per axis
    modes : tuple of str, ndimage boundary mode per axis
    cval : float
    interpret : bool
        Run in the Pallas interpreter (CPU testing).
    """
    specs = tuple(
        None if w is None else ("corr", tuple(float(v) for v in w))
        for w in weights
    )
    return _fused_separable(
        x, specs, tuple(origins), tuple(modes), float(cval),
        bool(interpret),
    )


def fused_separable_minmax(
    x, sizes, origins, modes, cval=0.0, is_min=True, interpret=False
):
    """Separable box min/max filter in one fused Pallas pass
    (the erosion/dilation analog of :func:`fused_separable_correlate`;
    SURVEY.md N2's separable min/max option)."""
    kind = "min" if is_min else "max"
    specs = tuple(
        None if (sz is None or sz <= 1) else (kind, int(sz))
        for sz in sizes
    )
    return _fused_separable(
        x, specs, tuple(origins), tuple(modes), float(cval),
        bool(interpret),
    )


def fused_separable_open_close(
    x, sizes, origins1, origins2, modes, cval=0.0, opening=True,
    interpret=False,
):
    """Grey opening/closing over a flat rectangular footprint in ONE
    fused Pallas pass: the min and max stages share a single halo'd
    slab load instead of two whole-volume HBM round trips (the
    reference chains two full filter calls —
    cupyimg/scipy/ndimage/morphology.py:929-989).

    Exactness requires boundary extension to commute with the stage-1
    filter over the pad region: symmetric windows (odd size, origin 0)
    under reflect/mirror/grid-mirror, or any window under
    wrap/grid-wrap.  The morphology driver gates on exactly that.
    """
    k1, k2 = ("min", "max") if opening else ("max", "min")
    specs1 = tuple(
        None if (sz is None or sz <= 1) else (k1, int(sz))
        for sz in sizes
    )
    specs2 = tuple(
        None if (sz is None or sz <= 1) else (k2, int(sz))
        for sz in sizes
    )
    return _fused_separable(
        x, specs1, tuple(origins1), tuple(modes), float(cval),
        bool(interpret), specs2=specs2, origins2=tuple(origins2),
    )


def fused_separable_morph_pair(
    x, sizes, origins, modes, cval=0.0, combine="grad", interpret=False,
):
    """Morphological gradient/laplace over a flat rectangular footprint
    in ONE fused Pallas pass: the dilation and erosion folds read the
    same halo'd slab, so the two whole-volume filter passes plus the
    elementwise combine collapse into a single HBM round trip (the
    reference runs three — cupyimg/scipy/ndimage/morphology.py:991-1054).

    ``combine``: ``"grad"`` = max - min; ``"laplace"`` = max + min - 2x.
    Both stages read the same padded input, so (unlike the two-stage
    opening fusion) this is exact for every boundary mode; the driver
    gates on equal min/max windows (odd sizes, origin 0), where the
    dilation origin negation is the identity.
    """
    kmin = tuple(
        None if (sz is None or sz <= 1) else ("min", int(sz))
        for sz in sizes
    )
    kmax = tuple(
        None if (sz is None or sz <= 1) else ("max", int(sz))
        for sz in sizes
    )
    return _fused_separable(
        x, kmin, tuple(origins), tuple(modes), float(cval),
        bool(interpret), specs2=kmax, origins2=tuple(origins),
        pair_combine=combine,
    )


def _spec_size(spec):
    return len(spec[1]) if spec[0] == "corr" else spec[1]


@functools.partial(
    jax.jit,
    static_argnames=(
        "specs", "origins", "modes", "cval", "interpret",
        "specs2", "origins2", "pair_combine",
    ),
)
def _fused_separable(x, specs, origins, modes, cval, interpret,
                     specs2=None, origins2=None, pair_combine=None):
    ndim = x.ndim
    dtype = x.dtype
    shape = x.shape
    two_stage = specs2 is not None

    # lane-axis correlation as a banded-matrix MXU matmul: no lane halo
    # (which would round the slab to full 128-lane tiles) and no lane
    # portion of the pre-pad pass — the boundary mode folds into the
    # matrix because 1-D boundary extension is linear
    lane_mm = (
        ndim == 3
        and not two_stage
        and specs[2] is not None
        and specs[2][0] == "corr"
        and shape[2] <= 768
        and np.dtype(dtype) == np.float32
    )
    # 2-D lane-axis correlation as per-tile Toeplitz MXU matmuls on
    # 128-aligned slices: the shift path's unaligned lane slices cost
    # one VPU lane-rotation per tap, which dominates for wide taps
    # (gaussian sigma=3 ran at 85 GB/s vs uniform size=7 at 286 GB/s)
    lane_mm2 = (
        ndim == 2
        and not two_stage
        and specs[1] is not None
        and specs[1][0] == "corr"
        and np.dtype(dtype) == np.float32
        and _LANE_MM2_MIN_TAPS <= len(specs[1][1]) <= 96
    )

    def _window(spec, origin):
        if spec is None:
            return (0, 0)
        size = _spec_size(spec)
        lo = size // 2 + origin
        hi = size - 1 - lo
        if lo < 0 or hi < 0:
            raise ValueError("fused path requires in-window origins")
        return (lo, hi)

    # per-axis (lo, hi) boundary extension: scipy window convention.
    # Two-stage (opening/closing) runs accumulate both stages' windows
    # into one pad — exact whenever extension commutes with the stage-1
    # filter over the pad region (symmetric windows under the symmetric
    # modes, any window under wrap; the caller gates this).
    pads = []
    halos = []
    for ax in range(ndim):
        spec = specs[ax]
        if spec is None or (lane_mm and ax == 2):
            pads.append((0, 0))
            halos.append(0)
        else:
            lo, hi = _window(spec, origins[ax])
            if two_stage:
                lo2, hi2 = _window(specs2[ax], origins2[ax])
                if pair_combine is not None:
                    # pair mode: both folds read the SAME slab, so the
                    # windows must coincide (the driver gates on this)
                    if (lo2, hi2) != (lo, hi):
                        raise ValueError(
                            "pair fusion requires equal windows"
                        )
                else:
                    lo += lo2
                    hi += hi2
            pads.append((lo, hi))
            halos.append(lo + hi)

    # lane axis: halo'd extent rounded up to full 128-lane tiles
    lane_lo, lane_hi = pads[-1]
    lane = _round_up(shape[-1] + lane_lo + lane_hi, 128)
    if lane_mm2:
        # tile j contracts xp[:, 128j : 128j + 256]; the last output
        # tile therefore needs the input to extend 128 lanes past it
        lane_out2 = _round_up(shape[-1], 128)
        lane = lane_out2 + 128

    # padless fast path: read the raw input, clamp the DMA windows into
    # bounds, and let border blocks repair their halos in VMEM — the
    # whole-array boundary.pad round trip disappears
    padless = None
    if lane_mm:
        padless = _plan_padless_lanemm(
            shape, halos, pads, modes, cval, lane,
            np.dtype(dtype).itemsize,
        )
    if padless is not None:
        blocks, slabs, grid, edges, lead1 = padless
        xp = x
        B0, B1 = blocks
        taps = specs[2][1]
        Bmat, crow = _banded_lane_matrix(
            taps, origins[2], shape[2], modes[2], cval
        )
        kernel = _make_kernel_3d_lanemm(
            specs[0], specs[1], lane, B0, B1, slabs[0], slabs[1],
            exact=interpret,
            clamp=(
                pads[0][0], shape[0] - slabs[0],
                pads[1][0] + lead1, shape[1] - slabs[1],
            ),
            edges=edges, cval=cval, lead1=lead1,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (shape[0], shape[1], lane), dtype
            ),
            grid=(grid[0], grid[1]),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B0, B1, lane),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], slabs[1], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp, jnp.asarray(Bmat), jnp.asarray(crow[None, :]))
        return out

    # padless roll path: same clamped-DMA + in-VMEM halo repair as the
    # lane-matmul plan, but the lane axis runs as circular hardware
    # rotations with static boundary-column repair — this serves min/max
    # (non-linear, so no banded matrix exists) and small-tap correlations
    if (
        ndim == 3
        and not two_stage
        and shape[2] >= 128
        and shape[2] % 128 == 0
        and np.dtype(dtype).itemsize == 4
    ):
        if specs[2] is None:
            lo2 = hi2 = 0
        else:
            size2 = _spec_size(specs[2])
            lo2 = size2 // 2 + origins[2]
            hi2 = size2 - 1 - lo2
        if lo2 + hi2 < shape[2]:
            plan = _plan_padless_lanemm(
                shape, [halos[0], halos[1], 0],
                [pads[0], pads[1], (0, 0)], modes, cval, shape[2],
                np.dtype(dtype).itemsize,
            )
        else:
            plan = None
        if plan is not None:
            blocks, slabs, grid, edges, lead1 = plan
            B0, B1 = blocks
            kernel = _make_kernel_3d_laneroll(
                specs[0], specs[1], specs[2], B0, B1,
                slabs[0], slabs[1], (lo2, hi2), modes[2], cval=cval,
                exact=interpret,
                clamp=(
                    pads[0][0], shape[0] - slabs[0],
                    pads[1][0] + lead1, shape[1] - slabs[1],
                ),
                edges=edges, lead1=lead1,
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape, dtype),
                grid=(grid[0], grid[1]),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (B0, B1, shape[2]),
                    lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, slabs[0], slabs[1], shape[2]), dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=_VMEM_LIMIT,
                ),
                interpret=interpret,
            )(x)
            return out

    blocks = _choose_blocks(
        shape, halos, lane, np.dtype(dtype).itemsize
    )

    # DMA slab extents: the sublane (second-to-last) dim of a sliced
    # VMEM copy must be a multiple of 8 — round up and over-read
    slabs = []
    for ax, b in enumerate(blocks):
        ext = b + halos[ax]
        if ax == ndim - 2:
            ext = _round_up(ext, 8)
        slabs.append(ext)

    # ONE combined pad: boundary extension + grid tail + lane
    # alignment.  Tail values are never written to the output, so
    # extending them with the boundary mode is harmless — a single
    # jnp.pad materialization instead of one HBM round trip per axis.
    #
    # The lane axis never gets a leading pad: a lane lo-shift moves
    # every 128-lane tile (a misaligned whole-array copy, measured at
    # ~2x the kernel's own time for 3-D min filters).  Instead the
    # left-halo columns are stored at the END of the aligned lane
    # extent ([.. x | hi-halo | zero gap | lo-halo]) and each kernel
    # restores the shifted layout with one static in-VMEM lane roll.
    lane_circ = (ndim == 3 and not lane_mm) and (lane_lo > 0 or lane_hi > 0)
    grid = []
    total_pads = list(pads)
    for ax, b in enumerate(blocks):
        g = math.ceil(shape[ax] / b)
        grid.append(g)
        target = (g - 1) * b + slabs[ax]
        lo, hi = total_pads[ax]
        total_pads[ax] = (lo, max(hi, target - shape[ax] - lo))
    if lane_circ:
        total_pads[-1] = (0, 0)
    else:
        total_pads[-1] = (
            lane_lo, lane_hi + lane - (shape[-1] + lane_lo + lane_hi)
        )

    active_modes = {
        modes[ax]
        for ax in range(ndim)
        if total_pads[ax] != (0, 0)
    }
    max_rel_pad = max(
        max(pd) / shape[ax] for ax, pd in enumerate(total_pads)
    )
    if len(active_modes) <= 1 and max_rel_pad < 1.0:
        one_mode = active_modes.pop() if active_modes else "constant"
        xp = boundary.pad(x, total_pads, one_mode, cval)
    else:
        xp = x
        for ax in range(ndim):
            if pads[ax] == (0, 0) or (lane_circ and ax == ndim - 1):
                continue
            pw = [(0, 0)] * ndim
            pw[ax] = pads[ax]
            xp = boundary.pad(xp, pw, modes[ax], cval)
        tail = [
            (0, tp[0] + tp[1] - pd[0] - pd[1])
            for tp, pd in zip(total_pads, pads)
        ]
        if lane_circ:
            tail[-1] = (0, 0)
        if any(hi for _, hi in tail):
            xp = jnp.pad(xp, tail)

    if lane_circ:
        W = shape[-1]
        gap = lane - (W + lane_lo + lane_hi)
        parts = [xp]
        lmode = modes[-1]
        if lane_hi:
            idx, oob = boundary.map_indices_np(
                np.arange(W, W + lane_hi), W, lmode
            )
            strip = jnp.take(xp, jnp.asarray(idx), axis=ndim - 1)
            if oob.any():
                strip = jnp.where(
                    jnp.asarray(oob), jnp.asarray(cval, dtype), strip
                )
            parts.append(strip)
        if gap:
            gshape = list(xp.shape)
            gshape[-1] = gap
            parts.append(jnp.zeros(gshape, dtype))
        if lane_lo:
            idx, oob = boundary.map_indices_np(
                np.arange(-lane_lo, 0), W, lmode
            )
            strip = jnp.take(xp, jnp.asarray(idx), axis=ndim - 1)
            if oob.any():
                strip = jnp.where(
                    jnp.asarray(oob), jnp.asarray(cval, dtype), strip
                )
            parts.append(strip)
        xp = jnp.concatenate(parts, axis=ndim - 1)
    lane_roll = lane_lo if lane_circ else 0

    if ndim == 3 and lane_mm:
        B0, B1 = blocks
        taps = specs[2][1]
        Bmat, crow = _banded_lane_matrix(
            taps, origins[2], shape[2], modes[2], cval
        )
        if lane != shape[2]:
            Bmat = np.pad(Bmat, ((0, lane - shape[2]),) * 2)
            crow = np.pad(crow, (0, lane - shape[2]))
        kernel = _make_kernel_3d_lanemm(
            specs[0], specs[1], lane, B0, B1, slabs[0], slabs[1],
            exact=interpret,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, grid[1] * B1, lane), dtype
            ),
            grid=(grid[0], grid[1]),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B0, B1, lane),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], slabs[1], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp, jnp.asarray(Bmat), jnp.asarray(crow[None, :]))
        return out[: shape[0], : shape[1], : shape[2]]

    exts2 = tuple(
        (_spec_size(specs2[ax]) - 1)
        if (two_stage and pair_combine is None
            and specs2[ax] is not None)
        else 0
        for ax in range(ndim)
    )
    pair = (
        None if pair_combine is None
        else (pair_combine,) + tuple(lo for lo, _ in pads)
    )
    if ndim == 3:
        B0, B1 = blocks
        kernel = _make_kernel_3d(
            specs[0], specs[1], specs[2], shape[2],
            B0, B1, slabs[0], slabs[1],
            lane_roll=lane_roll, interpret=interpret,
            sps2=specs2, exts2=exts2, pair=pair,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, grid[1] * B1, shape[2]), dtype
            ),
            grid=(grid[0], grid[1]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (B0, B1, shape[2]),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], slabs[1], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp)
        out = out[: shape[0], : shape[1], : shape[2]]
    elif lane_mm2:
        (B0,) = blocks
        n_tiles = lane_out2 // 128
        W = _toeplitz_lane_w(specs[1][1])
        kernel = _make_kernel_2d_lanemm(
            specs[0], B0, slabs[0], lane, n_tiles, exact=interpret,
            lane_roll=lane_roll,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, lane_out2), dtype
            ),
            grid=(grid[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B0, lane_out2), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp, jnp.asarray(W))
        out = out[: shape[0], : shape[1]]
    else:
        (B0,) = blocks
        kernel = _make_kernel_2d(
            specs[0], specs[1], shape[1], B0, slabs[0],
            lane_roll=lane_roll, interpret=interpret,
            sps2=specs2, exts2=exts2, pair=pair,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, shape[1]), dtype
            ),
            grid=(grid[0],),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (B0, shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp)
        out = out[: shape[0], : shape[1]]

    return out


# ---------------------------------------------------------------------------
# dense nd correlation (non-separable kernels)
# ---------------------------------------------------------------------------

# unrolled tap FMA count cap for the dense kernel (compile-time bound);
# 31x31 and 11x11x11 footprints stay comfortably inside
_MAX_DENSE_TAPS = 1400


def supports_dense(x, weights, interpret=False):
    """Whether the dense fused Pallas path applies.

    ``weights`` must be a concrete numpy array (zero taps are skipped
    statically, subsuming the reference's sparse masked kernel,
    cupyimg/scipy/ndimage/_kernels/filters_v2.py:17-72).
    """
    if not interpret and jax.default_backend() != "tpu":
        return False
    if not isinstance(weights, np.ndarray):
        return False
    if np.dtype(x.dtype).kind != "f" or np.dtype(x.dtype).itemsize > 4:
        return False
    if np.dtype(weights.dtype).kind not in "fiub":
        return False
    if x.ndim not in (2, 3) or weights.ndim != x.ndim:
        return False
    nnz = int(np.count_nonzero(weights))
    if nnz == 0 or nnz > _MAX_DENSE_TAPS:
        return False
    if any(ws > 2 * s for ws, s in zip(weights.shape, x.shape)):
        return False
    if not interpret and x.size < (1 << 20):
        return False
    return True


def _group_taps_by_row(taps):
    """taps [(idx..., w)] -> [(ki, [(trailing-idx..., w)])] in row order.

    Grouping keeps the unrolled accumulation's live set small: one
    row-shifted strip at a time (a flat 2-D unroll of 225+ taps made
    Mosaic's register allocator spill 213 MB at 15x15)."""
    rows = {}
    for idx, w in taps:
        rows.setdefault(idx[0], []).append((idx[1:], w))
    return sorted(rows.items())


def _group_taps_by_col(taps):
    """taps [(idx..., w)] -> [(kj, [(leading-idx..., w)])] in column
    order (2-D only)."""
    cols = {}
    for (ki, kj), w in taps:
        cols.setdefault(kj, []).append((ki, w))
    return sorted(cols.items())


def _make_dense_kernel_2d(taps, S1, B0, sl0):
    """2-D dense stencil, taps grouped by COLUMN offset: each distinct
    kj costs ONE unaligned lane slice of the slab (a VPU lane
    rotation), then every row tap on that column is a sublane-offset
    FMA.  Row grouping paid one lane rotation per nonzero tap (49 for
    a 7x7 kernel) and ran 4x slower than this layout on v5e."""
    cols = _group_taps_by_col(taps)

    def kernel(x_any, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        # accumulate through out_ref per column tap: an unmaterialized
        # chain over many taps lets the Mosaic scheduler hoist every
        # shifted slice at once (961 taps spilled 165+ MB of vregs);
        # the ref round-trip bounds the live set per column
        first = True
        for kj, row_taps in cols:
            strip = x[:, kj : kj + S1]
            part = None
            for ki, w in row_taps:
                term = w * strip[ki : ki + B0]
                part = term if part is None else part + term
            if first:
                out_ref[:] = part.astype(out_ref.dtype)
                first = False
            else:
                out_ref[:] = out_ref[:] + part.astype(out_ref.dtype)

    return kernel


def _make_dense_kernel_2d_lanemm(taps, wshape, B0, sl0, n_tiles,
                                 exact=False):
    """2-D dense stencil with the lane correlation on the MXU: for each
    kernel row ki a Toeplitz tap matrix W_ki, and per output tile j
    ``out += x[ki : ki + B0, 128j : 128j + 256] @ W_ki`` — 128-aligned
    slices only, no VPU lane rotations (the shift path pays one per
    nonzero tap, 225 for a 15x15 kernel)."""
    rows = _group_taps_by_row(taps)
    Ws = []
    for ki, lane_taps in rows:
        dense = [0.0] * wshape[1]
        for (kj,), w in lane_taps:
            dense[kj] = w
        Ws.append(_toeplitz_lane_w(tuple(dense)))
    W3 = np.stack(Ws)  # (nrows, 256, 128)
    row_kis = [ki for ki, _ in rows]

    def kernel(x_any, wmat, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        if exact:
            for j in range(n_tiles):
                acc = None
                for r, ki in enumerate(row_kis):
                    seg = x[ki : ki + B0, 128 * j : 128 * j + 256]
                    o = jnp.dot(seg, wmat[r],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                    acc = o if acc is None else acc + o
                out_ref[:, 128 * j : 128 * (j + 1)] = acc.astype(
                    out_ref.dtype
                )
            return
        xhi = x.astype(jnp.bfloat16)
        xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        whi = wmat[:].astype(jnp.bfloat16)
        wlo = (wmat[:] - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        for j in range(n_tiles):
            acc = None
            for r, ki in enumerate(row_kis):
                shi = xhi[ki : ki + B0, 128 * j : 128 * j + 256]
                slo = xlo[ki : ki + B0, 128 * j : 128 * j + 256]
                o = jnp.dot(shi, whi[r],
                            preferred_element_type=jnp.float32)
                o = o + jnp.dot(shi, wlo[r],
                                preferred_element_type=jnp.float32)
                o = o + jnp.dot(slo, whi[r],
                                preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
            out_ref[:, 128 * j : 128 * (j + 1)] = acc.astype(
                out_ref.dtype
            )

    return kernel, W3


def _make_dense_kernel_3d(taps, S2, B0, B1, sl0, sl1):
    def kernel(x_any, out_ref, slab, sem):
        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        i = i32(pl.program_id(0))
        j = i32(pl.program_id(1))
        g1 = i32(pl.num_programs(1))
        t = i * g1 + j
        n_t = i32(pl.num_programs(0)) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            ii = jnp.asarray(jax.lax.div(tt, g1), jnp.int32)
            jj = jnp.asarray(jax.lax.rem(tt, g1), jnp.int32)
            return pltpu.make_async_copy(
                x_any.at[
                    pl.ds(ii * B0, sl0), pl.ds(jj * B1, sl1), :
                ],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        first = True
        for ki, inner in _group_taps_by_row(taps):
            strip = x[ki : ki + B0]
            part = None
            for (kj, kk), w in inner:
                term = w * strip[:, kj : kj + B1, kk : kk + S2]
                part = term if part is None else part + term
            if first:
                out_ref[:] = part.astype(out_ref.dtype)
                first = False
            else:
                out_ref[:] = out_ref[:] + part.astype(out_ref.dtype)

    return kernel


def fused_dense_correlate(
    x, weights, origins, mode, cval=0.0, interpret=False
):
    """Dense nd correlation in one fused Pallas pass.

    TPU-native replacement for the reference's generated dense nd
    stencil (cupyimg/scipy/ndimage/_filters_core.py:190-348): one
    halo'd slab DMA per block, every (nonzero) tap an unrolled
    shifted-slice FMA in VMEM.  ``weights`` is a concrete numpy array;
    callers gate via :func:`supports_dense`.
    """
    weights = np.asarray(weights)
    taps = tuple(
        (tuple(int(v) for v in idx), float(weights[tuple(idx)]))
        for idx in np.argwhere(weights != 0.0)
    )
    return _fused_dense(
        x, taps, weights.shape, tuple(int(o) for o in origins),
        str(mode), float(cval), bool(interpret),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "wshape", "origins", "mode", "cval", "interpret",
    ),
)
def _fused_dense(x, taps, wshape, origins, mode, cval, interpret):
    ndim = x.ndim
    dtype = x.dtype
    shape = x.shape

    pads = []
    halos = []
    for ax in range(ndim):
        size = wshape[ax]
        lo = size // 2 + origins[ax]
        hi = size - 1 - lo
        if lo < 0 or hi < 0:
            raise ValueError("dense path requires in-window origins")
        pads.append((lo, hi))
        halos.append(size - 1)

    # wide kernel rows route the lane correlation to per-row Toeplitz
    # MXU matmuls (cost scales with kernel rows, not nonzero taps)
    lane_mm2 = (
        ndim == 2
        and _LANE_MM2_MIN_TAPS <= wshape[1] <= 128
        and np.dtype(dtype) == np.float32
    )
    lane_lo, lane_hi = pads[-1]
    lane = _round_up(shape[-1] + lane_lo + lane_hi, 128)
    if lane_mm2:
        lane_out2 = _round_up(shape[-1], 128)
        lane = lane_out2 + 128
    blocks = _choose_blocks(
        shape, halos, lane, np.dtype(dtype).itemsize
    )
    # many-tap unrolls raise Mosaic's register pressure (a 15x15 unroll
    # at B0=256 spilled 213 MB); shrink the leading block with tap count
    # (the matmul path keeps full blocks — taps live in the W operand,
    # not in unrolled vregs)
    nnz = len(taps)
    if not lane_mm2:
        if nnz > 96:
            blocks[0] = min(blocks[0], 64)
        if nnz > 384:
            blocks[0] = min(blocks[0], 32)

    slabs = []
    for ax, b in enumerate(blocks):
        ext = b + halos[ax]
        if ax == ndim - 2:
            ext = _round_up(ext, 8)
        slabs.append(ext)

    grid = []
    total_pads = list(pads)
    for ax, b in enumerate(blocks):
        g = math.ceil(shape[ax] / b)
        grid.append(g)
        target = (g - 1) * b + slabs[ax]
        lo, hi = total_pads[ax]
        total_pads[ax] = (lo, max(hi, target - shape[ax] - lo))
    total_pads[-1] = (
        lane_lo, lane_hi + lane - (shape[-1] + lane_lo + lane_hi)
    )

    max_rel_pad = max(
        max(pd) / shape[ax] for ax, pd in enumerate(total_pads)
    )
    if max_rel_pad < 1.0:
        xp = boundary.pad(x, total_pads, mode, cval)
    else:
        xp = boundary.pad(x, pads, mode, cval)
        tail = [
            (0, tp[0] + tp[1] - pd[0] - pd[1])
            for tp, pd in zip(total_pads, pads)
        ]
        if any(hi for _, hi in tail):
            xp = jnp.pad(xp, tail)

    if ndim == 3:
        B0, B1 = blocks
        kernel = _make_dense_kernel_3d(
            taps, shape[2], B0, B1, slabs[0], slabs[1]
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, grid[1] * B1, shape[2]), dtype
            ),
            grid=(grid[0], grid[1]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (B0, B1, shape[2]),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], slabs[1], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp)
        return out[: shape[0], : shape[1], : shape[2]]

    (B0,) = blocks
    if lane_mm2:
        n_tiles = lane_out2 // 128
        kernel, W3 = _make_dense_kernel_2d_lanemm(
            taps, wshape, B0, slabs[0], n_tiles, exact=interpret
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, lane_out2), dtype
            ),
            grid=(grid[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B0, lane_out2), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp, jnp.asarray(W3))
        return out[: shape[0], : shape[1]]
    kernel = _make_dense_kernel_2d(taps, shape[1], B0, slabs[0])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * B0, shape[1]), dtype
        ),
        grid=(grid[0],),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (B0, shape[1]), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, slabs[0], lane), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp)
    return out[: shape[0], : shape[1]]


# ---------------------------------------------------------------------------
# rank / median filters (pruned sorting network in the fused slab)
# ---------------------------------------------------------------------------

# rank networks need every window tap live at once; bound the unroll
_MAX_RANK_TAPS = 64


def supports_rank(x, filter_size, interpret=False):
    """Whether the fused Pallas rank path applies (reference rank
    kernels: cupyimg/scipy/ndimage/filters.py:1510-1848)."""
    if not interpret and jax.default_backend() != "tpu":
        return False
    dt = np.dtype(x.dtype)
    if dt.kind not in "fi" or dt.itemsize != 4:
        return False
    if x.ndim not in (2, 3):
        return False
    if filter_size < 3 or filter_size > _MAX_RANK_TAPS:
        return False
    if not interpret and x.size < (1 << 20):
        return False
    return True


def _make_rank_kernel_2d(taps, rank, S1, B0, sl0, rect=None):
    """2-D rank kernel: one lane rotation per distinct column offset,
    sublane-offset views per row tap, then a rank-pruned Batcher
    network (ops/sorting_networks.py) over the tap values in VMEM.

    For full-rectangle footprints (``rect`` = (w0, w1)) the lane window
    is fully sorted ONCE (shared by every sublane tap: the reference's
    optimal-median trick restructured around reuse), and only the
    pruned sorted-runs merge runs per output: a 5x5 median drops from
    113 to 9 shared + 82 per-point compare-exchanges."""
    from cupyimg_tpu.ops.sorting_networks import (
        rank_select, rank_select_presorted, sort_values,
    )

    cols = _group_taps_by_col(tuple((idx, 1.0) for idx in taps))

    def kernel(x_any, out_ref, slab, sem):
        t = jnp.asarray(pl.program_id(0), jnp.int32)
        n_t = jnp.asarray(pl.num_programs(0), jnp.int32)
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            return pltpu.make_async_copy(
                x_any.at[pl.ds(tt * B0, sl0), :],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        if rect is not None:
            w0, w1 = rect
            lane_sorted = sort_values(
                [x[:, kj : kj + S1] for kj in range(w1)]
            )
            runs = [
                [v[ki : ki + B0] for v in lane_sorted]
                for ki in range(w0)
            ]
            out = rank_select_presorted(runs, rank)
        else:
            vals = []
            for kj, row_taps in cols:
                strip = x[:, kj : kj + S1]
                for ki, _ in row_taps:
                    vals.append(strip[ki : ki + B0])
            out = rank_select(vals, rank)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _make_rank_kernel_3d(taps, rank, S2, B0, B1, sl0, sl1, rect=None):
    """3-D rank kernel.  Rectangular footprints use TWO shared stages:
    the lane window sorted once, then each sublane row's lane-runs
    merged once (both reused by every leading-axis tap); only the final
    cross-row pruned merge runs per output — a 3x3x3 median drops from
    126 to 21 shared + 55 per-point compare-exchanges."""
    from cupyimg_tpu.ops.sorting_networks import (
        rank_select, rank_select_presorted, sort_runs_values,
        sort_values,
    )

    lanes = {}
    for (k0, k1, k2) in taps:
        lanes.setdefault(k2, []).append((k0, k1))
    lane_groups = sorted(lanes.items())

    def kernel(x_any, out_ref, slab, sem):
        i32 = lambda v: jnp.asarray(v, jnp.int32)  # noqa: E731
        i = i32(pl.program_id(0))
        j = i32(pl.program_id(1))
        g1 = i32(pl.num_programs(1))
        t = i * g1 + j
        n_t = i32(pl.num_programs(0)) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        next_slot = jax.lax.rem(t + 1, two)

        def dma(tt, sl):
            ii = jnp.asarray(jax.lax.div(tt, g1), jnp.int32)
            jj = jnp.asarray(jax.lax.rem(tt, g1), jnp.int32)
            return pltpu.make_async_copy(
                x_any.at[
                    pl.ds(ii * B0, sl0), pl.ds(jj * B1, sl1), :
                ],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(t, slot).start()

        @pl.when(t + 1 < n_t)
        def _():
            dma(t + 1, next_slot).start()

        dma(t, slot).wait()
        x = slab[slot]
        if rect is not None:
            w0, w1, w2 = rect
            sb1 = sl1 - w1 + 1
            lane_sorted = sort_values(
                [x[:, :, k2 : k2 + S2] for k2 in range(w2)]
            )
            row_runs = [
                [v[:, k1 : k1 + sb1] for v in lane_sorted]
                for k1 in range(w1)
            ]
            merged = sort_runs_values(row_runs)
            runs = [
                [m[k0 : k0 + B0, :B1] for m in merged]
                for k0 in range(w0)
            ]
            out = rank_select_presorted(runs, rank)
        else:
            vals = []
            for k2, subs in lane_groups:
                strip = x[:, :, k2 : k2 + S2]
                for k0, k1 in subs:
                    vals.append(strip[k0 : k0 + B0, k1 : k1 + B1])
            out = rank_select(vals, rank)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "taps", "wshape", "rank", "origins", "mode", "cval", "rect",
        "interpret",
    ),
)
def _fused_rank(x, taps, wshape, rank, origins, mode, cval, rect,
                interpret):
    ndim = x.ndim
    dtype = x.dtype
    shape = x.shape

    pads = []
    halos = []
    for ax in range(ndim):
        size = wshape[ax]
        lo = size // 2 + origins[ax]
        hi = size - 1 - lo
        if lo < 0 or hi < 0:
            raise ValueError("rank path requires in-window origins")
        pads.append((lo, hi))
        halos.append(size - 1)

    lane_lo, lane_hi = pads[-1]
    lane = _round_up(shape[-1] + lane_lo + lane_hi, 128)
    blocks = _choose_blocks(
        shape, halos, lane, np.dtype(dtype).itemsize
    )
    # every tap value is live through the network: bound the live set
    # (ntaps * block bytes) so Mosaic spills stay inside VMEM scratch
    nt = len(taps)
    if ndim == 2:
        while nt * blocks[0] * lane * 4 > 24 * (1 << 20) and blocks[0] > 8:
            blocks[0] //= 2
    else:
        while (
            nt * blocks[0] * blocks[1] * lane * 4 > 24 * (1 << 20)
            and blocks[1] > 8
        ):
            blocks[1] //= 2

    slabs = []
    for ax, b in enumerate(blocks):
        ext = b + halos[ax]
        if ax == ndim - 2:
            ext = _round_up(ext, 8)
        slabs.append(ext)

    grid = []
    total_pads = list(pads)
    for ax, b in enumerate(blocks):
        g = math.ceil(shape[ax] / b)
        grid.append(g)
        target = (g - 1) * b + slabs[ax]
        lo, hi = total_pads[ax]
        total_pads[ax] = (lo, max(hi, target - shape[ax] - lo))
    total_pads[-1] = (
        lane_lo, lane_hi + lane - (shape[-1] + lane_lo + lane_hi)
    )

    max_rel_pad = max(
        max(pd) / shape[ax] for ax, pd in enumerate(total_pads)
    )
    if max_rel_pad < 1.0:
        xp = boundary.pad(x, total_pads, mode, cval)
    else:
        xp = boundary.pad(x, pads, mode, cval)
        tail = [
            (0, tp[0] + tp[1] - pd[0] - pd[1])
            for tp, pd in zip(total_pads, pads)
        ]
        if any(hi for _, hi in tail):
            xp = jnp.pad(xp, tail)

    if ndim == 3:
        B0, B1 = blocks
        kernel = _make_rank_kernel_3d(
            taps, rank, shape[2], B0, B1, slabs[0], slabs[1], rect=rect
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (grid[0] * B0, grid[1] * B1, shape[2]), dtype
            ),
            grid=(grid[0], grid[1]),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (B0, B1, shape[2]),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, slabs[0], slabs[1], lane), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xp)
        return out[: shape[0], : shape[1], : shape[2]]

    (B0,) = blocks
    kernel = _make_rank_kernel_2d(taps, rank, shape[1], B0, slabs[0],
                                  rect=rect)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * B0, shape[1]), dtype
        ),
        grid=(grid[0],),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (B0, shape[1]), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, slabs[0], lane), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xp)
    return out[: shape[0], : shape[1]]


def fused_rank_filter(x, footprint, origins, rank, mode, cval=0.0,
                      interpret=False):
    """Rank filter in one fused Pallas pass: halo'd slab DMA + the
    rank-pruned Batcher min/max network in VMEM (TPU-native equivalent
    of the reference's rank kernels with optimal median networks,
    cupyimg/scipy/ndimage/filters.py:1779-1848 and
    _filters_optimal_medians.py)."""
    footprint = np.asarray(footprint, bool)
    taps = tuple(
        tuple(int(v) for v in idx) for idx in np.argwhere(footprint)
    )
    rect = tuple(footprint.shape) if bool(footprint.all()) else None
    return _fused_rank(
        x, taps, footprint.shape, int(rank),
        tuple(int(o) for o in origins), str(mode), float(cval),
        rect, bool(interpret),
    )
