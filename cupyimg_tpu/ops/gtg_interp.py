"""Exact 2-D affine resampling via gather-transpose-gather (GTG).

TPU-native successor to the one-hot MXU sampler (ops/pallas_interp.py)
for rotation-like affines.  The one-hot formulation pays
``round128(S0) * S1`` MXU MACs *per output point* to express a
(order+1)^2-tap gather as dense matmuls — structurally ~100x more
arithmetic than the gather needs, and measured at ~21 ms for a 4096^2
order-1 rotation on v5e.  This kernel instead uses the hardware's
within-vreg dynamic gather (``tpu.dynamic_gather``, reachable as
``jnp.take_along_axis(src, idx, axis=1)`` with ``idx.shape ==
src.shape`` and lane width <= 128) to move each tap with O(1) work:

- Per output tile (TI, 128) an (S0, 384) source slab is DMA'd to VMEM
  and lane-rolled so local column taps start at lane 0.  The planner
  picks (TI, S0) per matrix — up to 240 slab rows so rotations keep
  full 128-row tiles; spans past one 128-lane window (columns) or one
  128-row window (B-stage rows) gather each window and select.
- **A-stage** (column taps): for every slab row s0 and output column j,
  invert the affine row map to find the output row i whose row tap
  lands on s0, then lane-gather that point's (order+1) column taps and
  fold in the column weights: A[s0, j] = sum_kj wc * slab[s0, ctap+kj].
- **transpose** A -> At so slab rows become lanes.
- **B-stage** (row taps): per point (i, j), lane-gather At at the
  point's row tap and fold in the row weight.

Row-map inversion is multivalued when |a00| < 1 (two consecutive i can
share a floor), so the A/B stages run NP = ceil(1/|a00|) passes (gated
to NP <= 2 by requiring |a00| >= 0.5 after orientation); the B-stage
selects the pass matching each point's preimage index.  Orientation:
when |d(row)/d(out_col)| > |d(row)/d(out_row)| the kernel computes the
transposed output, which keeps the slab row span bounded for every
rotation angle.

**Deterministic routing.** The A-side inversion must agree with the
B-side tap floors bit-for-bit, but XLA may compile the same
``floor(a00*i + a01*j + o0)`` expression differently at the two sites
(FMA contraction / excess precision), flipping floors at exact ties
and routing a point to a neighboring cell (observed: one bad pixel per
~10^5 on the CPU backend).  All routing floors therefore use a
fixed-point pipeline that admits no compilation freedom:
``floor(S_tile + (A00*di + A01*dj) * 2^-22)`` where A00/A01 are
pre-rounded integers, the residual is exact int32 arithmetic, the
scale is a power of two (exact), and S_tile is a per-tile scalar
computed once and shared by both sides — every float step is a single
exactly-rounded op.  Interpolation *fractions* still come from the
precise f32 coordinates (fr = r_precise - rq_route), so the ~2^-23
routing quantization only converts interpolation to an equivalent
sub-ulp extrapolation at tie points.  Per-tile DMA origins are
likewise computed once, outside the kernel, and fed through scalar
prefetch so the pipelined prefetch-site and the compute-site can never
disagree.

Measured (v5e): 4096^2 order-1 rotations ~2.8-4.0 ms (vs 21 ms
one-hot), ~55-75% of the chip's dynamic-gather lightspeed
(bench_suite.py measures the gather peak and each plan's shuffle-row
count); ~16 B/point of slab DMA.

Cites: reference affine gather kernels
cupyimg/scipy/ndimage/_interp_kernels.py:277-592 and kernel factories
:690-751 (one CUDA thread per output point; the GTG decomposition is
the TPU-native equivalent of its per-thread 2-D tap loop).
"""

from __future__ import annotations

import functools
import math
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cupyimg_tpu.core import boundary
from cupyimg_tpu.ops.interp import spline_weights
from cupyimg_tpu.ops.iir import get_spline_mode

__all__ = ["affine_gtg_2d", "affine_gtg_batched2d", "gtg_plan"]

_LANES = 128
# planes per grid step of the batched kernel: routing (inversion, tap
# indices, weights) is shared across the chunk, so larger chunks amortize
# it; VMEM slab scratch grows linearly (2 * NBC * _SLAB0 * _SLAB1 * 4B)
_NBC_PLANES = int(_os.environ.get("CUPYIMG_TPU_GTG_NBC", "16"))
_SLAB0 = 128          # legacy slab-row count (guard sizing for callers
                      # that predate per-plan S0)
_SLAB1 = 384          # slab cols as DMA'd: up to 127 lanes of origin
                      # 128-alignment slack + two 128-lane gather
                      # windows after the roll
_S0_MAX = 240         # slab-row budget: two B-stage row-gather windows
                      # (128 + 112), 8-aligned
_S0_SLACK = 10        # DMA-origin 8-align slack + routing jitter
# Relative per-row stage costs used by the (TI, S0) planner: the
# A-stage sweeps (S0 + EXT) routing rows, the B-stage gathers over
# NR*128-lane point grids, DMA+roll moves S0 slab rows.  Calibrated on
# v5e by stage-isolation microbenches (rotation matrices, order 1/3).
_WA, _WB, _WD = 1.0, 0.7, 0.45
_Q = 22               # routing fixed-point fraction bits
_QF = np.float32(2.0 ** -_Q)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def gtg_plan(matrix, order, out_shape):
    """Static plan: (swapped, mshape, TI, NP, NW, out_shape', S0, NR)
    or None.

    ``swapped`` means the kernel computes the transposed output (roles
    of the two output axes exchanged) and the caller transposes back.
    ``NW`` is the number of 128-lane column gather windows the column
    span needs (1 or 2); ``S0`` the slab-row count the row span needs
    (8-aligned, <= 240) and ``NR`` the matching number of B-stage
    row-gather windows (1 when S0 <= 128, else 2).
    """
    m = np.asarray(matrix, dtype=np.float64)
    if m.shape != (2, 2) or not np.all(np.isfinite(m)):
        return None
    a00, a01, a10, a11 = m[0, 0], m[0, 1], m[1, 0], m[1, 1]
    swapped = abs(a01) > abs(a00)
    if swapped:
        a00, a01 = a01, a00
        a10, a11 = a11, a10
        out_shape = (out_shape[1], out_shape[0])
    if abs(a00) < 0.5:
        return None  # inversion multiplicity > 2: one-hot path handles
    np_passes = 1 if abs(a00) >= 1.0 else 2
    ntaps = order + 1 if order > 0 else 1
    ext = ntaps - 1
    # The output tile is TI rows x 128 lanes; its source-row span is
    # span0 ~ |a00|*TI + |a01|*128, so for rotation-like matrices a
    # fixed 128-row slab forces tiny TI (a 40-degree rotation fits only
    # TI=40 -> the A- and B-stages then do 3.2x redundant work per
    # output point).  Instead search (TI, S0) pairs — taller slabs pay
    # linearly in A-stage/DMA rows but amortize over more output rows —
    # and keep the pair minimizing modeled cost per output row.
    best = None
    for ti in range(128, 7, -8):
        span0 = abs(a00) * (ti - 1) + abs(a01) * (_LANES - 1) + ntaps - 1
        span1 = abs(a10) * (ti - 1) + abs(a11) * (_LANES - 1) + ntaps - 1
        s0 = _round_up(int(math.ceil(span0)) + _S0_SLACK, 8)
        # column budget: two 128-lane gather windows minus safety (the
        # slab's extra 128 lanes only absorb the DMA origin alignment)
        if s0 > _S0_MAX or span1 > 2 * _LANES - 8:
            continue
        nr = 1 if s0 <= _LANES else 2
        nw = 1 if span1 <= _LANES - 4 else 2
        cost = (_WA * (s0 + ext) + _WB * nr * _LANES + _WD * s0) / ti
        if best is None or cost < best[0]:
            best = (cost, ti, s0, nr, nw)
    if best is None:
        return None
    _, ti, s0, nr, nw = best
    return (
        swapped, (a00, a01, a10, a11), ti, np_passes, nw, out_shape,
        s0, nr,
    )


def _tap_weights(frac, order):
    if order == 0:
        return [jnp.ones_like(frac)]
    if order == 1:
        return [1.0 - frac, frac]
    return spline_weights(frac, order)


def _quant(a):
    return int(round(a * (1 << _Q)))


def _make_kernel(mshape, lo0, lo1, order, TI, NP, NW, interpret,
                 NBC=0, S0=_SLAB0, NR=1):
    """Kernel body; every parameter is a Python scalar baked in.

    ``NBC`` > 0 selects the batched-plane layout: each grid step
    resamples NBC leading planes with the SAME 2-D affine, sharing the
    per-tile routing (inversion, weights, tap indices) across planes
    (a 3-D volume rotate about one axis is the common caller).
    ``S0``/``NR``: slab-row count and B-stage row-gather window count
    from the plan; rows past 128 are reached through a second window
    of the transposed A matrix."""
    a00, a01, a10, a11, o0, o1 = mshape
    f32 = np.float32
    a00f, a01f, a10f, a11f = f32(a00), f32(a01), f32(a10), f32(a11)
    o0f, o1f = f32(o0), f32(o1)
    inv_a00 = f32(1.0 / a00)
    A00, A01 = _quant(a00), _quant(a01)
    A10, A11 = _quant(a10), _quant(a11)
    base_off = -1 if order >= 2 else 0
    ntaps = order + 1 if order > 0 else 1
    half = f32(0.5) if order == 0 else f32(0.0)  # round-to-nearest tap
    batched = NBC > 0

    def kernel(rmin_ref, cmin_ref, x_any, out_ref, slab, sem):
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        g1 = pl.num_programs(1)
        tij = bi * g1 + bj
        if batched:
            bb = pl.program_id(2)
            gb = pl.num_programs(2)
            t = tij * gb + bb
            nt = pl.num_programs(0) * g1 * gb
        else:
            bb = None
            gb = 1
            t = tij
            nt = pl.num_programs(0) * g1
        two = jnp.asarray(2, t.dtype)
        slot = lax.rem(t, two)
        nslot = lax.rem(t + 1, two)

        def dma(sl, tt):
            gbt = jnp.asarray(gb, tt.dtype)
            ij = lax.div(tt, gbt) if batched else tt
            rows = pl.ds(pl.multiple_of(rmin_ref[ij], 8), S0)
            cols = pl.ds(
                pl.multiple_of((cmin_ref[ij] // 128) * 128, 128),
                _SLAB1,
            )
            if batched:
                bt = lax.rem(tt, gbt)
                src = x_any.at[pl.ds(bt * NBC, NBC), rows, cols]
            else:
                src = x_any.at[rows, cols]
            return pltpu.make_async_copy(src, slab.at[sl], sem.at[sl])

        @pl.when(t == 0)
        def _():
            dma(slot, t).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(nslot, t + 1).start()

        dma(slot, t).wait()
        rmin8 = rmin_ref[tij]
        cmin_true = cmin_ref[tij]
        shift = cmin_true - (cmin_true // 128) * 128  # in [0, 128)
        raw = slab[slot]
        # left-roll by `shift` so local column tap 0 sits at lane 0
        amt = lax.rem(
            jnp.asarray(_SLAB1, shift.dtype) - shift,
            jnp.asarray(_SLAB1, shift.dtype),
        )

        def _roll(a):
            return pltpu.roll(a, amt, 1) if not interpret else (
                jnp.roll(a, amt, axis=1))

        if batched:
            wins = []
            for pn in range(NBC):
                rolled = _roll(raw[pn])
                wins.append(
                    (
                        rolled[:, :_LANES],
                        rolled[:, _LANES : 2 * _LANES]
                        if NW == 2 else None,
                    )
                )
        else:
            rolled = _roll(raw)
            wins = [
                (
                    rolled[:, :_LANES],
                    rolled[:, _LANES : 2 * _LANES] if NW == 2 else None,
                )
            ]

        def col_gather(win, idx):
            """Value at local column tap ``idx`` (0..NW*128-1)."""
            win0, win1 = win
            g = jnp.take_along_axis(
                win0, jnp.clip(idx, 0, _LANES - 1), axis=1
            )
            if NW == 2:
                g2 = jnp.take_along_axis(
                    win1, jnp.clip(idx - _LANES, 0, _LANES - 1),
                    axis=1,
                )
                g = jnp.where(idx < _LANES, g, g2)
            return g

        i0f = (bi * TI).astype(f32)
        j0f = (bj * _LANES).astype(f32)
        # per-tile routing scalars — computed ONCE, shared by the
        # A-side inversion and the B-side forward floors
        S_r = a00f * i0f + (a01f * j0f + o0f) + half
        S_c = a10f * i0f + (a11f * j0f + o1f) + half

        def route_r(di_int, dj_int):
            """Deterministic row floor: every float step is one
            exactly-rounded op (add, mul-by-2^-Q, floor)."""
            resid = A00 * di_int + A01 * dj_int
            return jnp.floor(S_r + resid.astype(f32) * _QF)

        def route_c(di_int, dj_int):
            resid = A10 * di_int + A11 * dj_int
            return jnp.floor(S_c + resid.astype(f32) * _QF)

        def inv_first(tgt_f, dj_int):
            """Smallest TILE-LOCAL di with route_r(di, dj) == tgt
            (f32 integer-valued)."""
            bres = (A01 * dj_int).astype(f32) * _QF
            center = (tgt_f + f32(0.5) - S_r - bres) * inv_a00
            ic = jnp.floor(center + f32(0.5))
            ic_i = ic.astype(jnp.int32)
            m0 = route_r(ic_i - 1, dj_int) == tgt_f
            m1 = route_r(ic_i, dj_int) == tgt_f
            return jnp.where(m0, ic - 1.0, jnp.where(m1, ic, ic + 1.0))

        # ---- B-side point coords: layout (j on sublanes, t on lanes)
        jB = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
        tB = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        # clamp the garbage lane slots t >= TI to the last real row so
        # their coords stay inside the tile's slab span
        dB = jnp.minimum(tB, TI - 1)
        jB_f = jB.astype(f32) + j0f
        iB_f = dB.astype(f32) + i0f
        rqB = route_r(dB, jB)
        frB = (a00f * iB_f + (a01f * jB_f + o0f)) - rqB
        rlB = rqB.astype(jnp.int32) + (lo0 + base_off) - rmin8

        # ---- A-side grids: layout (s0 on sublanes, j on lanes).
        # Routing identity: the ki-tap routing row di_first(s0, ki)
        # equals di_first(s0 - ki, 0) — the target floors are linear in
        # s0 with slope 1 — so the inversion, column floors, and
        # weights for every tap ki are SUBLANE SHIFTS of one base
        # computation.  Compute routing ONCE over an extended row range
        # [-EXT, SLAB0) and slice per ki, instead of re-running
        # inv_first/route_c/spline-weights ntaps times (order 3 pays 4x
        # otherwise).
        # When A10 == 0 (upper-triangular/shear matrices) the column
        # routing does not depend on di, the per-pass grids constant-fold
        # to sublane-replicated vectors, and Mosaic crashes sublane-
        # slicing a replicated layout (vector_extract_strided_slice
        # limits check).  Recompute per tap on exact-size grids instead;
        # the recompute folds to the same shared computation anyway.
        share_ext = A10 != 0
        EXT = ntaps - 1 if share_ext else 0
        s0E = jax.lax.broadcasted_iota(
            jnp.int32, (S0 + EXT, _LANES), 0
        ) - EXT
        djE = jax.lax.broadcasted_iota(
            jnp.int32, (S0 + EXT, _LANES), 1
        )
        jE_f = djE.astype(f32) + j0f

        def _col_routing(ki):
            """Column floors + weights for row-tap ki over slab rows
            [0, SLAB0) (+EXT lead rows when shared): the target route
            floor for slab row s0 is s0 + rmin8 - lo0 - base_off - ki,
            linear in s0 with slope 1."""
            tgt = (s0E + (rmin8 - lo0 - base_off - ki)).astype(f32)
            di_first = inv_first(tgt, djE)
            cls_p = []
            wcs_p = []
            for p in range(NP):
                di_p = di_first + f32(p)  # tile-local row, f32 ints
                di_pi = di_p.astype(jnp.int32)
                i_p = di_p + i0f
                cq = route_c(di_pi, djE)
                fcA = (a10f * i_p + (a11f * jE_f + o1f)) - cq
                cls_p.append(
                    cq.astype(jnp.int32) + (lo1 + base_off) - cmin_true
                )
                wcs_p.append(_tap_weights(fcA, order))
            return cls_p, wcs_p

        if share_ext:
            # Routing identity: the ki-tap routing row di_first(s0, ki)
            # equals di_first(s0 - ki, 0) — compute ONCE over the
            # extended row range [-EXT, SLAB0) and slice per ki, instead
            # of re-running inv_first/route_c/spline-weights ntaps times
            # (order 3 pays 4x otherwise).
            cls_ext, wcs_ext = _col_routing(0)

        wrB = _tap_weights(frB, order)
        if NP == 2:
            di_first_B = inv_first(rqB, jB)
            selB = dB.astype(f32) - di_first_B < f32(0.5)
        accs = [jnp.zeros((_LANES, _LANES), f32) for _ in wins]
        for ki in range(ntaps):
            if share_ext:
                # slice the shared routing at sublane offset EXT - ki:
                # rows cover s0 - ki for s0 in [0, SLAB0)
                lo_r = EXT - ki
                cls = [c[lo_r:lo_r + S0] for c in cls_ext]
                wcs = [
                    [w[lo_r:lo_r + S0] for w in ws]
                    for ws in wcs_ext
                ]
            else:
                cls, wcs = _col_routing(ki)
            idxB = jnp.clip(rlB + ki, 0, S0 - 1)
            # For NP == 2 with |a10| < 1 the two passes' column-tap
            # floors differ by at most one lane, so their tap sets
            # overlap in ntaps-1 of ntaps positions: gather the
            # ntaps+1-wide union window ONCE and give each pass its
            # half via selects — (ntaps+1) lane-gathers instead of
            # 2*ntaps (order 3: 5 vs 8; gathers dominate the A-stage)
            merge2 = NP == 2 and ntaps >= 2 and abs(a10) < 1.0
            if merge2:
                base_cl = jnp.minimum(cls[0], cls[1])
                offs = [cls[0] > base_cl, cls[1] > base_cl]
            def row_windows(A):
                """Transposed A split into NR 128-lane row windows
                (the TPU dynamic gather needs idx.shape == src.shape,
                so windows narrower than 128 rows zero-pad up)."""
                if NR == 1:
                    if S0 < _LANES:
                        A = jnp.concatenate(
                            [
                                A,
                                jnp.zeros((_LANES - S0, _LANES), f32),
                            ],
                            axis=0,
                        )
                    return (A.T, None)
                tail = jnp.concatenate(
                    [
                        A[_LANES:],
                        jnp.zeros((2 * _LANES - S0, _LANES), f32),
                    ],
                    axis=0,
                )
                return (A[:_LANES].T, tail.T)

            def row_gather(At, idx):
                """Value at slab row ``idx`` (0..S0-1) for each point."""
                At0, At1 = At
                g = jnp.take_along_axis(
                    At0, jnp.clip(idx, 0, _LANES - 1), axis=1
                )
                if NR == 2:
                    g2 = jnp.take_along_axis(
                        At1,
                        jnp.clip(idx - _LANES, 0, _LANES - 1),
                        axis=1,
                    )
                    g = jnp.where(idx < _LANES, g, g2)
                return g

            for pn, win in enumerate(wins):
                Ats = []
                if merge2:
                    g = [
                        col_gather(win, base_cl + kj)
                        for kj in range(ntaps + 1)
                    ]
                    for p in range(NP):
                        A = jnp.zeros((S0, _LANES), f32)
                        for kj in range(ntaps):
                            tap = jnp.where(
                                offs[p], g[kj + 1], g[kj]
                            )
                            A = A + wcs[p][kj] * tap
                        Ats.append(row_windows(A))
                else:
                    for p in range(NP):
                        A = jnp.zeros((S0, _LANES), f32)
                        for kj in range(ntaps):
                            A = A + wcs[p][kj] * col_gather(
                                win, cls[p] + kj
                            )
                        Ats.append(row_windows(A))
                CB = row_gather(Ats[0], idxB)
                if NP == 2:
                    C1 = row_gather(Ats[1], idxB)
                    CB = jnp.where(selB, CB, C1)
                accs[pn] = accs[pn] + wrB[ki] * CB
        if batched:
            for pn, acc in enumerate(accs):
                out_ref[pn] = acc.T[:TI].astype(out_ref.dtype)
        else:
            out_ref[...] = accs[0].T[:TI].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "lo0", "lo1", "mshape", "order", "TI", "NP", "NW", "out_shape",
        "interpret", "NBC", "guarded", "S0", "NR",
    ),
)
def _gtg_call(xext, lo0, lo1, mshape, order, TI, NP, NW, out_shape,
              interpret=False, NBC=0, guarded=False, S0=_SLAB0, NR=1):
    H, W = out_shape
    G0 = -(-H // TI)
    G1 = -(-W // _LANES)
    # guard pad so clipped slab origins always read in-bounds; callers
    # fold it into their boundary.pad (guarded=True) so the whole
    # extension is ONE HBM copy instead of two; batched inputs still
    # pad the plane axis to whole chunks
    if NBC:
        GB = -(-xext.shape[0] // NBC)
        guard2 = (0, 0) if guarded else (0, S0)
        guard3 = (0, 0) if guarded else (0, _SLAB1)
        xg = jnp.pad(
            xext,
            ((0, GB * NBC - xext.shape[0]), guard2, guard3),
        )
    elif guarded:
        xg = xext
    else:
        xg = jnp.pad(xext, ((0, S0), (0, _SLAB1)))
    Hp, Wp = xg.shape[-2:]

    # ---- per-tile slab origins, computed ONCE outside the kernel and
    # fed via scalar prefetch (a pipelined in-kernel recomputation at
    # the prefetch site could compile differently from the compute
    # site and disagree at float ties)
    a00, a01, a10, a11, o0, o1 = mshape
    f32 = np.float32
    A00, A01 = _quant(a00), _quant(a01)
    A10, A11 = _quant(a10), _quant(a11)
    half = f32(0.5) if order == 0 else f32(0.0)
    base_off = -1 if order >= 2 else 0
    bi = jnp.arange(G0, dtype=jnp.int32)[:, None, None]
    bj = jnp.arange(G1, dtype=jnp.int32)[None, :, None]
    i0f = (bi * TI).astype(f32)
    j0f = (bj * _LANES).astype(f32)
    S_r = f32(a00) * i0f + (f32(a01) * j0f + f32(o0)) + half
    S_c = f32(a10) * i0f + (f32(a11) * j0f + f32(o1)) + half
    dcorn = jnp.asarray([0, TI - 1], jnp.int32)[None, None, :, None]
    jcorn = jnp.asarray([0, _LANES - 1], jnp.int32)[None, None, None, :]
    rr = jnp.floor(
        S_r[..., None]
        + (A00 * dcorn + A01 * jcorn).astype(f32) * _QF
    )
    cc = jnp.floor(
        S_c[..., None]
        + (A10 * dcorn + A11 * jcorn).astype(f32) * _QF
    )
    rmin = rr.min(axis=(2, 3)).astype(jnp.int32) + (lo0 + base_off)
    cmin = cc.min(axis=(2, 3)).astype(jnp.int32) + (lo1 + base_off)
    rmin8 = (jnp.clip(rmin, 0, Hp - S0) // 8) * 8
    cmin_true = jnp.clip(cmin, 0, Wp - _SLAB1)
    rmin_flat = rmin8.reshape(-1)
    cmin_flat = cmin_true.reshape(-1)

    if NBC:
        NB = xext.shape[0]
        GB = xg.shape[0] // NBC
        kernel = _make_kernel(
            mshape, int(lo0), int(lo1), int(order), int(TI),
            int(NP), int(NW), bool(interpret), NBC=int(NBC),
            S0=int(S0), NR=int(NR),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(G0, G1, GB),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (NBC, TI, _LANES), lambda i, j, b, *_: (b, i, j)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, NBC, S0, _SLAB1), xext.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (GB * NBC, G0 * TI, G1 * _LANES), xext.dtype
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "arbitrary", "arbitrary", "arbitrary"
                ),
            ),
            interpret=interpret,
        )(rmin_flat, cmin_flat, xg)
        return out[:NB, :H, :W]

    kernel = _make_kernel(
        mshape, int(lo0), int(lo1), int(order), int(TI), int(NP),
        int(NW), bool(interpret), S0=int(S0), NR=int(NR),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G0, G1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TI, _LANES), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, S0, _SLAB1), xext.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G0 * TI, G1 * _LANES),
                                       xext.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(rmin_flat, cmin_flat, xg)
    return out[:H, :W]


def affine_gtg_2d(x, matrix, offset, order, mode, cval, out_shape,
                  interpret=False):
    """GTG resampling of ``x`` at ``matrix @ out_coord + offset``.

    Returns None when the plan gates reject (fallback paths handle).
    Boundary semantics mirror ops/onehot_interp.affine_onehot_2d: the
    input is pre-extended over the (tile-padded) output grid's source
    excursion; legacy 'constant' outer-cval masking is the caller's.
    """
    if not interpret and jax.default_backend() != "tpu":
        return None
    if x.ndim != 2 or np.dtype(x.dtype).kind != "f":
        return None
    if np.dtype(x.dtype).itemsize > 4:
        return None
    if order not in (0, 1, 3):
        return None
    if not interpret and x.size < (1 << 20):
        return None
    try:
        matrix = np.asarray(matrix, dtype=np.float64)
        offset = np.asarray(offset, dtype=np.float64).reshape(2)
    except (TypeError, ValueError):
        return None  # traced transform: static plan impossible
    if mode not in (
        "nearest", "reflect", "mirror", "grid-wrap", "grid-mirror",
        "constant", "grid-constant",
    ):
        return None
    if order == 0 and mode in (
        "reflect", "mirror", "grid-mirror", "grid-wrap",
    ):
        # round-half direction flips under coordinate folding; the
        # gather path premaps the float coordinate like scipy does
        return None
    plan = gtg_plan(matrix, order, tuple(int(v) for v in out_shape))
    if plan is None:
        return None
    swapped, (a00, a01, a10, a11), TI, NP, NW, oshape, S0, NR = plan
    o0, o1 = float(offset[0]), float(offset[1])

    # excursion over the TILE-PADDED output grid (garbage lanes clamp
    # to the last real row, so corners of the padded grid bound them)
    G0 = -(-oshape[0] // TI)
    G1 = -(-oshape[1] // _LANES)
    hi_i = G0 * TI - 1
    hi_j = G1 * _LANES - 1
    corners = np.array(
        [[0, 0], [0, hi_j], [hi_i, 0], [hi_i, hi_j]], dtype=np.float64
    )
    m_or = np.array([[a00, a01], [a10, a11]])
    src = corners @ m_or.T + np.array([o0, o1])
    margin = order + 4
    pads = []
    for ax in range(2):
        lo = max(0, int(math.ceil(-src[:, ax].min())) + margin)
        hi = max(
            0,
            int(math.ceil(src[:, ax].max() - (x.shape[ax] - 1)))
            + margin,
        )
        pads.append((lo, hi))
    if any(
        max(plo, phi) >= s for (plo, phi), s in zip(pads, x.shape)
    ) and mode not in ("constant", "grid-constant", "nearest"):
        return None  # multi-period folds: gather path handles
    if order >= 2 and mode not in ("grid-constant", "nearest"):
        pad_mode = get_spline_mode(mode)
    else:
        pad_mode = mode
    gpads = [
        (pads[0][0], pads[0][1] + S0),
        (pads[1][0], pads[1][1] + _SLAB1),
    ]
    # guard rows/cols are appended INSIDE the same boundary.pad call
    # (one HBM copy); their values are never read for valid outputs —
    # they only keep clipped slab DMA origins in bounds
    xext = boundary.pad(x, gpads, pad_mode, cval)

    mshape = (a00, a01, a10, a11, o0, o1)
    out = _gtg_call(
        xext, pads[0][0], pads[1][0], mshape, int(order), int(TI),
        int(NP), int(NW), oshape, interpret=bool(interpret),
        guarded=True, S0=int(S0), NR=int(NR),
    )
    return out.T if swapped else out


def affine_gtg_batched2d(x, matrix, offset, order, mode, cval,
                         out_shape, interpret=False):
    """Batched GTG: ``x`` is (NB, H, W) and the same 2-D affine
    resamples every leading plane, sharing the per-tile routing
    (inversion, tap indices, weights) across a chunk of planes per
    grid step.  The volume-rotate path
    (scipy/ndimage/interpolation._try_batched_plane_onehot) is the
    caller.  Returns None when the plan gates reject."""
    if not interpret and jax.default_backend() != "tpu":
        return None
    if x.ndim != 3 or np.dtype(x.dtype).kind != "f":
        return None
    if np.dtype(x.dtype).itemsize > 4:
        return None
    if order not in (0, 1, 3):
        return None
    if not interpret and x.size < (1 << 20):
        return None
    try:
        matrix = np.asarray(matrix, dtype=np.float64)
        offset = np.asarray(offset, dtype=np.float64).reshape(2)
    except (TypeError, ValueError):
        return None
    if mode not in (
        "nearest", "reflect", "mirror", "grid-wrap", "grid-mirror",
        "constant", "grid-constant",
    ):
        return None
    if order == 0 and mode in (
        "reflect", "mirror", "grid-mirror", "grid-wrap",
    ):
        return None
    plan = gtg_plan(matrix, order, tuple(int(v) for v in out_shape))
    if plan is None:
        return None
    swapped, (a00, a01, a10, a11), TI, NP, NW, oshape, S0, NR = plan
    o0, o1 = float(offset[0]), float(offset[1])

    G0 = -(-oshape[0] // TI)
    G1 = -(-oshape[1] // _LANES)
    hi_i = G0 * TI - 1
    hi_j = G1 * _LANES - 1
    corners = np.array(
        [[0, 0], [0, hi_j], [hi_i, 0], [hi_i, hi_j]], dtype=np.float64
    )
    m_or = np.array([[a00, a01], [a10, a11]])
    src = corners @ m_or.T + np.array([o0, o1])
    margin = order + 4
    pads = []
    for ax in range(2):
        lo = max(0, int(math.ceil(-src[:, ax].min())) + margin)
        hi = max(
            0,
            int(math.ceil(src[:, ax].max() - (x.shape[1 + ax] - 1)))
            + margin,
        )
        pads.append((lo, hi))
    if any(
        max(plo, phi) >= s
        for (plo, phi), s in zip(pads, x.shape[1:])
    ) and mode not in ("constant", "grid-constant", "nearest"):
        return None
    if order >= 2 and mode not in ("grid-constant", "nearest"):
        pad_mode = get_spline_mode(mode)
    else:
        pad_mode = mode
    gpads = [
        (pads[0][0], pads[0][1] + S0),
        (pads[1][0], pads[1][1] + _SLAB1),
    ]
    xext = boundary.pad(x, [(0, 0)] + gpads, pad_mode, cval)

    mshape = (a00, a01, a10, a11, o0, o1)
    # double-buffered slab scratch must stay within a VMEM budget:
    # taller slabs (large S0) trade away plane-batching width
    vmem_per_plane = 2 * int(S0) * _SLAB1 * 4
    nbc = max(
        1,
        min(_NBC_PLANES, (6 << 20) // vmem_per_plane, int(x.shape[0])),
    )
    out = _gtg_call(
        xext, pads[0][0], pads[1][0], mshape, int(order), int(TI),
        int(NP), int(NW), oshape, interpret=bool(interpret),
        NBC=nbc, guarded=True, S0=int(S0), NR=int(NR),
    )
    return jnp.swapaxes(out, 1, 2) if swapped else out
