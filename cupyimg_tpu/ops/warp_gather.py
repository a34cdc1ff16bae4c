"""Dense-coordinate 2-D resampling (map_coordinates / warp) as a
routing-based Pallas gather kernel — sync-free and jit-safe.

The previous TPU path for smooth coordinate fields
(ops/onehot_interp.map_onehot_2d) pulled per-block locality statistics
to the host on every call (one device sync, ~30 ms through a relay)
and rejected traced inputs, so user pipelines could not ``jax.jit``
across a warp.  This module keeps everything on device:

- coordinates are boundary-premapped (ops/interp.premap_coord — the
  same float fold scipy's map_coordinate() C routine applies), taps
  resolved against a statically mode-padded input;
- per-tile slab origins and *fitness* (spans, monotonicity, preimage
  multiplicity) are computed with plain jnp reductions;
- a ``lax.cond`` picks the Pallas kernel when every tile fits and the
  exact dense-gather fallback (ops/interp.gather_general) otherwise —
  no host decision anywhere, so the whole op stays traceable.

Kernel structure per (64, 128) output tile, mirroring the affine GTG
kernel (ops/gtg_interp.py) but with data-driven routing:

- a (128, 384) source slab is DMA'd and lane-rolled; column taps are
  served by two 128-lane ``tpu.dynamic_gather`` windows + select;
- **routing** replaces the affine closed-form inversion: row taps
  ``rl`` are non-decreasing along the output row axis (checked in the
  fitness flag), so the first preimage of slab row s0 is the exact
  integer count ``#{i : rl[i,j] < s0}``, and a point's preimage index
  is the run-position ``rl[i]==rl[i-1]`` (multiplicity is capped at 2
  by the fitness flag; larger local magnification falls back);
- **A-stage**: per (row-tap, preimage-pass), gather each routed
  point's column taps and fold the column weights;
- **transpose + B-stage**: per point, gather its row taps from the
  transposed A array and fold the row weights, selecting the pass
  that owns the point.

All routing quantities are integers (floors of the concrete premapped
coordinate arrays), so the A/B sides agree exactly by construction —
the compilation-freedom hazard the affine kernel needed fixed-point
arithmetic for does not arise here.

Cites: reference map_coordinates kernel factory,
cupyimg/scipy/ndimage/_interp_kernels.py:186-213 and :595-621 (one
CUDA thread per output point doing the same premap + tap loop).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cupyimg_tpu.core import boundary
from cupyimg_tpu.ops.interp import (
    gather_general,
    premap_coord,
    spline_weights,
)
from cupyimg_tpu.ops.iir import get_spline_mode

__all__ = ["map_gather_2d"]

_T0 = 64              # output tile rows
_LANES = 128          # output tile cols / gather window width
_SLAB0 = 128          # slab rows
_SLAB1 = 384          # slab cols (128 alignment slack + 2 windows)
_NP = 2               # preimage passes (multiplicity cap)

_MODES = (
    "constant", "grid-constant", "nearest", "reflect", "mirror",
    "grid-mirror", "grid-wrap", "wrap",
)


def _tap_weights(frac, order):
    if order == 0:
        return [None]
    if order == 1:
        return [1.0 - frac, frac]
    return spline_weights(frac, order)


def _pad_mode_for(order, mode):
    """Boundary mode of the static input extension that reproduces
    ops/interp._map_tap's per-tap index mapping (after the float
    premap, taps overhang the domain by at most order//2 + 1)."""
    if order <= 1:
        if mode == "constant":
            return "nearest"  # _map_tap clamps; outer cval mask is ours
        if mode == "wrap":
            return "grid-wrap"  # integer taps map with period n
        return mode
    if mode == "grid-constant":
        return "grid-constant"
    if mode == "nearest":
        return "nearest"
    return get_spline_mode(mode)


def _shift_rows(a, k):
    """a shifted down by k rows (out[s] = a[s-k]); top rows garbage."""
    if k == 0:
        return a
    return jnp.concatenate([a[:1]] * k + [a[: a.shape[0] - k]], axis=0)


def _make_kernel(order, interpret):
    ntaps = order + 1 if order > 0 else 1
    f32 = np.float32

    def kernel(rmin_ref, cmin_ref, x_any, rq_ref, cq_ref, fr_ref,
               fc_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        g1 = pl.num_programs(1)
        t = i * g1 + j
        nt = pl.num_programs(0) * g1
        two = jnp.asarray(2, t.dtype)
        slot = lax.rem(t, two)
        nslot = lax.rem(t + 1, two)

        def dma(sl, tt):
            return pltpu.make_async_copy(
                x_any.at[
                    pl.ds(pl.multiple_of(rmin_ref[tt], 8), _SLAB0),
                    pl.ds(
                        pl.multiple_of(
                            (cmin_ref[tt] // 128) * 128, 128
                        ),
                        _SLAB1,
                    ),
                ],
                slab.at[sl],
                sem.at[sl],
            )

        @pl.when(t == 0)
        def _():
            dma(slot, t).start()

        @pl.when(t + 1 < nt)
        def _():
            dma(nslot, t + 1).start()

        dma(slot, t).wait()
        rmin8 = rmin_ref[t]
        cmin = cmin_ref[t]
        shift = cmin - (cmin // 128) * 128
        raw = slab[slot]
        amt = lax.rem(
            jnp.asarray(_SLAB1, shift.dtype) - shift,
            jnp.asarray(_SLAB1, shift.dtype),
        )
        rolled = pltpu.roll(raw, amt, 1) if not interpret else (
            jnp.roll(raw, amt, axis=1))
        win0 = rolled[:, :_LANES]
        win1 = rolled[:, _LANES : 2 * _LANES]

        def col_gather(idx):
            g = jnp.take_along_axis(
                win0, jnp.clip(idx, 0, _LANES - 1), axis=1
            )
            g2 = jnp.take_along_axis(
                win1, jnp.clip(idx - _LANES, 0, _LANES - 1), axis=1
            )
            return jnp.where(idx < _LANES, g, g2)

        rl = rq_ref[...] - rmin8            # (T0, 128) in [0, 128)
        cl = cq_ref[...] - cmin             # (T0, 128) in [0, 256)
        fr = fr_ref[...]
        fc = fc_ref[...]

        def pad_rows(a):
            # (T0, 128) -> (128, 128), replicating the last row so the
            # transposed array's garbage lanes stay within the tile's
            # slab span
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[_T0 - 1 :], (_SLAB0 - _T0,
                                                    _LANES))],
                axis=0,
            )

        # ---- routing: first preimage of slab row s0 per column
        iota_s0 = jax.lax.broadcasted_iota(
            jnp.int32, (_SLAB0, _LANES), 0)
        count = jnp.zeros((_SLAB0, _LANES), jnp.int32)
        for ii in range(_T0):
            count = count + (rl[ii : ii + 1] < iota_s0).astype(
                jnp.int32)
        # point's own pass index: run position along i (mult <= 2)
        prev = jnp.concatenate([rl[:1] - 1, rl[: _T0 - 1]], axis=0)
        p_pt = (rl == prev)                 # (T0, 128) bool
        p_ptT = pad_rows(p_pt.astype(jnp.int32)).T  # (j, t)

        rlT = pad_rows(rl).T                # (j, t) int32
        frT = pad_rows(fr).T
        wrB = _tap_weights(frT, order)

        clp = pad_rows(cl)
        fcp = pad_rows(fc)
        clpT = clp.T                        # (j, i-lane)
        fcpT = fcp.T

        acc = jnp.zeros((_LANES, _LANES), f32)
        sels = []
        for p in range(_NP):
            i_sel = jnp.clip(count + p, 0, _T0 - 1)  # (s0, j)
            i_selT = i_sel.T                         # (j, s0)
            cl_sel = jnp.take_along_axis(clpT, i_selT, axis=1).T
            fc_sel = jnp.take_along_axis(fcpT, i_selT, axis=1).T
            sels.append((cl_sel, fc_sel))
        for ki in range(ntaps):
            Ats = []
            for p in range(_NP):
                cl_sel, fc_sel = sels[p]
                cl_sh = _shift_rows(cl_sel, ki)
                fc_sh = _shift_rows(fc_sel, ki)
                wc = _tap_weights(fc_sh, order)
                A = None
                for kj in range(ntaps):
                    g = col_gather(cl_sh + kj)
                    gw = g if wc[kj] is None else wc[kj] * g
                    A = gw if A is None else A + gw
                Ats.append(A.T)
            idxB = jnp.clip(rlT + ki, 0, _SLAB0 - 1)
            CB = jnp.take_along_axis(Ats[0], idxB, axis=1)
            C1 = jnp.take_along_axis(Ats[1], idxB, axis=1)
            CB = jnp.where(p_ptT == 0, CB, C1)
            acc = acc + (CB if wrB[ki] is None else wrB[ki] * CB)
        out_ref[...] = acc.T[:_T0].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("order", "mode", "cval", "interpret"),
)
def _map_gather_impl(x, c0, c1, order, mode, cval, interpret):
    H, W = c0.shape
    n0, n1 = x.shape
    ntaps = order + 1 if order > 0 else 1
    margin = max(order + 2, 24)

    # Conditional float boundary premap.  A full premap (as
    # ops/interp.axis_taps does) FOLDS out-of-domain coordinates, which
    # breaks the per-tile monotonicity the count-routing needs for any
    # warp that touches the image border — the common case.  Instead
    # the input is padded ``margin`` deep with the mode's own extension
    # (identical values to what the fold would read), and only
    # coordinates excursing beyond the pad get the float premap (rare;
    # those tiles then fail the monotonicity fit and take the exact
    # dense fallback).  For clamp-family modes the per-tap clip below
    # IS the premap, so no fold ever happens.
    def cond_premap(c, n):
        if mode in ("constant", "grid-constant", "nearest"):
            return c
        if mode == "wrap":
            # legacy wrap folds with period n-1, which no period-n pad
            # can reproduce: always premap (in-domain coords are
            # untouched, so monotonicity only breaks for true folds)
            return premap_coord(c, n, mode)
        safe = margin - ntaps - 1
        return jnp.where(
            (c >= -safe) & (c <= n - 1 + safe),
            c,
            premap_coord(c, n, mode),
        )

    d0 = cond_premap(c0, n0)
    d1 = cond_premap(c1, n1)

    def base_frac(d):
        if order == 0:
            rq = jnp.floor(d + 0.5)
            return rq.astype(jnp.int32), jnp.zeros_like(d)
        if order == 1:
            rq = jnp.floor(d)
            return rq.astype(jnp.int32), (d - rq).astype(jnp.float32)
        if order % 2:
            fl = jnp.floor(d)
            return (
                fl.astype(jnp.int32) - order // 2,
                (d - fl).astype(jnp.float32),
            )
        half = jnp.floor(d + 0.5)
        return (
            half.astype(jnp.int32) - order // 2,
            (d - half).astype(jnp.float32),
        )

    rq, fr = base_frac(d0)
    cq, fc = base_frac(d1)

    pad_mode = _pad_mode_for(order, mode)
    xpad = boundary.pad(
        x, ((margin, margin), (margin, margin)), pad_mode, cval
    )
    rq = jnp.clip(rq + margin, 0, xpad.shape[0] - ntaps)
    cq = jnp.clip(cq + margin, 0, xpad.shape[1] - ntaps)

    G0 = -(-H // _T0)
    G1 = -(-W // _LANES)
    pads = ((0, G0 * _T0 - H), (0, G1 * _LANES - W))
    rq = jnp.pad(rq, pads, mode="edge")
    cq = jnp.pad(cq, pads, mode="edge")
    fr = jnp.pad(fr, pads, mode="edge")
    fc = jnp.pad(fc, pads, mode="edge")

    xg = jnp.pad(xpad, ((0, _SLAB0), (0, _SLAB1)))
    Hp, Wp = xg.shape

    # ---- per-tile origins + fitness, all on device
    rt = rq.reshape(G0, _T0, G1, _LANES)
    ct = cq.reshape(G0, _T0, G1, _LANES)
    rmin = rt.min(axis=(1, 3))
    rmax = rt.max(axis=(1, 3))
    cmin = ct.min(axis=(1, 3))
    cmax = ct.max(axis=(1, 3))
    rmin8 = (jnp.clip(rmin, 0, Hp - _SLAB0) // 8) * 8
    cmin_c = jnp.clip(cmin, 0, Wp - _SLAB1)
    fit0 = (rmax - rmin8 + ntaps - 1) <= _SLAB0 - 1
    fit1 = (cmax - cmin_c + ntaps - 1) <= 2 * _LANES - 1
    dr = rt[:, 1:] - rt[:, :-1]
    mono = jnp.all(dr >= 0, axis=(1, 3))
    run2 = jnp.all(rt[:, 2:] > rt[:, :-2], axis=(1, 3))
    fit_all = jnp.all(fit0 & fit1 & mono & run2)

    kernel = _make_kernel(int(order), bool(interpret))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G0, G1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_T0, _LANES), lambda i, j, *_: (i, j)),
            pl.BlockSpec((_T0, _LANES), lambda i, j, *_: (i, j)),
            pl.BlockSpec((_T0, _LANES), lambda i, j, *_: (i, j)),
            pl.BlockSpec((_T0, _LANES), lambda i, j, *_: (i, j)),
        ],
        out_specs=pl.BlockSpec(
            (_T0, _LANES), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, _SLAB0, _SLAB1), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def run_kernel(_):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (G0 * _T0, G1 * _LANES), x.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=bool(interpret),
        )(rmin8.reshape(-1), cmin_c.reshape(-1), xg, rq, cq, fr, fc)
        return out[:H, :W]

    def run_fallback(_):
        return gather_general(
            x, (c0, c1), order, mode, cval
        ).astype(x.dtype)

    out = lax.cond(fit_all, run_kernel, run_fallback, operand=None)
    if mode == "constant":
        oob = (
            (c0 < 0) | (c0 > n0 - 1) | (c1 < 0) | (c1 > n1 - 1)
        )
        out = jnp.where(oob, jnp.asarray(cval, out.dtype), out)
    return out


def map_gather_2d(x, coords, order, mode, cval, interpret=False):
    """Resample 2-D ``x`` at dense float coordinates.

    Returns None when this engine does not apply (the caller falls
    back); otherwise a full result including the 'constant' outer-cval
    mask.  Works under an outer jit (no host syncs).
    """
    if not interpret and jax.default_backend() != "tpu":
        return None
    if x.ndim != 2 or len(coords) != 2:
        return None
    if np.dtype(x.dtype).kind != "f" or np.dtype(x.dtype).itemsize > 4:
        return None
    if order not in (0, 1, 3):
        return None
    if mode not in _MODES:
        return None
    r = coords[0]
    if len(r.shape) != 2 or len(coords[1].shape) != 2:
        return None
    if min(x.shape) <= 8:
        return None
    if not interpret and r.size < (1 << 18):
        return None
    try:
        cval_f = float(cval)
    except (TypeError, ValueError):
        return None  # traced cval: jit-static plumbing impossible
    c0 = jnp.asarray(coords[0], jnp.float32)
    c1 = jnp.asarray(coords[1], jnp.float32)
    return _map_gather_impl(
        jnp.asarray(x), c0, c1, int(order), str(mode), cval_f,
        bool(interpret),
    )
