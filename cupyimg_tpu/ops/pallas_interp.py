"""Blocked one-hot affine resampling as a Pallas TPU kernel.

This is the TPU-kernel successor of the XLA ``lax.scan`` core in
``ops/onehot_interp.py`` (itself the TPU-native replacement for the
reference's per-point CUDA gather kernels,
cupyimg/scipy/ndimage/_interp_kernels.py:277-592).  Same math — an
output block's affine source coordinates live in a static-size bounding
box; the row taps fold into a one-hot weight matrix applied as one MXU
matmul, the column taps contract elementwise — but the scan/dynamic-
slice machinery is replaced by a Pallas grid with double-buffered,
dynamically-offset slab DMAs, which removes the ~3 us/iteration scan
overhead and overlaps the HBM loads with compute (measured 3.5x on a
4096^2 rotation at order 1).

Mosaic constraints that shape the kernel:
- DMA offsets must be tile-aligned: slab row origins are rounded down
  to a multiple of 8 (sublane tile) and column origins to 128 (lane
  tile), so the slab spans carry +8 / +128 alignment slack.
- Output block lane width must be a multiple of 128; a (B0, 128) output
  block is computed as ``128 // BS`` independent sub-blocks so the
  per-matmul source span (and hence MXU work) stays minimal.
- 1-D reshapes are unsupported; all tensors stay >= 2-D, with
  leading-dim merges (B0, BS, S) -> (B0*BS, S) which Mosaic supports.

Matmul precision: the one-hot contraction runs as a manual 3-pass
bf16 split (hi/lo of both operands, dropping only the lo*lo term),
because Mosaic supports only DEFAULT and HIGHEST dot precisions and
HIGHEST (6 bf16 passes) measures ~1.5x slower end-to-end.  The 3-pass
error bound (~2^-18 relative) sits well below the f32
coordinate-quantization error (~2^-12 relative at 4096-pixel scale)
that every engine in this library shares, so results stay within the
tolerance of the plain gather path.

Batched planes (one shared 2-D affine over a stack, e.g. a 3-D volume
rotate) reuse the per-block one-hot matrices across a chunk of planes
per grid step, amortizing the VPU build cost that dominates small
blocks.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "affine_pallas",
    "map_pallas",
    "supports_pallas_affine",
]

_VMEM_LIMIT = 96 * 1024 * 1024
_MAX_S0 = 512
_MAX_S1 = 512
_BATCH_CHUNK = 4


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _spans(mshape, b0, bs, order):
    """Slab extents for a (b0, bs) output sub-block, incl. tap footprint
    and DMA alignment slack (8 sublanes / 128 lanes)."""
    a00, a01, a10, a11, _, _ = mshape
    n_taps = max(order, 1) + 1
    s0 = int(math.ceil(abs(a00) * (b0 - 1) + abs(a01) * (bs - 1)))
    s1 = int(math.ceil(abs(a10) * (b0 - 1) + abs(a11) * (bs - 1)))
    s0 += n_taps + 2
    s1 += n_taps + 2
    return _round_up(s0 + 8, 8), _round_up(s1 + 128, 128)


def _choose_block(mshape, order, nbc=1):
    """Pick (B0, BS) minimizing measured-calibrated per-point cost.

    The rows matmul contracts (B0*BS, S0) x (S0, S1), so per-point MXU
    MAC-slots are round128(S0) * S1 (the contraction dim pads to 128) —
    they do NOT amortize with block size.  Two measured corrections
    (v5e sweep, 4096^2 17-degree rotation, order 1): a fixed per-block
    overhead (~500 cycles: DMA issue + grid step) that punishes tiny
    blocks, and a mild preference for more sub-blocks (smaller
    per-matmul working sets pipeline better).  The sweep minimum was
    (B0=64, BS=32) at 21 ms vs 25-63 ms for the large-block picks the
    old amortization model made.
    """
    best = None
    for b0 in (8, 16, 32, 64, 96, 128, 192, 256):
        for bs in (32, 64, 128):
            s0, s1 = _spans(mshape, b0, bs, order)
            if s0 > _MAX_S0 or s1 > _MAX_S1:
                continue
            nsub = max(1, 128 // bs)
            # 2 slots x NSUB subs x NBC planes of (S0, S1) f32 slabs
            slab_bytes = 2 * nsub * nbc * s0 * s1 * 4
            if slab_bytes > 24 * 1024 * 1024:
                continue
            # one-hot / rows intermediates are (P, S) vectors that live
            # in registers/VMEM at once; oversized blocks make Mosaic
            # spill (observed: 192x128 blocks at order 3 ran the
            # register allocator out by 144 MB)
            if b0 * bs * max(s0, s1) > (1 << 20) + (1 << 18):
                continue
            cost = (
                3 * _round_up(s0, 128) * _round_up(s1, 128)
                + 9_000_000 // (b0 * bs)
                + 100 * (s0 + s1)
                - 1_500 * nsub
            )
            key = (cost, -(b0 * bs))
            if best is None or key < best[0][0]:
                best = ((key,), b0, bs, s0, s1)
    if best is None:
        return None
    _, b0, bs, s0, s1 = best
    return b0, bs, s0, s1


def _onehot_weights(iota_f, rho, order):
    """One-hot weight matrix built arithmetically: the interpolation
    kernel function evaluated at (iota - rho).

    Per-tap ``where(iota == tap_k, w_k, 0)`` builds measure ~1.7x slower
    on the VPU (int compares + selects dominate the whole kernel); direct
    evaluation of the tent / cubic-B-spline function is branch-light and
    agrees with the tap-weight formulas to ~1 ulp (exactly at integer
    distances, where the one-hot support lives).
    """
    d = jnp.abs(iota_f - rho)
    if order in (0, 1):
        # order 0: rho is the integer nearest tap, so this is an exact
        # 0/1 indicator; order 1: tent = [1-frac, frac] at the two taps
        return jnp.maximum(0.0, 1.0 - d)
    # cubic B-spline: 2/3 - d^2 (1 - d/2) on [0,1), (2-d)^3 / 6 on [1,2)
    b = jnp.maximum(2.0 - d, 0.0)
    inner = 2.0 / 3.0 - d * d * (1.0 - 0.5 * d)
    return jnp.where(d < 1.0, inner, b * b * b * (1.0 / 6.0))


def _split3(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(w, src):
    """f32-faithful matmul as 3 bf16 passes (hi*hi + hi*lo + lo*hi)."""
    whi, wlo = _split3(w)
    shi, slo = _split3(src)
    acc = jnp.dot(whi, shi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(whi, slo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(wlo, shi, preferred_element_type=jnp.float32)
    return acc


def _make_affine_kernel(mshape, lo0, lo1, order, B0, BS, NSUB, S0, S1,
                        Hp, Wp, NBC):
    """Build the Pallas kernel body; every parameter is a Python scalar
    baked into the trace (the jit cache above keys on them).  NBC > 0
    selects the batched layout (NBC planes share each block's one-hot)."""
    a00, a01, a10, a11, o0, o1 = mshape
    base_off = -1 if order == 3 else 0
    n_taps = order + 1

    def block_coords(bi, bj, sub):
        ii = jax.lax.broadcasted_iota(jnp.int32, (B0, BS), 0).astype(
            jnp.float32) + (bi * B0).astype(jnp.float32)
        jj = jax.lax.broadcasted_iota(jnp.int32, (B0, BS), 1).astype(
            jnp.float32) + (bj * (BS * NSUB) + sub * BS).astype(jnp.float32)
        # coordinates in the ORIGINAL frame (pad offsets add to the
        # integer taps below) — bitwise-identical tap selection to the
        # XLA core and the gather path
        r = a00 * ii + a01 * jj + o0
        c = a10 * ii + a11 * jj + o1
        if order == 0:
            r0 = jnp.floor(r + 0.5)
            c0 = jnp.floor(c + 0.5)
        else:
            r0 = jnp.floor(r)
            c0 = jnp.floor(c)
        fr = r - r0
        fc = c - c0
        r0i = r0.astype(jnp.int32) + lo0
        c0i = c0.astype(jnp.int32) + lo1
        rmin = jnp.clip(((jnp.min(r0i) + base_off) // 8) * 8, 0, Hp - S0)
        cmin = jnp.clip(((jnp.min(c0i) + base_off) // 128) * 128,
                        0, Wp - S1)
        return r0i, c0i, fr, fc, rmin, cmin

    def kernel(x_any, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        b = pl.program_id(2) if NBC else None
        g1 = pl.num_programs(1)
        gb = pl.num_programs(2) if NBC else 1
        t = (i * g1 + j) * gb + (b if NBC else 0)
        nt = pl.num_programs(0) * g1 * gb
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        nslot = jax.lax.rem(t + 1, two)

        def dma(sl, sub, rmin, cmin, bb):
            if NBC:
                src_ref = x_any.at[
                    pl.ds(bb * NBC, NBC),
                    pl.ds(pl.multiple_of(rmin, 8), S0),
                    pl.ds(pl.multiple_of(cmin, 128), S1)]
            else:
                src_ref = x_any.at[
                    pl.ds(pl.multiple_of(rmin, 8), S0),
                    pl.ds(pl.multiple_of(cmin, 128), S1)]
            return pltpu.make_async_copy(src_ref, slab.at[sl, sub],
                                         sem.at[sl, sub])

        coords = [block_coords(i, j, s) for s in range(NSUB)]

        @pl.when(t == 0)
        def _():
            for s in range(NSUB):
                dma(slot, s, coords[s][4], coords[s][5], b).start()

        @pl.when(t + 1 < nt)
        def _():
            tn = t + 1
            if NBC:
                gbt = jnp.asarray(gb, tn.dtype)
                ij2 = jax.lax.div(tn, gbt)
                b2 = jax.lax.rem(tn, gbt)
            else:
                ij2 = tn
                b2 = None
            g1t = jnp.asarray(g1, tn.dtype)
            i2 = jax.lax.div(ij2, g1t)
            j2 = jax.lax.rem(ij2, g1t)
            for s in range(NSUB):
                *_, rm2, cm2 = block_coords(i2, j2, s)
                dma(nslot, s, rm2, cm2, b2).start()

        P = B0 * BS
        for s in range(NSUB):
            r0i, c0i, fr, fc, rmin, cmin = coords[s]
            dma(slot, s, rmin, cmin, b).wait()
            rho_r = ((r0i - rmin).astype(jnp.float32)
                     + (fr if order else 0.0))[:, :, None]
            rho_c = ((c0i - cmin).astype(jnp.float32)
                     + (fc if order else 0.0))[:, :, None]
            iota0 = jax.lax.broadcasted_iota(
                jnp.int32, (B0, BS, S0), 2).astype(jnp.float32)
            iota1 = jax.lax.broadcasted_iota(
                jnp.int32, (B0, BS, S1), 2).astype(jnp.float32)
            Wrow = _onehot_weights(iota0, rho_r, order)
            Wcol = _onehot_weights(iota1, rho_c, order)
            Wrow2 = Wrow.reshape(P, S0)
            if NBC:
                for p in range(NBC):
                    rows = _dot3(Wrow2, slab[slot, s, p])
                    out = jnp.sum(
                        rows.reshape(B0, BS, S1) * Wcol, axis=2)
                    out_ref[p, :, s * BS:(s + 1) * BS] = out.astype(
                        out_ref.dtype)
            else:
                rows = _dot3(Wrow2, slab[slot, s])
                out = jnp.sum(rows.reshape(B0, BS, S1) * Wcol, axis=2)
                out_ref[:, s * BS:(s + 1) * BS] = out.astype(
                    out_ref.dtype)

    return kernel


def supports_pallas_affine(order):
    return jax.default_backend() == "tpu" and order in (0, 1, 3)


def _make_map_kernel(order, B0, BS, NSUB, S0, S1):
    """Kernel body for dense-coordinate resampling: per-axis global tap
    positions ``rho = tap_base + frac`` are streamed as f32 blocks
    (exact for extents < 2^24); per-(block, sub) slab origins arrive via
    scalar prefetch."""

    def kernel(rmin_ref, cmin_ref, x_any, rq_ref, cq_ref, fr_ref,
               fc_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        g1 = pl.num_programs(1)
        t = i * g1 + j
        nt = pl.num_programs(0) * g1
        two = jnp.asarray(2, t.dtype)
        slot = jax.lax.rem(t, two)
        nslot = jax.lax.rem(t + 1, two)

        def dma(sl, sub, tt):
            rmin = rmin_ref[tt * NSUB + sub]
            cmin = cmin_ref[tt * NSUB + sub]
            return pltpu.make_async_copy(
                x_any.at[pl.ds(pl.multiple_of(rmin, 8), S0),
                         pl.ds(pl.multiple_of(cmin, 128), S1)],
                slab.at[sl, sub],
                sem.at[sl, sub],
            )

        @pl.when(t == 0)
        def _():
            for s in range(NSUB):
                dma(slot, s, t).start()

        @pl.when(t + 1 < nt)
        def _():
            for s in range(NSUB):
                dma(nslot, s, t + 1).start()

        P = B0 * BS
        iota0 = jax.lax.broadcasted_iota(
            jnp.int32, (B0, BS, S0), 2).astype(jnp.float32)
        iota1 = jax.lax.broadcasted_iota(
            jnp.int32, (B0, BS, S1), 2).astype(jnp.float32)
        for s in range(NSUB):
            dma(slot, s, t).wait()
            rq = rq_ref[:, s * BS:(s + 1) * BS]
            cq = cq_ref[:, s * BS:(s + 1) * BS]
            fr = fr_ref[:, s * BS:(s + 1) * BS]
            fc = fc_ref[:, s * BS:(s + 1) * BS]
            rmin = rmin_ref[t * NSUB + s]
            cmin = cmin_ref[t * NSUB + s]
            # int base relative to the slab origin stays small, so the
            # f32 sum with the fraction is exact (the single-array
            # rho formulation lost ~11 fraction bits at 2048-scale)
            rho_r = ((rq - rmin).astype(jnp.float32) + fr)[:, :, None]
            rho_c = ((cq - cmin).astype(jnp.float32) + fc)[:, :, None]
            Wrow = _onehot_weights(iota0, rho_r, order)
            Wcol = _onehot_weights(iota1, rho_c, order)
            rows = _dot3(Wrow.reshape(P, S0), slab[slot, s])
            out = jnp.sum(rows.reshape(B0, BS, S1) * Wcol, axis=2)
            out_ref[:, s * BS:(s + 1) * BS] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("order", "out_shape", "S0", "S1", "interpret"),
)
def map_pallas(xext, rq, cq, fr, fc, order, out_shape, S0, S1,
               interpret=False):
    """Dense-coordinate one-hot resampling (map_coordinates / warp).

    ``rq``/``cq`` are int32 base taps already offset into the padded
    ``xext`` frame, ``fr``/``fc`` the f32 fractions; the caller
    guarantees every (64, 64) coordinate tile's span fits the static
    (``S0``, ``S1``) slab (minus 8/128 alignment slack and the tap
    footprint).  Cites: reference map_coordinates kernel factory,
    cupyimg/scipy/ndimage/_interp_kernels.py:595-621.
    """
    B0 = BS = 64
    NSUB = 2
    base_off = -1 if order == 3 else 0
    H, W = out_shape
    G0 = -(-H // B0)
    G1 = -(-W // (BS * NSUB))

    xg = jnp.pad(xext, ((0, S0), (0, S1)))
    Hp, Wp = xg.shape

    # edge-pad the grids to whole blocks (edge values keep the
    # per-block span no wider than the interior measurement)
    Hb, Wb = G0 * B0, G1 * BS * NSUB
    pads = ((0, Hb - H), (0, Wb - W))
    rq = jnp.pad(rq.astype(jnp.int32), pads, mode="edge")
    cq = jnp.pad(cq.astype(jnp.int32), pads, mode="edge")
    fr = jnp.pad(fr, pads, mode="edge")
    fc = jnp.pad(fc, pads, mode="edge")

    # per-(block, sub) aligned slab origins, flattened [t * NSUB + s]
    def origins(base_taps, align, limit):
        tiles = base_taps.reshape(G0, B0, G1 * NSUB, BS)
        base = tiles.min(axis=(1, 3))
        base = ((base + base_off) // align) * align
        return jnp.clip(base, 0, limit).reshape(
            G0, G1, NSUB).reshape(-1)

    rmin = origins(rq, 8, Hp - S0)
    cmin = origins(cq, 128, Wp - S1)

    kernel = _make_map_kernel(int(order), B0, BS, NSUB, S0, S1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G0, G1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B0, BS * NSUB), lambda i, j, *_: (i, j)),
            pl.BlockSpec((B0, BS * NSUB), lambda i, j, *_: (i, j)),
            pl.BlockSpec((B0, BS * NSUB), lambda i, j, *_: (i, j)),
            pl.BlockSpec((B0, BS * NSUB), lambda i, j, *_: (i, j)),
        ],
        out_specs=pl.BlockSpec(
            (B0, BS * NSUB), lambda i, j, *_: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, NSUB, S0, S1), xext.dtype),
            pltpu.SemaphoreType.DMA((2, NSUB)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hb, Wb), xext.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(rmin, cmin, xg, rq, cq, fr, fc)
    return out[:H, :W]


@functools.partial(
    jax.jit,
    static_argnames=("lo0", "lo1", "mshape", "order", "out_shape",
                     "interpret"),
)
def affine_pallas(xext, lo0, lo1, mshape, order, out_shape,
                  interpret=False):
    """Resample pre-padded ``xext`` ((Hp, Wp) or (NB, Hp, Wp)) at
    ``matrix @ out_coord + offset`` for a static 2-D affine.

    ``lo0``/``lo1`` are the pad offsets added to integer taps (so the
    float coordinate arithmetic stays in the caller's original frame).
    Returns (H, W) or (NB, H, W).  Cites: reference affine kernel
    factory cupyimg/scipy/ndimage/_interp_kernels.py:690-751.
    """
    batched = xext.ndim == 3
    NB = xext.shape[0] if batched else 0
    NBC = min(_BATCH_CHUNK, NB) if batched else 0
    blk = _choose_block(mshape, order, nbc=max(NBC, 1))
    if blk is None:
        raise ValueError("affine spans exceed Pallas slab caps")
    B0, BS, S0, S1 = blk
    NSUB = max(1, 128 // BS)
    H, W = out_shape
    G0 = -(-H // B0)
    G1 = -(-W // (BS * NSUB))

    # guard-pad the tail so clipped slab origins always fit; batch padded
    # to a whole number of chunks
    if batched:
        GB = -(-NB // NBC)
        xg = jnp.pad(xext, ((0, GB * NBC - NB), (0, S0), (0, S1)))
    else:
        GB = 0
        xg = jnp.pad(xext, ((0, S0), (0, S1)))
    Hp, Wp = xg.shape[-2:]

    kernel = _make_affine_kernel(
        mshape, int(lo0), int(lo1), int(order), B0, BS, NSUB, S0, S1,
        Hp, Wp, NBC,
    )

    if batched:
        grid = (G0, G1, GB)
        out_spec = pl.BlockSpec(
            (NBC, B0, BS * NSUB), lambda i, j, b: (b, i, j),
            memory_space=pltpu.VMEM)
        out_shape_full = (GB * NBC, G0 * B0, G1 * BS * NSUB)
        sems = ("arbitrary", "arbitrary", "arbitrary")
        slab_shape = (2, NSUB, NBC, S0, S1)
    else:
        grid = (G0, G1)
        out_spec = pl.BlockSpec(
            (B0, BS * NSUB), lambda i, j: (i, j),
            memory_space=pltpu.VMEM)
        out_shape_full = (G0 * B0, G1 * BS * NSUB)
        sems = ("arbitrary", "arbitrary")
        slab_shape = (2, NSUB, S0, S1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape_full, xext.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM(slab_shape, xext.dtype),
            pltpu.SemaphoreType.DMA((2, NSUB)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sems,
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg)
    if batched:
        return out[:NB, :H, :W]
    return out[:H, :W]
