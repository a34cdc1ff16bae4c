"""General 2-D affine resampling as blocked one-hot MXU contractions.

XLA's dense gather runs at well under 1 GB/s on TPU for per-point 2-D
indices, which makes rotation-like ``affine_transform`` gather-bound
(~200 ms per tap on a 4096^2 image).  This module re-expresses the same
tap-weighted sum as matrix algebra the MXU executes natively:

- the output is processed in BxB blocks (a ``lax.scan``);
- a block's source coordinates are affine, so they live in a static-size
  bounding box that is ``dynamic_slice``d into registers;
- the row taps fold into a one-hot weight matrix W[(i,j), s0] (built by
  iota comparison) and apply as ONE matmul per block;
- the column taps fold into a second one-hot and contract elementwise.

Precision: matmuls run at ``Precision.HIGHEST`` so results match the
plain gather path bit-for-bit-ish (same f32 tap arithmetic; the bf16
default would quantize the interpolation weights).

Boundary handling: the input is pre-extended by the transform's maximum
excursion with the ndimage mode, so in-kernel coordinates are always
in-bounds; legacy 'constant' applies its outer cval mask afterwards.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cupyimg_tpu.core import boundary
from cupyimg_tpu.ops.interp import spline_weights
from cupyimg_tpu.ops.iir import get_spline_mode

__all__ = [
    "affine_onehot_2d",
    "affine_onehot_batched2d",
    "supports_affine",
    "map_onehot_2d",
    "supports_map",
]

_BLOCK = 128
_MAX_SRC = 512  # per-block source bbox edge cap

# When True, skip the Pallas kernel (ops/pallas_interp.py) and run the
# XLA lax.scan core even on TPU — testing/debug escape hatch.
_FORCE_XLA_CORE = False


def _dispatch_core(xext, lo0, lo1, mshape, order, mode, cval, out_shape):
    """Run the Pallas kernel when eligible, else the XLA scan core."""
    if not _FORCE_XLA_CORE:
        from cupyimg_tpu.ops import pallas_interp

        if pallas_interp.supports_pallas_affine(order):
            try:
                return pallas_interp.affine_pallas(
                    xext, int(lo0), int(lo1), mshape, int(order),
                    tuple(out_shape),
                )
            except ValueError:
                pass  # spans exceed slab caps: scan core handles it
    return _affine_onehot_core(
        xext, np.int32(lo0), np.int32(lo1), mshape, int(order), mode,
        float(cval), tuple(int(v) for v in out_shape),
    )


def _excursion(matrix, offset, out_shape, in_shape, margin):
    """Static per-axis (lo, hi) padding covering every source coord."""
    corners = np.array(
        [
            [0, 0],
            [0, out_shape[1] - 1],
            [out_shape[0] - 1, 0],
            [out_shape[0] - 1, out_shape[1] - 1],
        ],
        dtype=np.float64,
    )
    src = corners @ matrix.T + offset
    pads = []
    for ax in range(2):
        lo = max(0, int(math.ceil(-src[:, ax].min())) + margin)
        hi = max(
            0,
            int(math.ceil(src[:, ax].max() - (in_shape[ax] - 1)))
            + margin,
        )
        pads.append((lo, hi))
    return pads


def supports_affine(x, matrix, order):
    """Whether the one-hot MXU path applies."""
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 2 or np.dtype(x.dtype).kind != "f":
        return False
    if np.dtype(x.dtype).itemsize > 4:
        return False
    if order not in (0, 1, 3):
        return False
    try:
        m = np.asarray(matrix)
    except (TypeError, ValueError):
        return False  # traced matrix: block plan cannot be static
    if m.shape != (2, 2) or not np.all(np.isfinite(m)):
        return False
    # bbox must stay bounded (strong minification blows it up)
    span0 = (abs(m[0, 0]) + abs(m[0, 1])) * _BLOCK + order + 4
    span1 = (abs(m[1, 0]) + abs(m[1, 1])) * _BLOCK + order + 4
    if span0 > _MAX_SRC or span1 > _MAX_SRC:
        return False
    if x.size < (1 << 20):
        return False
    return True


def _tap_weights(frac, order):
    """Per-tap weights and the integer base offset for this order."""
    if order == 0:
        return [jnp.ones_like(frac)], 0
    if order == 1:
        return [1.0 - frac, frac], 0
    # cubic B-spline: 4 taps starting at floor - 1
    return spline_weights(frac, 3), -1


def _round_up(v, m):
    return ((v + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("mshape", "order", "mode", "cval", "out_shape"),
)
def _affine_onehot_core(
    xext, lo0, lo1, mshape, order, mode, cval, out_shape
):
    (a00, a01, a10, a11, o0, o1) = mshape
    H, W = out_shape
    B = _BLOCK
    G0 = -(-H // B)
    G1 = -(-W // B)
    batched = xext.ndim == 3
    NB = xext.shape[0] if batched else 1

    # per-block source bbox extents (static)
    span0 = (abs(a00) + abs(a01)) * B + order + 4
    span1 = (abs(a10) + abs(a11)) * B + order + 4
    S0 = _round_up(int(math.ceil(span0)), 8)
    S1 = _round_up(int(math.ceil(span1)), 128)

    # guard pad so dynamic_slice never clamps
    if batched:
        xg = jnp.pad(xext, ((0, 0), (0, S0), (0, S1)))
    else:
        xg = jnp.pad(xext, ((0, S0), (0, S1)))

    ii_blk, jj_blk = np.mgrid[0:B, 0:B].astype(np.float32)
    iota0 = jnp.arange(S0, dtype=jnp.int32)
    iota1 = jnp.arange(S1, dtype=jnp.int32)
    base_off = -1 if order == 3 else 0
    n_taps = order + 1

    def do_block(carry, bij):
        bi, bj = bij
        i = (bi * B).astype(np.float32) + ii_blk
        j = (bj * B).astype(np.float32) + jj_blk
        # coords in the ORIGINAL frame — identical f32 arithmetic to the
        # gather path, so tap selection (incl. exact-tie rounding) is
        # bitwise the same; the pad offset is added to the INTEGER tap
        # index afterwards (adding it to the float coord first perturbs
        # the fraction near ties)
        r = a00 * i + a01 * j + o0
        c = a10 * i + a11 * j + o1
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
        rmin = jnp.maximum(jnp.min(r0i) + base_off, 0)
        cmin = jnp.maximum(jnp.min(c0i) + base_off, 0)
        if batched:
            src = lax.dynamic_slice(
                xg, (jnp.int32(0), rmin, cmin), (NB, S0, S1)
            )
        else:
            src = lax.dynamic_slice(xg, (rmin, cmin), (S0, S1))

        rl = (r0i - rmin).reshape(-1)
        cl = (c0i - cmin).reshape(-1)

        wr, _ = _tap_weights(fr.reshape(-1), order)
        wc, _ = _tap_weights(fc.reshape(-1), order)

        Wrow = None
        for k in range(n_taps):
            t = (iota0[None, :] == (rl + base_off + k)[:, None]) * wr[
                k
            ][:, None]
            Wrow = t if Wrow is None else Wrow + t
        if batched:
            # shared weights across the batch: (P,S0) x (NB,S0,S1)
            rows = jnp.einsum(
                "ps,bst->bpt",
                Wrow,
                src,
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        else:
            rows = jnp.dot(
                Wrow,
                src,
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        Wcol = None
        for k in range(n_taps):
            t = (iota1[None, :] == (cl + base_off + k)[:, None]) * wc[
                k
            ][:, None]
            Wcol = t if Wcol is None else Wcol + t
        if batched:
            out = jnp.sum(rows * Wcol[None], axis=2)
            return carry, out.reshape(NB, B, B).astype(xext.dtype)
        out = jnp.sum(rows * Wcol, axis=1)
        return carry, out.reshape(B, B).astype(xext.dtype)

    bidx = jnp.stack(
        jnp.meshgrid(
            jnp.arange(G0), jnp.arange(G1), indexing="ij"
        ),
        -1,
    ).reshape(-1, 2)
    _, blocks = lax.scan(do_block, 0, (bidx[:, 0], bidx[:, 1]))
    if batched:
        out = (
            blocks.reshape(G0, G1, NB, B, B)
            .transpose(2, 0, 3, 1, 4)
            .reshape(NB, G0 * B, G1 * B)
        )
        return out[:, :H, :W]
    out = (
        blocks.reshape(G0, G1, B, B)
        .transpose(0, 2, 1, 3)
        .reshape(G0 * B, G1 * B)
    )
    return out[:H, :W]


def affine_onehot_batched2d(
    x, matrix, offset, order, mode, cval, out_shape
):
    """Batched variant: ``x`` is (B, H, W) and the same 2-D affine
    resamples every leading slice (coordinates are independent of the
    batch axis, so the one-hot weight matrices are shared and the row
    contraction becomes one batched MXU matmul per block)."""
    matrix = np.asarray(matrix, dtype=np.float64)
    offset = np.asarray(offset, dtype=np.float64).reshape(2)
    if x.ndim != 3:
        return None
    probe = x[0]
    if not supports_affine(probe, matrix, order):
        # size gate uses the full batch volume
        if not (
            supports_affine(
                jnp.zeros((max(x.shape[1], 1024), 1024), x.dtype),
                matrix, order,
            )
            and x.size >= (1 << 20)
        ):
            return None
    if mode not in (
        "nearest", "reflect", "mirror", "grid-wrap",
        "grid-mirror", "constant", "grid-constant",
    ):
        return None
    if order == 0 and mode in (
        "reflect", "mirror", "grid-mirror", "grid-wrap",
    ):
        return None

    margin = order + 2
    pads = _excursion(
        matrix, offset, out_shape, x.shape[1:], margin
    )
    if any(
        max(plo, phi) >= sdim
        for (plo, phi), sdim in zip(pads, x.shape[1:])
    ) and mode not in ("constant", "grid-constant", "nearest"):
        return None
    if order >= 2 and mode not in ("grid-constant", "nearest"):
        pad_mode = get_spline_mode(mode)
    else:
        pad_mode = mode
    xext = boundary.pad(
        x, [(0, 0)] + list(pads), pad_mode, cval
    )

    mshape = (
        float(matrix[0, 0]), float(matrix[0, 1]),
        float(matrix[1, 0]), float(matrix[1, 1]),
        float(offset[0]), float(offset[1]),
    )
    return _dispatch_core(
        xext, pads[0][0], pads[1][0], mshape, order, mode, cval,
        tuple(int(v) for v in out_shape),
    )


def affine_onehot_2d(
    x, matrix, offset, order, mode, cval, out_shape
):
    """Resample ``x`` at ``matrix @ out_coord + offset`` (2-D, orders
    0/1/3) via the blocked one-hot MXU path.  Returns None when the
    fallback gather path should run instead."""
    matrix = np.asarray(matrix, dtype=np.float64)
    offset = np.asarray(offset, dtype=np.float64).reshape(2)
    if not supports_affine(x, matrix, order):
        return None
    if mode not in (
        "nearest", "reflect", "mirror", "grid-wrap",
        "grid-mirror", "constant", "grid-constant",
    ):
        # legacy 'wrap' premaps the float coordinate with a
        # non-periodic fold that a padded extension cannot express
        return None
    if order == 0 and mode in (
        "reflect", "mirror", "grid-mirror", "grid-wrap",
    ):
        # round-half-up direction flips under coordinate folding; the
        # gather path premaps the float coordinate like scipy does
        return None

    margin = order + 2
    pads = _excursion(matrix, offset, out_shape, x.shape, margin)
    if any(
        max(plo, phi) >= s
        for (plo, phi), s in zip(pads, x.shape)
    ) and mode not in ("constant", "grid-constant", "nearest"):
        # excursion beyond one period: let the gather path handle the
        # exotic wrap/reflect index math (jnp.pad cannot express it in
        # one step and the gather fallback in boundary.pad covers it,
        # but correctness near multi-period folds is subtle — bail)
        return None
    # tap boundary family: orders >= 2 map out-of-range taps with the
    # spline mode family (mirror for legacy 'constant'/'reflect' etc.),
    # exactly like interp.axis_taps — the outer cval mask is the
    # caller's job
    if order >= 2 and mode not in ("grid-constant", "nearest"):
        pad_mode = get_spline_mode(mode)
    else:
        pad_mode = mode
    xext = boundary.pad(x, pads, pad_mode, cval)

    mshape = (
        float(matrix[0, 0]),
        float(matrix[0, 1]),
        float(matrix[1, 0]),
        float(matrix[1, 1]),
        float(offset[0]),
        float(offset[1]),
    )
    return _dispatch_core(
        xext, pads[0][0], pads[1][0], mshape, order, mode, cval,
        tuple(int(s) for s in out_shape),
    )


_S0_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)
_S1_BUCKETS = (128, 256, 384, 512)


def _bucket(v, buckets):
    for b in buckets:
        if v <= b:
            return b
    return None


@functools.partial(
    jax.jit, static_argnames=("B", "order", "S0", "S1", "out_shape")
)
def _map_onehot_core(
    xext, rq, cq, fr, fc, lo0, lo1, B, order, S0, S1, out_shape
):
    """Blocked one-hot gather with per-block dynamic bbox origins.

    ``rq``/``cq`` are integer base taps (floor already applied, in the
    original frame), ``fr``/``fc`` the fractional parts — all of the
    (padded) output shape.
    """
    H, W = out_shape
    G0 = -(-H // B)
    G1 = -(-W // B)

    xg = jnp.pad(xext, ((0, S0), (0, S1)))

    def to_blocks(a):
        # edge-pad the tail: zero padding would widen edge blocks' bbox
        # past the measured span (and past S0/S1)
        Hp, Wp = G0 * B, G1 * B
        a = jnp.pad(
            a,
            ((0, Hp - a.shape[0]), (0, Wp - a.shape[1])),
            mode="edge",
        )
        return (
            a.reshape(G0, B, G1, B)
            .transpose(0, 2, 1, 3)
            .reshape(G0 * G1, B, B)
        )

    rqb = to_blocks(rq + lo0)
    cqb = to_blocks(cq + lo1)
    frb = to_blocks(fr)
    fcb = to_blocks(fc)

    iota0 = jnp.arange(S0, dtype=jnp.int32)
    iota1 = jnp.arange(S1, dtype=jnp.int32)
    base_off = -1 if order == 3 else 0
    n_taps = order + 1

    def do_block(carry, blk):
        rqi, cqi, frk, fck = blk
        rmin = jnp.maximum(jnp.min(rqi) + base_off, 0)
        cmin = jnp.maximum(jnp.min(cqi) + base_off, 0)
        src = lax.dynamic_slice(xg, (rmin, cmin), (S0, S1))

        rl = (rqi - rmin).reshape(-1)
        cl = (cqi - cmin).reshape(-1)
        wr, _ = _tap_weights(frk.reshape(-1), order)
        wc, _ = _tap_weights(fck.reshape(-1), order)

        Wrow = None
        for k in range(n_taps):
            t = (iota0[None, :] == (rl + base_off + k)[:, None]) * wr[
                k
            ][:, None]
            Wrow = t if Wrow is None else Wrow + t
        rows = jnp.dot(
            Wrow, src,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        Wcol = None
        for k in range(n_taps):
            t = (iota1[None, :] == (cl + base_off + k)[:, None]) * wc[
                k
            ][:, None]
            Wcol = t if Wcol is None else Wcol + t
        out = jnp.sum(rows * Wcol, axis=1)
        return carry, out.reshape(B, B).astype(xext.dtype)

    _, blocks = lax.scan(do_block, 0, (rqb, cqb, frb, fcb))
    out = (
        blocks.reshape(G0, G1, B, B)
        .transpose(0, 2, 1, 3)
        .reshape(G0 * B, G1 * B)
    )
    return out[:H, :W]


def supports_map(x, coords, order, mode):
    """Static eligibility checks for the one-hot map_coordinates path
    (the dynamic locality check happens inside ``map_onehot_2d``)."""
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 2 or len(coords) != 2:
        return False
    if np.dtype(x.dtype).kind != "f" or np.dtype(x.dtype).itemsize > 4:
        return False
    if isinstance(x, jax.core.Tracer) or any(
        isinstance(c, jax.core.Tracer) for c in coords
    ):
        # under an outer jit the locality stats can't be pulled to host
        return False
    # order 0 is a single-tap gather — already as fast as the one-hot
    # contraction, and exempt from tie-rounding subtleties
    if order not in (1, 3):
        return False
    if mode not in (
        "nearest", "reflect", "mirror", "grid-wrap",
        "grid-mirror", "constant", "grid-constant",
    ):
        return False
    r = coords[0]
    if len(r.shape) != 2 or r.size < (1 << 18):
        return False
    return True


def map_onehot_2d(x, coords, order, mode, cval):
    """Locality-adaptive one-hot gather for dense 2-D coordinates
    (map_coordinates / warp / optical-flow resampling).

    Requires the coordinate field to be *locally smooth*: the per-block
    source bounding box (measured on device, one host scalar pull) must
    fit a static bucket; wildly scattered coordinates return None and
    the dense gather path runs instead.
    """
    if not supports_map(x, coords, order, mode):
        return None
    r, c = coords
    out_shape = r.shape

    B = _BLOCK
    if order == 0:
        r0 = jnp.floor(r + 0.5)
        c0 = jnp.floor(c + 0.5)
    else:
        r0 = jnp.floor(r)
        c0 = jnp.floor(c)
    fr = (r - r0).astype(jnp.float32)
    fc = (c - c0).astype(jnp.float32)
    rq = r0.astype(jnp.int32)
    cq = c0.astype(jnp.int32)

    # one host sync: global coordinate range (for the boundary pad) and
    # max per-block span (for the bbox bucket)
    G0 = -(-out_shape[0] // B)
    G1 = -(-out_shape[1] // B)

    def spans(a):
        ap = jnp.pad(
            a,
            (
                (0, G0 * B - a.shape[0]),
                (0, G1 * B - a.shape[1]),
            ),
            mode="edge",
        )
        blk = ap.reshape(G0, B, G1, B)
        return jnp.max(
            blk.max(axis=(1, 3)) - blk.min(axis=(1, 3))
        )

    stats = jnp.stack(
        [
            spans(rq).astype(jnp.int32),
            spans(cq).astype(jnp.int32),
            jnp.min(rq), jnp.max(rq), jnp.min(cq), jnp.max(cq),
        ]
    )
    (span0, span1, rmin_g, rmax_g, cmin_g, cmax_g) = [
        int(v) for v in np.asarray(stats)
    ]

    margin = order + 2
    S0 = _bucket(
        _round_up(span0 + 2 * margin + 2, 8), _S0_BUCKETS
    )
    S1 = _bucket(
        _round_up(span1 + 2 * margin + 2, 128), _S1_BUCKETS
    )
    if S0 is None or S1 is None:
        return None  # coordinates not local enough

    lo0 = max(0, -rmin_g + margin)
    hi0 = max(0, rmax_g - (x.shape[0] - 1) + margin)
    lo1 = max(0, -cmin_g + margin)
    hi1 = max(0, cmax_g - (x.shape[1] - 1) + margin)
    pads = [(lo0, hi0), (lo1, hi1)]
    if any(
        max(p) >= s for p, s in zip(pads, x.shape)
    ) and mode not in ("constant", "grid-constant", "nearest"):
        return None
    if order >= 2 and mode not in ("grid-constant", "nearest"):
        pad_mode = get_spline_mode(mode)
    else:
        pad_mode = mode
    xext = boundary.pad(x, pads, pad_mode, cval)

    if not _FORCE_XLA_CORE and jax.default_backend() == "tpu":
        from cupyimg_tpu.ops import pallas_interp

        # Pallas slabs: span per 64x64 tile <= span per 128x128 block
        # (measured above), plus tap footprint and the 8/128 DMA
        # alignment slack the kernel's origin rounding introduces
        S0p = _round_up(span0 + 2 * margin + 2 + 8, 8)
        S1p = _round_up(span1 + 2 * margin + 2 + 128, 128)
        if S0p <= 512 and S1p <= 512:
            zero = jnp.zeros_like(fr)
            return pallas_interp.map_pallas(
                xext, rq + lo0, cq + lo1,
                fr if order else zero, fc if order else zero,
                int(order), tuple(int(v) for v in out_shape),
                int(S0p), int(S1p),
            )

    return _map_onehot_core(
        xext, rq, cq, fr, fc,
        np.int32(lo0), np.int32(lo1),
        B, int(order), int(S0), int(S1),
        tuple(int(v) for v in out_shape),
    )
