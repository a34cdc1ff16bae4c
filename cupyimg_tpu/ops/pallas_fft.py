"""Fused four-step FFT as single-pass Pallas TPU kernels.

``ops/permfft.py`` holds the math: a length ``n = a*b`` transform is a
contraction over the slow factor, a twiddle, and a contraction over the
fast factor, with the spectrum left in a fixed *permuted* order (and
the inverse running the stages mirrored, landing back in natural
order).  Running those stages as separate XLA ops costs ~6 HBM round
trips per axis transform (measured 24 ms for a 4224^2 roundtrip on v5e
— worse than XLA's own 8.6 ms FFT).  This module fuses an entire axis
transform into ONE Pallas pass: each grid step reads a block, runs
matmul -> twiddle -> matmul in VMEM on the MXU, and writes the block
once.  Traffic drops to one read + one write of the two float32 planes
per axis, the HBM roofline for the op.

Two kernel layouts cover every axis of an nd array (the caller
reshapes, which is free for row-major views):

- **axis-last**  ``(R, n)`` viewed ``(R, G, a, b)``: the fast-factor
  contraction is a plain ``(G*a, b) @ (b, b)`` lane matmul; the
  slow-factor contraction is a G-batched ``(a, a)`` matmul
  (``dot_general`` with a leading batch dim, constant weights tiled
  per batch so no operand transposes appear anywhere).
- **axis-first** ``(n, C)`` viewed ``(a, b, BC)``: the slow-factor
  contraction is one ``(a, a) @ (a, b*BC)`` matmul on the merged minor
  dims; the fast-factor contraction is an a-batched
  ``(b, b) @ (b, BC)`` matmul, again with batch-tiled constant lhs so
  the output lands minor-dim-last with no transposes.

Middle axes of nd arrays fold their leading dims into an extra grid
dimension over the axis-first kernel.  Complex values travel as
(real, imag) float32 plane pairs (the axon TPU runtime has no
complex64); each complex matmul is 3 real Karatsuba matmuls, and each
real f32 matmul is a 3-pass bfloat16 hi/lo split (~2^-22 relative).
Real-input forward and real-output inverse transforms skip the dead
half of their first / last stage.

The reference delegates this layer to cuFFT plans
(cupyimg/scipy/signal/signaltools.py:437-504); XLA's TPU FFT — the
drop-in alternative — measures a flat ~28 GB/s effective on v5e, which
this kernel beats by fusing the whole transform into one pass.

Measured tuning notes (v5e, 4224^2 f32, round 5): at this size the
pass is MXU-bound, not HBM-bound — a 2-pass transform is ~100 GFLOP
of 3-pass-bf16 stage matmuls (6*(5a+6b) bf16 FLOPs/point) against a
~500 MB traffic floor.  A/B results, kept as env knobs:

- complex-matmul form (CUPYIMG_TPU_FFT_CMUL): Karatsuba (3 dots,
  3 hi/lo data splits) beats the 4-matmul form (4 dots, 2 splits):
  fwd 1.33 vs 1.50 ms, inv 1.73 vs 1.81 ms — MXU passes cost more
  than the extra VPU split.
- column block (CUPYIMG_TPU_FFT_BC): 128 is right; 384 exceeds the
  Mosaic VMEM budget at this size and fails to compile.
- factor split: (a, b) = (33, 128) is right; (66, 64) runs the
  forward pathologically slow (10 ms) despite 23 % fewer MACs, and
  (132, 32) loses both directions — sub-128 fast factors waste MXU
  lanes.
- the inverse 1/(n0*n1) normalization folds into the (exact f32,
  elementwise) twiddle stage — removing the trailing full-plane XLA
  multiply saved ~0.2 ms on the inverse.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cupyimg_tpu.ops.permfft import _split, good_size, can_handle

__all__ = ["fft_axis", "fft2", "fft2_applies", "good_size", "can_handle"]


def fft2_applies(n0: int, n1: int) -> bool:
    """True when the fused-transpose 2-D pipeline handles (n0, n1):
    both axes two-stage (> 256) permfft sizes."""
    from cupyimg_tpu.ops.permfft import _MAX_A

    return (
        n0 > _MAX_A and n1 > _MAX_A and can_handle(n0) and can_handle(n1)
    )

_VMEM_LIMIT = 96 * 1024 * 1024
_LANE = 128

import os as _os

# Complex-matmul strategy: Karatsuba (3 real dots, 3 hi/lo data splits)
# or the 4-matmul form (4 real dots, 2 splits); see _cmatmul.
_CMUL = _os.environ.get("CUPYIMG_TPU_FFT_CMUL", "karatsuba")


def _hilo(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _np_hilo(m):
    hi = m.astype(np.float32).astype(jnp.bfloat16)
    lo = (m.astype(np.float32) - np.asarray(hi, np.float32)).astype(
        jnp.bfloat16
    )
    return np.asarray(hi), np.asarray(lo)


def _dot3(l_hilo, r_hilo, dims):
    """3-pass bf16 dot_general: hi@hi + lo@hi + hi@lo in f32."""
    lh, ll = l_hilo
    rh, rl = r_hilo
    f = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return f(lh, rh) + f(ll, rh) + f(lh, rl)


def _dot_exact(l, r, dims):
    """Full-precision f32 dot (interpret mode: the interpreter does not
    honor f32 accumulation of bf16 operands, so CPU tests use this)."""
    return jax.lax.dot_general(
        l,
        r,
        dimension_numbers=dims,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _join(w_hilo):
    wh, wl = w_hilo
    return wh.astype(jnp.float32) + wl.astype(jnp.float32)


def _cmatmul(w_triple, x_pair, dims, w_lhs=True, exact=False):
    """Complex matmul of data pair against constant triple via 3
    Karatsuba real dots.

    ``w_triple = (wr, wi, ws)`` hi/lo-split constants, ws = wr + wi;
    ``x_pair = (xr, xi)`` VMEM f32 arrays (xi None => real data);
    ``w_lhs`` picks which operand the constants occupy in ``dims``.
    Returns (real, imag) f32.
    """
    wr, wi, ws = w_triple
    xr, xi = x_pair

    if exact:
        def d(x, w_hilo):
            w = _join(w_hilo)
            return (
                _dot_exact(w, x, dims) if w_lhs else _dot_exact(x, w, dims)
            )

        if xi is None:
            return d(xr, wr), d(xr, wi)
        m1 = d(xr, wr)
        m2 = d(xi, wi)
        m3 = d(xr + xi, ws)
        return m1 - m2, m3 - m1 - m2

    def d(x_hilo, w_hilo):
        return (
            _dot3(w_hilo, x_hilo, dims)
            if w_lhs
            else _dot3(x_hilo, w_hilo, dims)
        )

    xr_s = _hilo(xr)
    if xi is None:
        return d(xr_s, wr), d(xr_s, wi)
    xi_s = _hilo(xi)
    if _CMUL == "four":
        # 4-matmul complex product: 12 bf16 MXU passes vs Karatsuba's
        # 9, but only two runtime hi/lo data splits instead of three —
        # wins when the pass is VPU-split-bound rather than MXU-bound
        return (
            d(xr_s, wr) - d(xi_s, wi),
            d(xr_s, wi) + d(xi_s, wr),
        )
    m1 = d(xr_s, wr)
    m2 = d(xi_s, wi)
    m3 = d(_hilo(xr + xi), ws)
    return m1 - m2, m3 - m1 - m2


def _cmatmul_real_out(w_triple, x_pair, dims, w_lhs=True, exact=False):
    """Real part only of the complex product (inverse's last stage)."""
    wr, wi, _ = w_triple
    xr, xi = x_pair
    if exact:
        if w_lhs:
            return _dot_exact(_join(wr), xr, dims) - _dot_exact(
                _join(wi), xi, dims
            )
        return _dot_exact(xr, _join(wr), dims) - _dot_exact(
            xi, _join(wi), dims
        )
    if w_lhs:
        return _dot3(wr, _hilo(xr), dims) - _dot3(wi, _hilo(xi), dims)
    return _dot3(_hilo(xr), wr, dims) - _dot3(_hilo(xi), wi, dims)


@functools.lru_cache(maxsize=None)
def _stage_factors(n: int, inverse: bool):
    """Raw complex stage factors (W_slow, twiddle, W_fast) for n=a*b."""
    a, b = _split(n)
    sgn = 2j if inverse else -2j
    Wa = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    tw = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(b)) / n)
    Wb = np.exp(sgn * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    return a, b, Wa, tw, Wb


def _pack(m):
    """Host-split a complex matrix into hi/lo bf16 Karatsuba triple
    (each entry itself an (hi, lo) pair of jnp-ready numpy arrays)."""
    return (
        _np_hilo(m.real),
        _np_hilo(m.imag),
        _np_hilo(m.real + m.imag),
    )


# dot_general dimension numbers used by the kernels.  Weight constants
# sit on whichever side keeps the output minor dim in lanes with no
# operand transposes: lhs for sublane-side contractions, rhs for the
# lane-side (data @ W) matmuls.
_D2D = (((1,), (0,)), ((), ()))  # (M,K)@(K,N)
_DBATCH = (((2,), (1,)), ((0,), (0,)))  # (g,j,k)@(g,k,N)


# Slow-stage strategy for the axis-last kernel.  The slow-factor
# contraction runs over the sublane-side dim of the (G*a, b) tile; the
# MXU only contracts lane-side, so either (a) batch G small (a, a)
# matmuls via dot_general batch dims, or (b) transpose the tile in
# VMEM and run one clean (G*b, a) @ (a, a) lane matmul.  (A third
# option — one block-diagonal (G*a, G*a) matmul — compiles but runs
# pathologically slow on v5e; do not resurrect it.)
_SLOW_VARIANTS = ("batched", "transpose")


@functools.lru_cache(maxsize=None)
def _weights_last(n: int, inverse: bool, G: int, variant: str,
                  scale: float = 1.0):
    a, b, Wa, tw, Wb = _stage_factors(n, inverse)
    # inverse 1/n normalization folds into the (exact, f32, elementwise)
    # twiddle multiply between the stages — no trailing HBM pass
    tw = tw * scale
    if variant == "batched":
        slow = _pack(np.tile(Wa[None], (G, 1, 1)))  # (g, j1, k1) lhs
    else:  # transpose: rhs of (G*b, k1) @ (k1, j1)
        slow = _pack(Wa)
    return {
        "slow": slow,
        "fast": _pack(Wb),  # (k2,j2): rhs of data @ Wb
        "tw_r": np.tile(tw.real, (G, 1)).astype(np.float32),
        "tw_i": np.tile(tw.imag, (G, 1)).astype(np.float32),
        "ab": (a, b),
    }


@functools.lru_cache(maxsize=None)
def _weights_first(n: int, inverse: bool, scale: float = 1.0):
    a, b, Wa, tw, Wb = _stage_factors(n, inverse)
    tw = tw * scale  # see _weights_last: folded 1/n normalization
    return {
        "slow": _pack(Wa.T),  # (j1, k1) single matmul on merged minors
        "fast": _pack(np.tile(Wb.T[None], (a, 1, 1))),  # (a, j2, k2)
        "tw_r": tw.real.astype(np.float32)[:, :, None],
        "tw_i": tw.imag.astype(np.float32)[:, :, None],
        "ab": (a, b),
    }


def _twiddle(vr, vi, twr, twi):
    if vi is None:
        return vr * twr, vr * twi
    return vr * twr - vi * twi, vr * twi + vi * twr


def _w_arrays(W):
    """Flatten a weights dict into the 14-array operand list the
    kernels consume: slow triple (3 x hi/lo), fast triple, twiddles."""
    out = []
    for key in ("slow", "fast"):
        for pair in W[key]:
            out.extend(pair)
    out.append(W["tw_r"])
    out.append(W["tw_i"])
    return [jnp.asarray(m) for m in out]


def _w_unpack(refs):
    """Inverse of _w_arrays on kernel refs -> (slow, fast, twr, twi)."""
    vals = [r[...] for r in refs]
    slow = tuple(
        (vals[2 * k], vals[2 * k + 1]) for k in range(3)
    )
    fast = tuple(
        (vals[6 + 2 * k], vals[6 + 2 * k + 1]) for k in range(3)
    )
    return slow, fast, vals[12], vals[13]


def _kernel_last(W, inverse, real_in, real_out, G, a, b, variant,
                 exact=False, with_mul=False):
    """Tile (G, a, b); forward: slow matmul -> twiddle -> lane fast
    matmul; inverse mirrored.  The slow contraction runs per
    ``variant`` — G-batched dot_general or VMEM-transposed lane
    matmul (see _SLOW_VARIANTS).  ``with_mul`` folds a pointwise
    complex product by a second operand pair into the pass."""

    def swapin(v):
        # (G*a, b) flat view -> (G*b, a): per-row transpose of the
        # (a, b) block so the slow contraction lands on lanes.
        return (
            None
            if v is None
            else jnp.swapaxes(v.reshape(G, a, b), 1, 2).reshape(G * b, a)
        )

    def swapout(v):
        return (
            None
            if v is None
            else jnp.swapaxes(v.reshape(G, b, a), 1, 2).reshape(G * a, b)
        )

    def slow_mm(slow, pr, pi, real_only=False):
        """Contract the slow factor of a flat (G*a, b) pair; returns a
        flat (G*a, b) pair (imag None when real_only)."""
        fn = _cmatmul_real_out if real_only else _cmatmul
        if variant == "batched":
            x3 = (
                pr.reshape(G, a, b),
                None if pi is None else pi.reshape(G, a, b),
            )
            out = fn(slow, x3, _DBATCH, w_lhs=True, exact=exact)
            if real_only:
                return out.reshape(G * a, b), None
            return out[0].reshape(G * a, b), out[1].reshape(G * a, b)
        xt = (swapin(pr), swapin(pi))
        out = fn(slow, xt, _D2D, w_lhs=False, exact=exact)
        if real_only:
            return swapout(out), None
        return swapout(out[0]), swapout(out[1])

    def body(xr_ref, *rest):
        idx = 0
        if real_in:
            xi = None
        else:
            xi = rest[idx][...].reshape(G * a, b)
            idx += 1
        if with_mul:
            mr = rest[idx][...].reshape(G * a, b)
            mi = rest[idx + 1][...].reshape(G * a, b)
            idx += 2
        w_refs = rest[idx:idx + 14]
        outs = rest[idx + 14:]
        slow, fast, twr, twi = _w_unpack(w_refs)
        xr = xr_ref[...].reshape(G * a, b)
        if with_mul:
            xr, xi = xr * mr - xi * mi, xr * mi + xi * mr
        if not inverse:
            ur, ui = slow_mm(slow, xr, xi)
            vr, vi = _twiddle(ur, ui, twr, twi)
            if real_out:
                outs[0][...] = _cmatmul_real_out(
                    fast, (vr, vi), _D2D, w_lhs=False, exact=exact
                ).reshape(G, a, b)
            else:
                rr, ri = _cmatmul(
                    fast, (vr, vi), _D2D, w_lhs=False, exact=exact
                )
                outs[0][...] = rr.reshape(G, a, b)
                outs[1][...] = ri.reshape(G, a, b)
        else:
            ur, ui = _cmatmul(fast, (xr, xi), _D2D, w_lhs=False, exact=exact)
            vr, vi = _twiddle(ur, ui, twr, twi)
            rr, ri = slow_mm(slow, vr, vi, real_only=real_out)
            if real_out:
                outs[0][...] = rr.reshape(G, a, b)
            else:
                outs[0][...] = rr.reshape(G, a, b)
                outs[1][...] = ri.reshape(G, a, b)

    return body


def _kernel_first(W, inverse, real_in, real_out, a, b, BC, exact=False,
                  transpose_out=False, with_mul=False):
    """Tile (a, b, BC) [leading grid dim squeezed]; forward: slow
    matmul on merged minors -> twiddle -> a-batched fast matmul.

    ``transpose_out=True`` transposes the (n, BC) result to (BC, n)
    in VMEM before the write, so a 2-D transform runs as two of these
    passes with no separate HBM transpose (F2 = T.Fc.T.Fc).

    ``with_mul=True`` adds a second complex operand pair and folds the
    pointwise complex product into the pass (spectrum product fused
    into the inverse transform — no separate HBM round trip)."""

    def merge(v):
        return None if v is None else v.reshape(a, b * BC)

    def split3(v):
        return None if v is None else v.reshape(a, b, BC)

    def store(ref, v):
        if transpose_out:
            ref[...] = jnp.transpose(v.reshape(a * b, BC)).reshape(ref.shape)
        else:
            ref[...] = v.reshape(ref.shape)

    def body(xr_ref, *rest):
        idx = 0
        if real_in:
            xi = None
        else:
            xi = rest[idx][...].reshape(a, b, BC)
            idx += 1
        if with_mul:
            mr = rest[idx][...].reshape(a, b, BC)
            mi = rest[idx + 1][...].reshape(a, b, BC)
            idx += 2
        w_refs = rest[idx:idx + 14]
        outs = rest[idx + 14:]
        slow, fast, twr, twi = _w_unpack(w_refs)
        xr = xr_ref[...].reshape(a, b, BC)
        if with_mul:
            xr, xi = xr * mr - xi * mi, xr * mi + xi * mr
        if not inverse:
            ur, ui = _cmatmul(slow, (merge(xr), merge(xi)), _D2D, exact=exact)
            vr, vi = _twiddle(split3(ur), split3(ui), twr, twi)
            if real_out:
                store(outs[0], _cmatmul_real_out(
                    fast, (vr, vi), _DBATCH, exact=exact))
            else:
                rr, ri = _cmatmul(fast, (vr, vi), _DBATCH, exact=exact)
                store(outs[0], rr)
                store(outs[1], ri)
        else:
            ur, ui = _cmatmul(fast, (xr, xi), _DBATCH, exact=exact)
            vr, vi = _twiddle(ur, ui, twr, twi)
            if real_out:
                store(outs[0], _cmatmul_real_out(
                    slow, (merge(vr), merge(vi)), _D2D, exact=exact))
            else:
                rr, ri = _cmatmul(
                    slow, (merge(vr), merge(vi)), _D2D, exact=exact
                )
                store(outs[0], rr)
                store(outs[1], ri)

    return body


import os as _os

# Slow-stage strategy (see _SLOW_VARIANTS); overridable for perf A/B.
SLOW_VARIANT = _os.environ.get("CUPYIMG_TPU_FFT_SLOW", "transpose")


def _choose_G(R: int, a: int, b: int) -> int:
    """Rows per block for the axis-last kernel; bigger tiles amortize
    grid overhead and give the slow stage longer lane extents."""
    G = int(_os.environ.get("CUPYIMG_TPU_FFT_G", "8"))
    return max(1, min(G, R))


def _pallas(kernel, grid, in_arrays, in_specs, out_shapes, out_specs,
            interpret):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*in_arrays)


def _fft_last(xr, xi, n, inverse, real_out, interpret, mul_pair=None,
              scale=1.0):
    """Transform the last axis; xr/xi shaped (..., n).  ``mul_pair``
    folds a pointwise complex product into the pass (see
    _kernel_last); ``scale`` folds a constant factor into the twiddle
    stage (the inverse 1/n normalization rides for free)."""
    lead = xr.shape[:-1]
    R = int(np.prod(lead)) if lead else 1
    a, b = _split(n)
    G = _choose_G(R, a, b)
    grid = (pl.cdiv(R, G),)
    variant = SLOW_VARIANT
    W = _weights_last(n, inverse, G, variant, float(scale))
    real_in = xi is None
    if mul_pair is not None and real_in:
        raise ValueError("mul_pair requires complex input")
    kernel = _kernel_last(
        W, inverse, real_in, real_out, G, a, b, variant, exact=interpret,
        with_mul=mul_pair is not None,
    )

    xr3 = xr.reshape(R, a, b)
    ins = [xr3]
    spec = pl.BlockSpec((G, a, b), lambda i: (i, 0, 0))
    in_specs = [spec]
    if not real_in:
        ins.append(xi.reshape(R, a, b))
        in_specs.append(spec)
    if mul_pair is not None:
        for m in mul_pair:
            ins.append(m.reshape(R, a, b))
            in_specs.append(spec)
    warrs = _w_arrays(W)
    ins.extend(warrs)
    in_specs.extend(
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in warrs
    )
    out_shape = jax.ShapeDtypeStruct((R, a, b), jnp.float32)
    if real_out:
        out_shapes = out_shape
        out_specs = spec
    else:
        out_shapes = (out_shape, out_shape)
        out_specs = (spec, spec)
    out = _pallas(
        kernel, grid, ins, in_specs, out_shapes, out_specs, interpret
    )
    if real_out:
        return out.reshape(lead + (n,)), None
    return (
        out[0].reshape(lead + (n,)),
        out[1].reshape(lead + (n,)),
    )


def _fft_first(xr, xi, n, inverse, real_out, interpret,
               transpose_out=False, mul_pair=None, scale=1.0):
    """Transform axis 0 of (n, C) views, with an optional folded
    leading batch:  xr/xi shaped (L, n, C).  ``transpose_out`` makes
    the kernel write (L, C, n) instead — the fused-transpose pass of
    the 2-D pipeline.  ``mul_pair=(mr, mi)`` (same shape) folds a
    pointwise complex product into the pass before the transform;
    ``scale`` folds a constant factor into the twiddle stage."""
    L, _, C = xr.shape
    a, b = _split(n)
    # wider column blocks give the a-batched fast-stage matmuls longer
    # lane extents (fewer, larger MXU dispatches); tunable for perf A/B
    BC = int(_os.environ.get("CUPYIMG_TPU_FFT_BC", "128"))
    if C <= BC:
        BC = _LANE if C % _LANE == 0 or C > _LANE else C
    grid = (L, pl.cdiv(C, BC))
    W = _weights_first(n, inverse, float(scale))
    real_in = xi is None
    if mul_pair is not None and real_in:
        raise ValueError("mul_pair requires complex input")
    kernel = _kernel_first(
        W, inverse, real_in, real_out, a, b, BC, exact=interpret,
        transpose_out=transpose_out, with_mul=mul_pair is not None,
    )

    xr4 = xr.reshape(L, a, b, C)
    spec = pl.BlockSpec((1, a, b, BC), lambda l, c: (l, 0, 0, c))
    ins = [xr4]
    in_specs = [spec]
    if not real_in:
        ins.append(xi.reshape(L, a, b, C))
        in_specs.append(spec)
    if mul_pair is not None:
        for m in mul_pair:
            ins.append(m.reshape(L, a, b, C))
            in_specs.append(spec)
    warrs = _w_arrays(W)
    ins.extend(warrs)
    in_specs.extend(
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in warrs
    )
    if transpose_out:
        out_shape = jax.ShapeDtypeStruct((L, C, n), jnp.float32)
        ospec = pl.BlockSpec((1, BC, n), lambda l, c: (l, c, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((L, a, b, C), jnp.float32)
        ospec = spec
    if real_out:
        out_shapes = out_shape
        out_specs = ospec
    else:
        out_shapes = (out_shape, out_shape)
        out_specs = (ospec, ospec)
    out = _pallas(
        kernel, grid, ins, in_specs, out_shapes, out_specs, interpret
    )
    final = (lambda v: v) if transpose_out else (
        lambda v: v.reshape(L, n, C)
    )
    if real_out:
        return final(out), None
    return final(out[0]), final(out[1])


def fft2(xr, xi, inverse=False, real_out=False, interpret=False,
         mul=None):
    """2-D transform over the LAST TWO axes of a pair (leading dims
    are batch), as TWO fused-transpose axis-first passes:
    F2 = T . Fc . T . Fc (T folded into each kernel's output write),
    so the slow axis-last kernel is never used.  Forward: natural in
    -> both axes permuted.  Inverse: permuted in -> natural out,
    1/(n0*n1) normalized; ``real_out`` drops the imaginary plane of
    the final pass.  Requires ``fft2_applies`` on the two sizes.

    ``mul=(mr, mi)`` folds a pointwise complex product by the given
    pair into the first pass — the conv-product fusion (no separate
    HBM round trip for the spectrum multiply)."""
    lead = xr.shape[:-2]
    n0, n1 = (int(s) for s in xr.shape[-2:])
    L = int(np.prod(lead)) if lead else 1
    r = xr.reshape(L, n0, n1)
    i = None if xi is None else xi.reshape(L, n0, n1)
    mul3 = None
    if mul is not None:
        mul3 = tuple(
            jnp.broadcast_to(m, lead + (n0, n1)).reshape(L, n0, n1)
            for m in mul
        )
    r, i = _fft_first(r, i, n0, inverse, False, interpret,
                      transpose_out=True, mul_pair=mul3)
    # inverse 1/(n0*n1) normalization rides the second pass's twiddle
    # stage for free instead of a trailing full-plane XLA multiply
    # (~0.2 ms on a 4224^2 spectrum on v5e)
    r, i = _fft_first(r, i, n1, inverse, real_out, interpret,
                      transpose_out=True,
                      scale=1.0 / (n0 * n1) if inverse else 1.0)
    r = r.reshape(lead + (n0, n1))
    i = None if i is None else i.reshape(lead + (n0, n1))
    return r, i


def fft_axis(xr, xi, axis, inverse=False, real_out=False, interpret=False,
             mul=None):
    """Permuted-order transform along ``axis`` of an (r, i) pair.

    Forward: natural in -> permuted out.  Inverse: permuted in ->
    natural out with 1/n normalization.  ``xi=None`` marks real input,
    ``real_out=True`` drops the imaginary output plane.  Requires
    ``can_handle(shape[axis])`` and n > _MAX_A (two-stage split);
    single-stage sizes should use permfft's einsum path.

    ``mul=(mr, mi)`` folds a pointwise complex product by the given
    (broadcastable) pair into the pass.
    """
    ax = axis % xr.ndim
    n = int(xr.shape[ax])
    # inverse 1/n normalization folds into the kernel's twiddle stage
    scale = 1.0 / n if inverse else 1.0
    if mul is not None:
        mul = tuple(jnp.broadcast_to(m, xr.shape) for m in mul)

    if ax == xr.ndim - 1:
        rr, ri = _fft_last(xr, xi, n, inverse, real_out, interpret,
                           mul_pair=mul, scale=scale)
    else:
        lead = xr.shape[:ax]
        L = int(np.prod(lead)) if lead else 1
        C = int(np.prod(xr.shape[ax + 1 :]))
        rr, ri = _fft_first(
            xr.reshape(L, n, C),
            None if xi is None else xi.reshape(L, n, C),
            n,
            inverse,
            real_out,
            interpret,
            mul_pair=None if mul is None else tuple(
                m.reshape(L, n, C) for m in mul
            ),
            scale=scale,
        )
        rr = rr.reshape(xr.shape)
        ri = None if ri is None else ri.reshape(xr.shape)
    return rr, ri
