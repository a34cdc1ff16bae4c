"""scipy.signal core ops on TPU-native JAX engines.

API parity with reference cupyimg/scipy/signal/signaltools.py (SURVEY.md
C14): convolve/correlate with auto method dispatch, fftconvolve/oaconvolve
(XLA FFT replaces cuFFT plans — SURVEY.md N12), convolve2d/correlate2d with
fill/wrap/symm boundaries, wiener, hilbert(2), resample (FFT method) and
resample_poly (all SciPy-1.4 padtype modes) on the first-party polyphase
upfirdn.  Filter *design* (firwin/get_window) runs on the host via scipy,
exactly as the reference does (its signaltools.py:16-17, 2020).
"""

from __future__ import annotations

import functools
import math
import timeit

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cupyimg_tpu.core.complexutil import make_complex
from cupyimg_tpu.core import util
from cupyimg_tpu.scipy.signal._upfirdn import (
    upfirdn,
    upfirdn_out_len,
    upfirdn_modes,
)

__all__ = [
    "choose_conv_method",
    "convolve",
    "correlate",
    "convolve2d",
    "correlate2d",
    "fftconvolve",
    "oaconvolve",
    "wiener",
    "hilbert",
    "hilbert2",
    "resample",
    "resample_poly",
    "next_fast_len",
]


def next_fast_len(target: int) -> int:
    """Smallest FFT-friendly size >= target.

    On TPU the FFT runs 5-8x faster at lane-aligned (multiple-of-64)
    sizes than at scipy's 5-smooth sizes (e.g. 4200 takes 55 ms where
    4224 takes 8.5 ms for an rfft2/irfft2 round trip on a 4096^2 image),
    so the TPU backend rounds up to a multiple of 64 instead.  Other
    backends keep the classic smallest-5-smooth rule."""
    target = int(target)
    if target <= 6:
        return max(target, 1)
    if not (target & (target - 1)):  # power of 2
        return target
    import jax as _jax

    if _jax.default_backend() == "tpu" and target > 64:
        if target > 256:
            # multiples of 128 keep the fused Pallas FFT's fast factor
            # at the full MXU lane width (ops/pallas_fft)
            return -(-target // 128) * 128
        return -(-target // 64) * 64
    best = 1 << (target - 1).bit_length()
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            quotient = -(-target // p35)
            p2 = 1 << (int(quotient) - 1).bit_length() if quotient > 1 else 1
            n = p2 * p35
            if n == target:
                return n
            if n < best:
                best = n
            p35 *= 3
        p5 *= 5
    return best


def _reverse_and_conj(x):
    return jnp.flip(x).conj()


def _inputs_swap_needed(mode, shape1, shape2, axes=None):
    if mode != "valid":
        return False
    if axes is None:
        axes = range(len(shape1))
    ok1 = all(shape1[i] >= shape2[i] for i in axes)
    ok2 = all(shape2[i] >= shape1[i] for i in axes)
    if not (ok1 or ok2):
        raise ValueError(
            "For 'valid' mode, one must be at least "
            "as large as the other in every dimension"
        )
    return not ok1


def _centered(arr, newshape):
    newshape = np.asarray(newshape)
    currshape = np.array(arr.shape)
    startind = (currshape - newshape) // 2
    endind = startind + newshape
    return arr[tuple(slice(s, e) for s, e in zip(startind, endind))]


def _apply_conv_mode(ret, s1, s2, mode, axes):
    if mode == "full":
        return ret
    if mode == "same":
        return _centered(ret, s1)
    if mode == "valid":
        shape_valid = [
            ret.shape[a] if a not in axes else s1[a] - s2[a] + 1
            for a in range(ret.ndim)
        ]
        return _centered(ret, shape_valid)
    raise ValueError("acceptable mode flags are 'valid', 'same', or 'full'")


def _init_freq_conv_axes(in1, in2, mode, axes, sorted_axes=False):
    s1, s2 = in1.shape, in2.shape
    noaxes = axes is None
    if noaxes:
        axes = list(range(in1.ndim))
    else:
        axes = [util.check_axis(a, in1.ndim) for a in np.atleast_1d(axes)]
        if not len(axes):
            raise ValueError("when provided, axes cannot be empty")
    axes = [a for a in axes if s1[a] != 1 or s2[a] != 1]
    if sorted_axes:
        axes.sort()
    for a in range(in1.ndim):
        if a not in axes and s1[a] != s2[a] and s1[a] != 1 and s2[a] != 1:
            raise ValueError(
                f"incompatible shapes for in1 and in2: {s1} and {s2}"
            )
    if _inputs_swap_needed(mode, s1, s2, axes=axes):
        in1, in2 = in2, in1
    return in1, in2, axes


# Below this many transform points XLA's FFT wins on compile+dispatch;
# module-level so tests can lower it to exercise the Pallas path small.
_PALLAS_FFT_MIN_POINTS = 1 << 20


def _pallas_fft2_applies(in1, in2, axes, fshape):
    """Route a real 2-D FFT product through the fused-transpose Pallas
    pipeline (ops/pallas_fft.fft2)?  Requires a full 2-D transform of
    2-D operands at two-stage MXU-friendly sizes."""
    from cupyimg_tpu.core.config import config
    from cupyimg_tpu.ops import pallas_fft

    if not config.pallas_fft_enabled():
        return False
    nd = in1.ndim
    if nd < 2 or sorted(int(a) for a in axes) != [nd - 2, nd - 1]:
        return False  # needs a transform over exactly the last two axes
    if np.dtype(in1.dtype).itemsize > 4 or np.dtype(in2.dtype).itemsize > 4:
        return False  # f64 parity path stays on the reference FFT
    total = int(np.prod(in1.shape[: nd - 2], dtype=np.int64)) * int(
        fshape[0]
    ) * int(fshape[1])
    if total < _PALLAS_FFT_MIN_POINTS:
        return False  # XLA's FFT is fine below ~1M points
    return pallas_fft.fft2_applies(int(fshape[0]), int(fshape[1]))


# A second operand whose extent along every transformed axis is at most
# this is transformed by direct DFT matmuls against (tiny) constant
# permuted-order DFT matrices instead of a full fused FFT pass: the
# contraction length m is far below the FFT's effective a+b (~161 at
# n=4224), the 2nd operand never gets padded/materialized at full size,
# the 1st operand's forward transform stays real-input, and the product
# is a plain pointwise complex multiply (no neg_bins flip/roll, which
# measures ~5 ms on a 4224^2 spectrum on v5e — the old pipeline's
# single biggest cost).
_SMALL_DFT_MAX = 128


@functools.lru_cache(maxsize=None)
def _perm_dft_consts(n, m):
    """(Er, Ei) float32 (n, m): E[i, t] = exp(-2j pi p[i] t / n) with p
    the fused FFT's permuted bin order (permfft.perm_indices) — i.e. a
    DFT matrix restricted to the first m inputs, rows pre-permuted so a
    plain matmul lands the spectrum in the same order pallas_fft emits."""
    from cupyimg_tpu.ops import permfft

    p = permfft.perm_indices(int(n)).astype(np.float64)
    t = np.arange(int(m), dtype=np.float64)
    ang = (-2.0 * np.pi / float(n)) * (p[:, None] * t[None, :])
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _jitted_pallas_conv(kind, fshape, interpret, small2=None):
    """One cached jitted callable per (1d/2d, padded-size) signature.

    Dispatching the whole pad->fft->product->ifft pipeline as a single
    executable matters on remote-attached TPUs: eagerly it is ~20 op
    dispatches plus per-call constant uploads (the FFT weight
    matrices), each paying the host<->device round trip; jitted the
    constants live in the executable and a warm call is one dispatch.

    The spectrum product is FUSED into the inverse transform's first
    Pallas pass (``mul=``) — no separate HBM round trip.  Equal-size
    operands run two real-input forwards rather than the classic
    two-for-one complex packing: the packed unpack needs F[-k], a
    neg_bins flip/roll that measures ~5 ms on a 4224^2 spectrum on
    v5e — far more than the ~1.3 ms forward pass it saves.

    ``small2`` (static extents of the 2nd operand along the transformed
    axes) switches to the direct-DFT small-kernel path: see
    _SMALL_DFT_MAX above.
    """
    from cupyimg_tpu.ops import pallas_fft

    _hp = jax.lax.Precision.HIGHEST

    def pad_to(v, axes):
        pads = [(0, 0)] * v.ndim
        for a, n in zip(axes, fshape):
            pads[a] = (0, int(n) - v.shape[a])
        v = v.astype(np.float32)
        return jnp.pad(v, pads) if any(hi for _, hi in pads) else v

    if kind == "fft2":
        def run(a, b):
            axes = (a.ndim - 2, a.ndim - 1)
            if small2 is not None:
                n0, n1 = int(fshape[0]), int(fshape[1])
                E0r, E0i = _perm_dft_consts(n0, small2[0])
                E1r, E1i = _perm_dft_consts(n1, small2[1])
                bb = b.astype(np.float32)
                t0r = jnp.einsum("it,...tu->...iu", E0r, bb,
                                 precision=_hp)
                t0i = jnp.einsum("it,...tu->...iu", E0i, bb,
                                 precision=_hp)
                kr = (jnp.einsum("...iu,ju->...ij", t0r, E1r,
                                 precision=_hp)
                      - jnp.einsum("...iu,ju->...ij", t0i, E1i,
                                   precision=_hp))
                ki = (jnp.einsum("...iu,ju->...ij", t0r, E1i,
                                 precision=_hp)
                      + jnp.einsum("...iu,ju->...ij", t0i, E1r,
                                   precision=_hp))
                fr, fi = pallas_fft.fft2(pad_to(a, axes), None,
                                         interpret=interpret)
                out, _ = pallas_fft.fft2(fr, fi, inverse=True,
                                         real_out=True,
                                         interpret=interpret,
                                         mul=(kr, ki))
                return out
            # two real-input forward transforms + product fused into
            # the inverse's first pass.  (Packing both operands into
            # one complex transform saves a forward pass but its
            # unpack needs F[-k] — a neg_bins flip/roll that measures
            # ~5 ms on a 4224^2 spectrum on v5e, far more than the
            # ~1.3 ms forward it saves.)
            ap, bp = pad_to(a, axes), pad_to(b, axes)
            r1, i1 = pallas_fft.fft2(ap, None, interpret=interpret)
            r2, i2 = pallas_fft.fft2(bp, None, interpret=interpret)
            if r1.shape != r2.shape:  # leading-dim broadcast
                common = np.broadcast_shapes(r1.shape, r2.shape)
                r1 = jnp.broadcast_to(r1, common)
                i1 = jnp.broadcast_to(i1, common)
                r2 = jnp.broadcast_to(r2, common)
                i2 = jnp.broadcast_to(i2, common)
            out, _ = pallas_fft.fft2(
                r1, i1, inverse=True, real_out=True,
                interpret=interpret, mul=(r2, i2)
            )
            return out
    else:
        def run(a, b):
            if small2 is not None:
                n = int(fshape[0])
                Er, Ei = _perm_dft_consts(n, small2[0])
                bb = b.astype(np.float32)
                kr = jnp.einsum("...t,jt->...j", bb, Er, precision=_hp)
                ki = jnp.einsum("...t,jt->...j", bb, Ei, precision=_hp)
                fr, fi = pallas_fft.fft_axis(
                    pad_to(a, (a.ndim - 1,)), None, -1,
                    interpret=interpret)
                out, _ = pallas_fft.fft_axis(
                    fr, fi, -1, inverse=True, real_out=True,
                    interpret=interpret, mul=(kr, ki))
                return out
            # two real forwards + product fused into the inverse (see
            # the fft2 branch for why packing loses to neg_bins cost)
            ap = pad_to(a, (a.ndim - 1,))
            bp = pad_to(b, (b.ndim - 1,))
            r1, i1 = pallas_fft.fft_axis(ap, None, -1,
                                         interpret=interpret)
            r2, i2 = pallas_fft.fft_axis(bp, None, -1,
                                         interpret=interpret)
            if r1.shape != r2.shape:  # leading-dim broadcast
                common = np.broadcast_shapes(r1.shape, r2.shape)
                r1 = jnp.broadcast_to(r1, common)
                i1 = jnp.broadcast_to(i1, common)
                r2 = jnp.broadcast_to(r2, common)
                i2 = jnp.broadcast_to(i2, common)
            out, _ = pallas_fft.fft_axis(
                r1, i1, -1, inverse=True, real_out=True,
                interpret=interpret, mul=(r2, i2),
            )
            return out

    return jax.jit(run)


def _pallas_fft2_real_conv(in1, in2, axes, fshape):
    """Real 2-D convolution via the fused Pallas FFT: two
    fused-transpose forward passes per operand (direct DFT matmuls for
    a small second operand), pointwise complex product in (fixed)
    permuted bin order, real-output inverse."""
    interpret = jax.default_backend() != "tpu"
    m = tuple(int(s) for s in in2.shape[-2:])
    small2 = m if max(m) <= _SMALL_DFT_MAX and (
        m[0] < fshape[0] or m[1] < fshape[1]) else None
    fn = _jitted_pallas_conv(
        "fft2", tuple(int(n) for n in fshape), interpret, small2
    )
    return fn(in1, in2)


def _pallas_fft1_applies(in1, in2, axes, fshape):
    """Route a real last-axis FFT product through the Pallas axis-last
    kernel?  Covers 1-D fftconvolve and the batched blocks of 1-D
    overlap-add; leading dims are batch/broadcast."""
    from cupyimg_tpu.core.config import config
    from cupyimg_tpu.ops import pallas_fft, permfft

    if not config.pallas_fft_enabled():
        return False
    nd = in1.ndim
    if [int(a) for a in axes] != [nd - 1]:
        return False
    if np.dtype(in1.dtype).itemsize > 4 or np.dtype(in2.dtype).itemsize > 4:
        return False
    n = int(fshape[0])
    total = max(
        int(np.prod(in1.shape[: nd - 1], dtype=np.int64)),
        int(np.prod(in2.shape[: nd - 1], dtype=np.int64)),
    ) * n
    if total < _PALLAS_FFT_MIN_POINTS:
        return False
    return n > permfft._MAX_A and pallas_fft.can_handle(n)


def _pallas_fft1_real_conv(in1, in2, axes, fshape):
    """Real last-axis convolution via the Pallas axis-last FFT kernel:
    pointwise complex product in (fixed) permuted bin order; a short
    second operand is transformed by one direct DFT matmul instead."""
    interpret = jax.default_backend() != "tpu"
    m = int(in2.shape[-1])
    small2 = (m,) if m <= _SMALL_DFT_MAX and m < int(fshape[0]) else None
    fn = _jitted_pallas_conv("fft1", (int(fshape[0]),), interpret, small2)
    return fn(in1, in2)


def _mxfft_applies(in1, in2, fshape):
    """Route the real FFT product through the MXU matmul FFT?"""
    from cupyimg_tpu.core.config import config
    from cupyimg_tpu.ops import mxfft

    if not config.mxfft_enabled():
        return False
    if np.dtype(in1.dtype).itemsize > 4 or np.dtype(in2.dtype).itemsize > 4:
        return False  # f64 parity path stays on the reference FFT
    return all(mxfft.can_handle(int(n)) for n in fshape)


def _mxfft_real_conv(in1, in2, axes, fshape):
    """Real convolution via matmul FFTs on (real, imag) pairs
    (ops/mxfft): Hermitian-truncated forward transforms (the rfftn
    analog — the first transformed axis keeps only n//2+1 bins, so
    every later stage runs at half width), complex product, inverse."""
    from cupyimg_tpu.ops import mxfft

    def pad_to(v):
        pads = [(0, 0)] * v.ndim
        for a, n in zip(axes, fshape):
            pads[a] = (0, n - v.shape[a])
        v = v.astype(np.float32)
        return jnp.pad(v, pads) if any(hi for _, hi in pads) else v

    r1, i1 = mxfft.rfftn_pair(pad_to(in1), tuple(axes))
    r2, i2 = mxfft.rfftn_pair(pad_to(in2), tuple(axes))
    pr = r1 * r2 - i1 * i2
    pi = r1 * i2 + i1 * r2
    return mxfft.irfftn_pair(pr, pi, tuple(axes), int(fshape[0]))


def _freq_domain_conv(in1, in2, axes, shape, calc_fast_len=False):
    """Multiply FFTs along ``axes`` (reference signaltools.py:437-504)."""
    if not len(axes):
        return in1 * in2
    complex_result = (
        np.dtype(in1.dtype).kind == "c" or np.dtype(in2.dtype).kind == "c"
    )
    # scipy.fft transform dtype semantics: integer/bool operands are
    # promoted to float64 (full-precision spectra; x64-off truncates to
    # f32, a platform cap), float16 computes in — and returns — float32
    if not complex_result:
        if np.dtype(in1.dtype) == np.float16:
            in1 = in1.astype(jnp.float32)
        if np.dtype(in2.dtype) == np.float16:
            in2 = in2.astype(jnp.float32)
        if np.dtype(in1.dtype).kind in "iub":
            in1 = in1.astype(jnp.float64)
        if np.dtype(in2.dtype).kind in "iub":
            in2 = in2.astype(jnp.float64)
    if calc_fast_len:
        fshape = [next_fast_len(shape[a]) for a in axes]
    else:
        fshape = [shape[a] for a in axes]
    if not complex_result and _pallas_fft2_applies(in1, in2, axes, fshape):
        ret = _pallas_fft2_real_conv(in1, in2, axes, fshape)
    elif not complex_result and _pallas_fft1_applies(in1, in2, axes, fshape):
        ret = _pallas_fft1_real_conv(in1, in2, axes, fshape)
    elif not complex_result and _mxfft_applies(in1, in2, fshape):
        ret = _mxfft_real_conv(in1, in2, axes, fshape)
    elif not complex_result:
        sp1 = jnp.fft.rfftn(in1, fshape, axes=axes)
        sp2 = jnp.fft.rfftn(in2, fshape, axes=axes)
        ret = jnp.fft.irfftn(sp1 * sp2, fshape, axes=axes)
    else:
        sp1 = jnp.fft.fftn(in1, fshape, axes=axes)
        sp2 = jnp.fft.fftn(in2, fshape, axes=axes)
        ret = jnp.fft.ifftn(sp1 * sp2, axes=axes)
    sl = [slice(None)] * ret.ndim
    for a in axes:
        sl[a] = slice(0, shape[a])
    return ret[tuple(sl)]


def fftconvolve(in1, in2, mode="full", axes=None):
    """FFT convolution (scipy parity; reference signaltools.py:546-663)."""
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if in1.ndim == in2.ndim == 0:
        return in1 * in2
    if in1.ndim != in2.ndim:
        raise ValueError("in1 and in2 should have the same dimensionality")
    if in1.size == 0 or in2.size == 0:
        return jnp.array([], dtype=np.promote_types(in1.dtype, in2.dtype))
    in1, in2, axes = _init_freq_conv_axes(in1, in2, mode, axes)
    s1, s2 = in1.shape, in2.shape
    shape = [
        max(s1[i], s2[i]) if i not in axes else s1[i] + s2[i] - 1
        for i in range(in1.ndim)
    ]
    ret = _freq_domain_conv(in1, in2, axes, shape, calc_fast_len=True)
    return _apply_conv_mode(ret, s1, s2, mode, axes)


def oaconvolve(in1, in2, mode="full", axes=None):
    """Overlap-add convolution (scipy parity; reference
    signaltools.py:664-985).

    TPU-native design: the most beneficial axis is blocked (block length
    from the Lambert-W FLOP optimum, as in scipy), the long input is
    reshaped into (blocks, step), all blocks FFT-convolve against the short
    input in ONE batched frequency-domain product, and the overlapping
    tails fold back with a vectorized shift-add (no host loop).  Axes whose
    lengths don't benefit fall through to plain fftconvolve.
    """
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if in1.ndim == in2.ndim == 0:
        return in1 * in2
    if in1.ndim != in2.ndim:
        raise ValueError("in1 and in2 should have the same dimensionality")
    if in1.size == 0 or in2.size == 0:
        return jnp.array([], dtype=np.promote_types(in1.dtype, in2.dtype))
    if in1.shape == in2.shape:
        return fftconvolve(in1, in2, mode=mode, axes=axes)
    in1, in2, axes = _init_freq_conv_axes(in1, in2, mode, axes,
                                          sorted_axes=True)
    s1, s2 = in1.shape, in2.shape

    # pick the axis where overlap-add pays off the most.  On TPU a single
    # big FFT beats blocking until the axis is genuinely long (measured:
    # 4096^2 k31 runs 67 ms blocked vs 25 ms whole; a 4M-point 1-D conv
    # runs 18 ms blocked vs 399 ms whole) — XLA's FFT falls off a cliff
    # only for very long transforms, while the blocked form pays batched
    # small-FFT and fold overheads.
    min_long = 32768 if jax.default_backend() == "tpu" else 0
    best_axis, best_ratio = None, 4.0  # require >= 4x to block
    for a in axes:
        lo, hi = sorted((s1[a], s2[a]))
        if lo > 1 and hi / lo > best_ratio and hi >= min_long:
            best_axis, best_ratio = a, hi / lo
    if best_axis is None:
        return fftconvolve(in1, in2, mode=mode, axes=axes)
    a = best_axis

    swapped = s2[a] > s1[a]
    x_long, x_short = (in2, in1) if swapped else (in1, in2)
    L = x_short.shape[a]
    n_long = x_long.shape[a]
    # optimal block length (scipy's Lambert-W derivation)
    from scipy.special import lambertw

    overlap = L - 1
    opt = -overlap * np.real(lambertw(-1 / (2 * math.e * overlap), k=-1)) / 2
    block = next_fast_len(int(math.ceil(opt)))
    block = max(block, 2 * L - 1)
    step = block - L + 1

    nblocks = -(-n_long // step)
    pads = [(0, 0)] * x_long.ndim
    pads[a] = (0, nblocks * step - n_long)
    xp = jnp.pad(x_long, pads)
    # reshape axis a -> (nblocks, step)
    new_shape = xp.shape[:a] + (nblocks, step) + xp.shape[a + 1:]
    xb = xp.reshape(new_shape)
    short_b = jnp.expand_dims(x_short, axis=a)  # broadcast over blocks

    conv_axes = [ax + 1 if ax > a else ax for ax in axes]
    conv_axes[conv_axes.index(a if a in conv_axes else a)] = a + 1
    # full conv length per axis (block axis uses `block`)
    shape_arg = [0] * xb.ndim
    for ax in range(xb.ndim):
        shape_arg[ax] = max(xb.shape[ax], short_b.shape[ax])
    for ax in axes:
        axm = ax + 1 if ax > a else ax
        if ax == a:
            shape_arg[a + 1] = block
        else:
            shape_arg[axm] = xb.shape[axm] + short_b.shape[axm] - 1
    ret = _freq_domain_conv(
        xb, short_b, [ax + 1 if ax > a else (a + 1 if ax == a else ax)
                      for ax in axes],
        shape_arg, calc_fast_len=False,
    )

    # vectorized overlap-add along (nblocks, block) -> nblocks*step + L - 1
    main = lax.slice_in_dim(ret, 0, step, axis=a + 1)
    tail = lax.slice_in_dim(ret, step, block, axis=a + 1)  # len L-1 <= step
    tail_pad = [(0, 0)] * ret.ndim
    tail_pad[a + 1] = (0, step - (L - 1))
    tail = jnp.pad(tail, tail_pad)
    # flatten blocks
    flat_shape = ret.shape[:a] + (nblocks * step,) + ret.shape[a + 2:]
    main_flat = main.reshape(flat_shape)
    tail_flat = tail.reshape(flat_shape)
    # main contributes at offset 0; tails at offset +step (one block later)
    zpad = [(0, 0)] * main_flat.ndim
    zpad[a] = (0, step)
    main_ext = jnp.pad(main_flat, zpad)
    zpad[a] = (step, 0)
    tail_ext = jnp.pad(tail_flat, zpad)
    full = main_ext + tail_ext
    out_len = n_long + L - 1
    full = lax.slice_in_dim(full, 0, out_len, axis=a)
    return _apply_conv_mode(full, s1, s2, mode, axes)


# ---------------------------------------------------------------------------
# direct + auto-dispatch convolve/correlate
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_shape",))
def _shift_add_corr_jit(xp, w, out_shape):
    """VALID correlation as unrolled shift-multiply-adds, fused by XLA
    into one pass (tap count/positions are static from ``w``'s shape)."""
    import itertools

    out = None
    for idx in itertools.product(*(range(s) for s in w.shape)):
        sl = tuple(slice(i, i + n) for i, n in zip(idx, out_shape))
        term = w[idx] * xp[sl]
        out = term if out is None else out + term
    return out


def _direct_corr_real(xp, w, out_shape):
    """VALID real correlation of a pre-padded array.

    TPU routes to the fused Pallas dense stencil (ops/pallas_stencil);
    elsewhere small kernels unroll as shift-multiply-adds (XLA fuses
    them into one pass) and large rank <= 3 kernels use the XLA conv op
    — but never on TPU, where channelless ``conv_general_dilated``
    lowers catastrophically (and 31x31 crashed the runtime)."""
    ndim = xp.ndim
    from cupyimg_tpu.ops import pallas_stencil as _ps

    if not isinstance(w, (np.ndarray, jax.core.Tracer)):
        w_np = np.asarray(w)
    else:
        w_np = w
    if isinstance(w_np, np.ndarray) and _ps.supports_dense(xp, w_np):
        # VALID correlation == mode-agnostic interior of the centered
        # correlate: out_valid[i] = sum_k w[k] xp[i+k]
        full = _ps.fused_dense_correlate(
            xp, np.asarray(w_np, np.float64),
            [0] * ndim, "constant", 0.0,
        )
        sl = tuple(
            slice(s // 2, s // 2 + n)
            for s, n in zip(w_np.shape, out_shape)
        )
        return full[sl]
    if (
        ndim > 3
        or int(np.prod(w.shape)) <= 64
        or jax.default_backend() == "tpu"
    ):
        # jitted: eagerly each tap term is its own device dispatch,
        # which on a remote-attached TPU costs ~ms of relay round trip
        # per tap (a 257-tap 1-D direct convolve measured 1.8 s eager
        # vs 2.5 ms as one fused executable)
        return _shift_add_corr_jit(xp, jnp.asarray(w), tuple(out_shape))
    dn_str = "DHW"[3 - ndim:]
    dn = lax.conv_dimension_numbers(
        (1, 1) + xp.shape,
        (1, 1) + w.shape,
        ("NC" + dn_str, "OI" + dn_str, "NC" + dn_str),
    )
    out = lax.conv_general_dilated(
        xp[None, None],
        w[None, None],
        window_strides=(1,) * ndim,
        padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=xp.dtype,
        precision=lax.Precision.HIGHEST,
    )
    return out[0, 0]


def _direct_correlate_nd(in1, w, mode):
    """Direct nd correlation ``out[i] = sum_k w[k] in1[i+k]`` with zero
    extension; modes full/same/valid.  ``w`` used as given (callers
    conjugate/flip)."""
    s1, s2 = in1.shape, w.shape
    dtype = np.promote_types(in1.dtype, w.dtype)
    is_int = np.dtype(dtype).kind in "iub"
    acc_dtype = np.dtype(np.float64 if is_int else dtype)
    if acc_dtype.kind == "f":
        acc_dtype = np.promote_types(acc_dtype, np.float32)
    if mode in ("full", "same"):
        pads = [(k - 1, k - 1) for k in s2]
    elif mode == "valid":
        pads = [(0, 0)] * in1.ndim
    else:
        raise ValueError("acceptable mode flags are 'valid', 'same', or "
                         "'full'")
    xp = jnp.pad(in1.astype(acc_dtype), pads)
    out_shape = tuple(xp.shape[i] - s2[i] + 1 for i in range(in1.ndim))
    if acc_dtype.kind == "c":
        wr = w.real.astype(acc_dtype.char.lower())
        wi = w.imag.astype(acc_dtype.char.lower())
        rr = _direct_corr_real(xp.real, wr, out_shape)
        ii = _direct_corr_real(xp.imag, wi, out_shape)
        ri = _direct_corr_real(xp.real, wi, out_shape)
        ir = _direct_corr_real(xp.imag, wr, out_shape)
        out = make_complex(rr - ii, ir + ri)
    else:
        out = _direct_corr_real(xp, w.astype(acc_dtype), out_shape)
    if mode == "same":
        out = _centered(out, s1)
    if is_int:
        out = jnp.rint(out)
    return out.astype(dtype)


def choose_conv_method(in1, in2, mode="full", measure=False):
    """Pick 'direct' or 'fft' (scipy parity; reference
    signaltools.py:1007-1299).  ``measure=True`` times both on-device."""
    volume = jnp.asarray(in1)
    kernel = jnp.asarray(in2)
    if measure:
        # scipy returns (method, times-dict) when measuring
        times = {}
        for method in ("fft", "direct"):
            def run(m=method):
                r = convolve(volume, kernel, mode=mode, method=m)
                r.block_until_ready()

            times[method] = timeit.timeit(run, number=3)
        chosen = "fft" if times["fft"] < times["direct"] else "direct"
        return chosen, times
    if volume.dtype.kind in "iu" and kernel.dtype.kind in "iu":
        # fft result must round-trip exactly through float64
        max_value = float(jnp.max(jnp.abs(volume))) * float(
            jnp.max(jnp.abs(kernel))
        ) * min(volume.size, kernel.size)
        if max_value > 2 ** np.finfo(np.float64).nmant - 1:
            return "direct"
    if volume.dtype == np.bool_ or kernel.dtype == np.bool_:
        return "direct"
    s1, s2 = volume.shape, kernel.shape
    if mode == "full":
        out_shape = [a + b - 1 for a, b in zip(s1, s2)]
    elif mode == "valid":
        out_shape = [abs(a - b) + 1 for a, b in zip(s1, s2)]
    else:
        out_shape = list(s1)
    direct_ops = float(min(np.prod(s1), np.prod(s2))) * float(
        np.prod(out_shape)
    )
    full_out = [a + b - 1 for a, b in zip(s1, s2)]
    N = float(np.prod(full_out))
    fft_ops = 3.0 * N * np.log(max(N, 2.0))
    if jax.default_backend() == "tpu":
        # measured v5e crossover: the Pallas dense engine runs at
        # ~2.5 ps/tap/point while XLA's TPU FFT path costs
        # ~40 ps * N * log2(N) per transform set — direct stays ahead
        # until a few hundred taps on image-sized inputs
        n_taps = float(min(np.prod(s1), np.prod(s2)))
        if volume.ndim >= 2:
            t_direct = 2.5e-12 * direct_ops
        else:
            # 1-D direct is the jitted shift-add chain: every tap is an
            # unaligned lane slice (a full-array lane rotation),
            # measured ~25 ps/tap/point (4M x 257: 26 ms) — an order of
            # magnitude above the 2-D engine's per-tap cost
            t_direct = 2.5e-11 * direct_ops
        t_fft = 4.0e-11 * N * np.log2(max(N, 2.0))
        return "fft" if (
            t_direct > t_fft
            or n_taps > 1300  # dense-engine unroll cap
        ) else "direct"
    constant = 10963.92 if volume.ndim == 1 else 8899.11
    return "fft" if direct_ops > constant / 1e4 * fft_ops * 1e4 / 1e4 and \
        direct_ops > 1e4 and direct_ops > fft_ops * 2.5 else "direct"


def convolve(in1, in2, mode="full", method="auto"):
    """N-d convolution (scipy parity; reference signaltools.py:218-360)."""
    volume = jnp.asarray(in1)
    kernel = jnp.asarray(in2)
    if volume.ndim == kernel.ndim == 0:
        return volume * kernel
    if volume.ndim != kernel.ndim:
        raise ValueError("volume and kernel should have the same "
                         "dimensionality")
    if _inputs_swap_needed(mode, volume.shape, kernel.shape):
        volume, kernel = kernel, volume
    if method == "auto":
        method = choose_conv_method(volume, kernel, mode=mode)
    if method == "fft":
        if volume.ndim == 1 and jax.default_backend() == "tpu":
            # long 1-D transforms are the XLA TPU FFT's worst case
            # (4M-point fftconvolve measures 351 ms vs 2.2 ms through
            # blocked overlap-add); oaconvolve computes the identical
            # convolution and falls back to fftconvolve itself when
            # block splitting cannot win
            out = oaconvolve(volume, kernel, mode=mode)
        else:
            out = fftconvolve(volume, kernel, mode=mode)
        result_type = np.promote_types(volume.dtype, kernel.dtype)
        if np.dtype(result_type).kind in "iub":
            out = jnp.rint(out)
        return out.astype(result_type)
    elif method == "direct":
        # convolution = correlation with the flipped kernel (no conj);
        # flip concretely when possible so the Pallas dense engine
        # (which needs numpy weights for static tap skipping) applies
        if isinstance(kernel, jax.core.Tracer):
            w = jnp.flip(kernel)
        else:
            w = np.flip(np.asarray(kernel))
        return _direct_correlate_nd(volume, w, mode)
    raise ValueError("Acceptable method flags are 'auto', 'direct', or "
                     "'fft'.")


def correlate(in1, in2, mode="full", method="auto"):
    """N-d correlation (scipy parity; reference signaltools.py:1301-1424)."""
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if in1.ndim == in2.ndim == 0:
        return in1 * in2.conj()
    if in1.ndim != in2.ndim:
        raise ValueError("in1 and in2 should have the same dimensionality")
    if method == "fft" or (
        method == "auto" and choose_conv_method(in1, in2, mode=mode) == "fft"
    ):
        return convolve(in1, _reverse_and_conj(in2), mode, "fft")
    if method not in ("auto", "direct"):
        raise ValueError("Acceptable method flags are 'auto', 'direct', or "
                         "'fft'.")
    swapped = _inputs_swap_needed(mode, in1.shape, in2.shape)
    if swapped:
        in1, in2 = in2, in1
    if isinstance(in2, jax.core.Tracer):
        w = in2.conj()
    else:
        w = np.conj(np.asarray(in2))  # concrete: Pallas engine applies
    out = _direct_correlate_nd(in1, w, mode)
    if swapped:
        out = _reverse_and_conj(out)
    return out


def _boundary_pad_2d(in1, s2, boundary, fillvalue):
    pads = [(k - 1, k - 1) for k in s2]
    if boundary == "fill":
        return jnp.pad(in1, pads, constant_values=fillvalue)
    if boundary == "wrap":
        return jnp.pad(in1, pads, mode="wrap")
    if boundary == "symm":
        return jnp.pad(in1, pads, mode="symmetric")
    raise ValueError(
        f"Acceptable boundary flags are 'fill', 'circular' (or 'wrap'), and "
        f"'symmetric' (or 'symm'); got {boundary}"
    )


def _conv2d_common(in1, in2, mode, boundary, fillvalue, convolution):
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if in1.ndim != 2 or in2.ndim != 2:
        raise ValueError("convolve2d inputs must both be 2-D arrays")
    boundary = {"circular": "wrap", "symmetric": "symm"}.get(boundary,
                                                             boundary)
    if boundary == "fill":
        # scipy parity (reference signaltools tests:368-402): fillvalue
        # must be a scalar castable to the output dtype without
        # discarding an imaginary part
        fv = np.asarray(fillvalue)
        if fv.size != 1:
            raise ValueError(
                "`fillvalue` must be scalar or an array with one element"
            )
        out_kind = np.promote_types(in1.dtype, in2.dtype).kind
        if fv.dtype.kind == "c" and out_kind != "c" and np.any(fv.imag != 0):
            raise ValueError(
                "could not cast `fillvalue` directly to the output dtype"
            )
    swapped = _inputs_swap_needed(mode, in1.shape, in2.shape)
    if swapped:
        in1, in2 = in2, in1
    w = jnp.flip(in2) if convolution else in2.conj()
    s1, s2 = in1.shape, w.shape
    dtype = np.promote_types(in1.dtype, in2.dtype)
    is_int = np.dtype(dtype).kind in "iub"
    acc_dtype = np.dtype(np.float64 if is_int else dtype)
    if acc_dtype.kind == "f":
        acc_dtype = np.promote_types(acc_dtype, np.float32)

    xp = _boundary_pad_2d(in1.astype(acc_dtype), s2, boundary, fillvalue)
    out_shape = tuple(xp.shape[i] - s2[i] + 1 for i in range(2))
    if acc_dtype.kind == "c":
        real_t = acc_dtype.char.lower()
        rr = _direct_corr_real(xp.real, w.real.astype(real_t), out_shape)
        ii = _direct_corr_real(xp.imag, w.imag.astype(real_t), out_shape)
        ri = _direct_corr_real(xp.real, w.imag.astype(real_t), out_shape)
        ir = _direct_corr_real(xp.imag, w.real.astype(real_t), out_shape)
        full = make_complex(rr - ii, ir + ri)
    else:
        full = _direct_corr_real(xp, w.astype(acc_dtype), out_shape)
    if mode == "full":
        out = full
    elif mode == "same":
        if convolution:
            out = _centered(full, s1)
        else:
            # scipy's correlate2d centers the window at k//2 (one to the
            # right of convolve2d's (k-1)//2 for even kernels)
            starts = [s2[i] // 2 for i in range(2)]
            out = full[
                starts[0]: starts[0] + s1[0],
                starts[1]: starts[1] + s1[1],
            ]
    elif mode == "valid":
        out = _centered(full, [s1[i] - s2[i] + 1 for i in range(2)])
    else:
        raise ValueError("acceptable mode flags are 'valid', 'same', or "
                         "'full'")
    if not convolution and swapped:
        # correlation is not argument-symmetric: scipy computes with the
        # swapped operands and reverses the result on both axes
        out = out[::-1, ::-1]
    if is_int:
        out = jnp.rint(out)
    return out.astype(dtype)


def convolve2d(in1, in2, mode="full", boundary="fill", fillvalue=0):
    """2-d convolution with boundary handling (scipy parity; reference
    signaltools.py:1478-1575)."""
    return _conv2d_common(in1, in2, mode, boundary, fillvalue, True)


def correlate2d(in1, in2, mode="full", boundary="fill", fillvalue=0):
    """2-d correlation with boundary handling (scipy parity)."""
    return _conv2d_common(in1, in2, mode, boundary, fillvalue, False)


def wiener(im, mysize=None, noise=None):
    """Wiener filter (scipy parity; reference signaltools.py:1425-1477)."""
    im = jnp.asarray(im)
    if np.dtype(im.dtype).kind in "iub":
        im = im.astype(np.float64)
    if mysize is None:
        mysize = [3] * im.ndim
    mysize = util.fix_sequence_arg(mysize, im.ndim, "mysize", int)
    size = float(np.prod(mysize))
    ones = jnp.ones(tuple(mysize), im.real.dtype)
    lMean = correlate(im, ones, "same", method="direct") / size
    lVar = (
        correlate(im * im, ones, "same", method="direct") / size
        - lMean * lMean
    )
    if noise is None:
        noise = jnp.mean(lVar.real)
    res = im - lMean
    res = res * (1.0 - noise / jnp.where(lVar == 0, 1.0, lVar))
    res = res + lMean
    return jnp.where(lVar < noise, lMean, res)


def hilbert(x, N=None, axis=-1):
    """Analytic signal (scipy parity; reference signaltools.py:1668-1760)."""
    x = jnp.asarray(x)
    if np.dtype(x.dtype).kind == "c":
        raise ValueError("x must be real.")
    if N is None:
        N = x.shape[axis]
    if N <= 0:
        raise ValueError("N must be positive.")
    Xf = jnp.fft.fft(x, N, axis=axis)
    h = np.zeros(N)
    if N % 2 == 0:
        h[0] = h[N // 2] = 1
        h[1: N // 2] = 2
    else:
        h[0] = 1
        h[1: (N + 1) // 2] = 2
    if x.ndim > 1:
        ind = [np.newaxis] * x.ndim
        ind[axis] = slice(None)
        h = h[tuple(ind)]
    return jnp.fft.ifft(Xf * jnp.asarray(h), axis=axis)


def hilbert2(x, N=None, *, axes=(-2, -1)):
    """2-d analytic signal (scipy parity: double positive frequencies,
    zero the rest, per axis)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    if x.ndim > 2:
        raise ValueError("x must be 2-D.")
    if np.dtype(x.dtype).kind == "c":
        raise ValueError("x must be real.")
    if len(axes) != 2 or axes[0] == axes[1]:
        raise ValueError("axes must contain 2 distinct axes")
    if N is None:
        N = (x.shape[axes[0]], x.shape[axes[1]])
    elif isinstance(N, int):
        if N <= 0:
            raise ValueError("N must be positive.")
        N = (N, N)
    elif len(N) != 2 or np.any(np.asarray(N) <= 0):
        raise ValueError(
            "When given as a tuple, N must hold exactly two positive "
            "integers"
        )
    Xf = jnp.fft.fft2(x, N, axes=axes)
    mults = []
    for n in N:
        k = (n + 1) // 2
        a = np.zeros(n)
        a[0] = 1.0
        a[1:k] = 2.0
        mults.append(a)
    h = np.multiply.outer(mults[0], mults[1])
    hb = jnp.asarray(h).reshape(
        tuple(
            N[0] if a == axes[0] % Xf.ndim else
            N[1] if a == axes[1] % Xf.ndim else 1
            for a in range(Xf.ndim)
        )
    )
    return jnp.fft.ifft2(Xf * hb, axes=axes)


def resample(x, num, t=None, axis=0, window=None, domain="time"):
    """FFT resampling (scipy parity; reference signaltools.py:1841-2016)."""
    x = jnp.asarray(x)
    Nx = x.shape[axis]
    num = int(num)
    if domain not in ("time", "freq"):
        raise ValueError(
            f"Acceptable domain flags are 'time' or 'freq', not domain={domain}"
        )
    real_input = np.dtype(x.dtype).kind != "c"
    if domain == "time":
        X = jnp.fft.fft(x, axis=axis)
    else:
        X = x
        real_input = False

    if window is not None:
        if callable(window):
            W = jnp.asarray(window(np.fft.fftfreq(Nx)))
        elif isinstance(window, (np.ndarray, jnp.ndarray)):
            if np.asarray(window).shape != (Nx,):
                raise ValueError("window must have the same length as data")
            W = jnp.asarray(window)
        else:
            from scipy.signal import get_window

            W = jnp.asarray(np.fft.ifftshift(get_window(window, Nx)))
        shape_W = [1] * x.ndim
        shape_W[axis] = Nx
        X = X * W.reshape(shape_W)

    newshape = list(x.shape)
    newshape[axis] = num
    N = min(num, Nx)
    nyq = N // 2 + 1
    Y = jnp.zeros(newshape, X.dtype)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, nyq)  # positive freqs incl. Nyquist (even N)
    Y = Y.at[tuple(sl)].set(X[tuple(sl)])
    if N > 2:
        sl[axis] = slice(nyq - N, None)  # negative freqs
        Y = Y.at[tuple(sl)].set(X[tuple(sl)])

    if N % 2 == 0:
        if num < Nx:  # downsampling: fold in the mirrored Nyquist bin
            stop = -(N // 2) + 1
            sl[axis] = slice(-(N // 2), stop if stop != 0 else None)
            pos = [slice(None)] * x.ndim
            pos[axis] = slice(N // 2, N // 2 + 1)
            Y = Y.at[tuple(pos)].add(X[tuple(sl)])
        elif num > Nx:  # upsampling: split the Nyquist bin
            sl[axis] = slice(N // 2, N // 2 + 1)
            Y = Y.at[tuple(sl)].multiply(0.5)
            temp = Y[tuple(sl)]
            sl[axis] = slice(num - N // 2, num - N // 2 + 1)
            Y = Y.at[tuple(sl)].set(temp)

    y = jnp.fft.ifft(Y, axis=axis) * (float(num) / float(Nx))
    if real_input:
        y = y.real
    if t is None:
        return y
    new_t = jnp.arange(0, num) * (t[1] - t[0]) * Nx / float(num) + t[0]
    return y, new_t


def resample_poly(
    x, up, down, axis=0, window=("kaiser", 5.0), padtype="constant",
    cval=None,
):
    """Polyphase resampling (scipy parity incl. SciPy-1.4 padtypes;
    reference signaltools.py:2032-2373)."""
    x = jnp.asarray(x)
    up = int(up)
    down = int(down)
    if up < 1 or down < 1:
        raise ValueError("up and down must be >= 1")
    if cval is not None and padtype != "constant":
        raise ValueError("cval has no effect when padtype is ", padtype)

    g_ = math.gcd(up, down)
    up //= g_
    down //= g_
    if up == down == 1:
        return x.copy()
    n_in = x.shape[axis]
    n_out = n_in * up
    n_out = n_out // down + bool(n_out % down)

    if isinstance(window, (list, np.ndarray, jnp.ndarray)):
        window = np.asarray(window)
        if window.ndim > 1:
            raise ValueError("window must be 1-D")
        half_len = (window.size - 1) // 2
        # preserve a floating window dtype (a float32 window keeps the
        # whole pipeline f32, scipy parity); promote int windows
        h = np.asarray(
            window,
            dtype=window.dtype if window.dtype.kind in "fc" else np.float64,
        )
    else:
        from scipy.signal import firwin

        max_rate = max(up, down)
        f_c = 1.0 / max_rate
        half_len = 10 * max_rate
        h = firwin(2 * half_len + 1, f_c, window=window)
    h = h * up

    # zero-pad the filter so output samples land at the center
    n_pre_pad = down - half_len % down
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while (
        upfirdn_out_len(len(h) + n_pre_pad + n_post_pad, n_in, up, down)
        < n_out + n_pre_remove
    ):
        n_post_pad += 1
    h_full = np.zeros(len(h) + n_pre_pad + n_post_pad, dtype=h.dtype)
    h_full[n_pre_pad: n_pre_pad + len(h)] = h
    n_pre_remove_end = n_pre_remove + n_out

    funcs = {
        "mean": jnp.mean,
        "median": jnp.median,
        "minimum": jnp.min,
        "maximum": jnp.max,
    }
    upfirdn_kwargs = {"mode": "constant", "cval": 0}
    background = None
    if padtype in funcs:
        background = funcs[padtype](x, axis=axis, keepdims=True)
    elif padtype in upfirdn_modes:
        upfirdn_kwargs = {"mode": padtype}
        if padtype == "constant":
            upfirdn_kwargs["cval"] = 0 if cval is None else cval
    else:
        raise ValueError(
            "padtype must be one of: maximum, mean, median, minimum, "
            + ", ".join(upfirdn_modes)
        )

    xw = x - background if background is not None else x
    y = upfirdn(h_full, xw, up, down, axis=axis, **upfirdn_kwargs)
    keep = [slice(None)] * x.ndim
    keep[axis] = slice(n_pre_remove, n_pre_remove_end)
    y = y[tuple(keep)]
    if background is not None:
        y = y + background
    return y
