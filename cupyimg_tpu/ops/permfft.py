"""Permuted-order four-step FFT: MXU matmuls with zero transposes.

XLA's TPU FFT runs at a flat ~28 GB/s effective regardless of shape
(measured on v5e across 512..64k point batched transforms) — an order of
magnitude under the HBM roofline — and it is the bottleneck of the whole
FFT-domain family (fftconvolve / oaconvolve / resample / registration /
restoration; reference delegates these to cuFFT,
cupyimg/scipy/signal/signaltools.py:437-504).

This module reformulates the length-``n = a*b`` transform (Bailey's
four-step) so that *no data reordering ever happens*:

    x2[k1, k2] = x[k1*b + k2]                    (plain reshape)
    U[j1, k2]  = sum_k1 Wa[k1, j1] x2[k1, k2]    (contract dim -2)
    V[j1, k2]  = U * w^(j1*k2)                   (fused twiddle)
    Xp[j1, j2] = sum_k2 V[j1, k2] Wb[k2, j2]     (contract dim -1)

``Xp`` holds ``X[j1 + a*j2]`` at row-major position ``j1*b + j2`` — the
spectrum in a fixed *permuted* order.  The inverse runs the same two
contractions with conjugated factors and lands back in *natural* order.
Because every frequency-domain operation this library needs (conv
products, Fourier filters, cross-power spectra) is pointwise, the
permutation never needs to be materialized; when explicit bin indices
are required, :func:`perm_indices` gives the static permutation.

Complex values travel as separate (real, imag) float32 planes — the
axon TPU runtime neither transfers complex64 nor supports c2c FFTs —
and real-input / real-output transforms skip the dead half of their
first / last stage.  f32 matmuls run as 3-pass bf16 hi/lo splits
(~2^-22 relative); tests on CPU use full-precision dots.

Factor choice prefers ``b = 96`` when ``n`` admits it (the fast
stage's ``6b`` MACs/point dominate the fused pipeline and K = 96
still feeds the MXU well — measured 10-21 % faster than b = 128 at
n = 4224 on v5e), else the 128-wide lane dimension (``good_size``
rounds up to a multiple of 128), keeping stage 2 a well-tiled lane
matmul and stage 1 an ``(a, a) <= (256, 256)`` one.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "good_size",
    "can_handle",
    "perm_indices",
    "neg_bins",
    "fft_perm",
    "ifft_perm",
    "fftn_perm",
    "ifftn_perm",
    "rfftn_perm",
    "irfftn_perm",
]

_MAX_A = 256  # stage-1 factor bound: (a, a) matmul stays small
_MAX_N = _MAX_A * 128  # good_size ceiling with b = 128


def good_size(n: int) -> int:
    """Smallest m >= n this module runs fast at: a multiple of 128 with
    m/128 <= 256, or for short axes any m <= 256 (single-stage DFT)."""
    if n <= _MAX_A:
        return int(n)
    m = -(-int(n) // 128) * 128
    if m > _MAX_N:
        raise ValueError(f"axis length {n} exceeds permfft ceiling {_MAX_N}")
    return m


@functools.lru_cache(maxsize=None)
def _split(n: int):
    """(a, b) with n = a*b; b the MXU-aligned fast factor. None => single
    -stage DFT (n <= _MAX_A). Raises for sizes good_size won't produce."""
    if n <= _MAX_A:
        return None
    # b = 96 first: measured faster than 128 when available (v5e,
    # n = 4224: fwd 1.20 vs 1.33 ms, inv 1.36 vs 1.73 ms) — the fast
    # stage's 6b MACs/point dominate the pipeline and K = 96 keeps the
    # MXU contraction well fed; b <= 64 loses lanes (and (66, 64) runs
    # the forward pathologically slow).  See ops/pallas_fft.py notes.
    for b in (96, 128, 64, 32):
        if n % b == 0 and n // b <= _MAX_A:
            return (n // b, b)
    # last resort: any factoring with both factors <= _MAX_A
    a = int(np.sqrt(n))
    while a >= 2:
        if n % a == 0 and n // a <= _MAX_A and a <= _MAX_A:
            return (a, n // a)
        a -= 1
    raise ValueError(f"{n} does not factor for permfft; pad to good_size")


def can_handle(n: int) -> bool:
    n = int(n)
    if n < 2:
        return False
    if n <= _MAX_A:
        return True
    try:
        _split(n)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def perm_indices(n: int) -> np.ndarray:
    """p such that Xp.ravel()[i] == X_natural[p[i]] along the axis."""
    sp = _split(int(n))
    if sp is None:
        return np.arange(int(n))
    a, b = sp
    j1 = np.arange(a)[:, None]
    j2 = np.arange(b)[None, :]
    return (j1 + a * j2).ravel()


def neg_bins(x, axis):
    """Frequency negation k -> (-k) mod n in the *permuted* bin order.

    At permuted position (j1, j2) the natural bin is k = j1 + a*j2
    (:func:`perm_indices`), so -k mod n sits at (a-j1, b-1-j2) for
    j1 > 0 and at (0, (b-j2) mod b) on the j1 == 0 row — i.e. a flip
    plus roll on the slow digit, a flip on the fast digit, and a
    one-lane roll of the first slow-digit row.  All static slicing, so
    XLA fuses it; no gather.  Enables the classic two-reals-in-one-FFT
    packing for real convolution products (signaltools
    ``_jitted_pallas_conv``): conj(F[-k]) recovers the two spectra.
    """
    ax = axis % x.ndim
    n = int(x.shape[ax])
    sp = _split(n)
    if sp is None:  # natural order: plain flip + roll
        return jnp.roll(jnp.flip(x, ax), 1, ax)
    a, b = sp
    shp = x.shape[:ax] + (a, b) + x.shape[ax + 1 :]
    y = x.reshape(shp)
    y = jnp.roll(jnp.flip(y, ax), 1, ax)  # j1 -> (a - j1) % a
    y = jnp.flip(y, ax + 1)  # j2 -> b - 1 - j2
    # j1 == 0 row needs (b - j2) % b instead: one extra roll of that row
    sl0 = [slice(None)] * y.ndim
    sl0[ax] = slice(0, 1)
    rest = [slice(None)] * y.ndim
    rest[ax] = slice(1, None)
    row0 = jnp.roll(y[tuple(sl0)], 1, ax + 1)
    y = jnp.concatenate([row0, y[tuple(rest)]], axis=ax)
    return y.reshape(x.shape)


@functools.lru_cache(maxsize=None)
def _factors(n: int, inverse: bool):
    """(Wa, tw, Wb) as float32 (real, imag) numpy pairs, cached."""
    sgn = 2j if inverse else -2j
    pair = lambda m: (  # noqa: E731
        np.ascontiguousarray(m.real.astype(np.float32)),
        np.ascontiguousarray(m.imag.astype(np.float32)),
    )
    sp = _split(int(n))
    if sp is None:
        W = np.exp(sgn * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
        return (pair(W),)
    a, b = sp
    Wa = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    tw = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(b)) / n)
    Wb = np.exp(sgn * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    return pair(Wa), pair(tw), pair(Wb)


def _use_bf16():
    return jax.default_backend() == "tpu"


def _split_hilo(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _rcontract(x, w, sub):
    """einsum(sub) of real operands; 3-pass bf16 on TPU, f32 elsewhere."""
    if _use_bf16():
        xhi, xlo = _split_hilo(x)
        whi, wlo = _split_hilo(jnp.asarray(w))
        out = jnp.einsum(sub, xhi, whi, preferred_element_type=jnp.float32)
        out = out + jnp.einsum(
            sub, xhi, wlo, preferred_element_type=jnp.float32
        )
        return out + jnp.einsum(
            sub, xlo, whi, preferred_element_type=jnp.float32
        )
    return jnp.einsum(
        sub, x, jnp.asarray(w), precision=jax.lax.Precision.HIGHEST
    )


def _ccontract(xr, xi, w, sub, imag_out=True):
    """Complex contraction of an (xr, xi) pair with a (wr, wi) factor.
    xi=None => real input; imag_out=False skips the imaginary plane."""
    wr, wi = w
    if xi is None:
        rr = _rcontract(xr, wr, sub)
        ri = _rcontract(xr, wi, sub) if imag_out else None
        return rr, ri
    rr = _rcontract(xr, wr, sub) - _rcontract(xi, wi, sub)
    if not imag_out:
        return rr, None
    ri = _rcontract(xr, wi, sub) + _rcontract(xi, wr, sub)
    return rr, ri


def _axis_subscripts(ndim: int, ax: int, contract_first: bool):
    """einsum spec contracting the (a, b) pair inserted at axis ax.
    Array dims: [..., a, b, ...] (ndim+1 total). contract_first => sum
    over a (dim ax), else over b (dim ax+1); contracted index is renamed
    through the factor matrix, preserving dim order."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    dims = list(letters[: ndim + 1])
    out = list(dims)
    pos = ax if contract_first else ax + 1
    k = dims[pos]
    j = letters[ndim + 1]
    out[pos] = j
    return f"{''.join(dims)},{k}{j}->{''.join(out)}"


def _twiddle_shape(ndim: int, ax: int, a: int, b: int):
    shape = [1] * (ndim + 1)
    shape[ax] = a
    shape[ax + 1] = b
    return tuple(shape)


def fft_perm(xr, xi, axis=-1, inverse=False, real_out=False):
    """Length-n transform along ``axis`` of the (real, imag) pair.

    Forward (natural in -> permuted out) or inverse (permuted in ->
    natural out, 1/n normalized).  ``xi=None`` marks real input;
    ``real_out=True`` skips the imaginary output plane (inverse of a
    Hermitian spectrum).  Returns (real, imag|None).
    """
    ax = axis % xr.ndim
    n = int(xr.shape[ax])
    facs = _factors(n, bool(inverse))
    if len(facs) == 1:  # single-stage DFT matmul
        sub = _axis_subscripts(xr.ndim - 1, ax, contract_first=True)
        rr, ri = _ccontract(xr, xi, facs[0], sub, imag_out=not real_out)
        if inverse:
            s = np.float32(1.0 / n)
            rr = rr * s
            ri = None if ri is None else ri * s
        return rr, ri

    (Wa, tw, Wb) = facs
    a, b = _split(n)
    shp = xr.shape[:ax] + (a, b) + xr.shape[ax + 1 :]
    xr = xr.reshape(shp)
    xi = None if xi is None else xi.reshape(shp)
    nd = len(shp) - 1

    # forward: X[j1 + a*j2] = sum_k2 Wb[k2,j2] * tw[j1,k2] * sum_k1 Wa[k1,j1] x2[k1,k2]
    #   -> contract slow dim, twiddle, contract fast dim; out[j1, j2].
    # inverse: x[k1*b + k2] = sum_j1 Wa'[j1,k1] * tw'[j1,k2] * sum_j2 Wb'[j2,k2] Xp[j1,j2]
    #   -> contract fast dim, twiddle, contract slow dim; out[k1, k2].
    sub_slow = _axis_subscripts(nd, ax, contract_first=True)
    sub_fast = _axis_subscripts(nd, ax, contract_first=False)
    tshape = _twiddle_shape(nd, ax, a, b)
    twr = jnp.asarray(tw[0]).reshape(tshape)
    twi = jnp.asarray(tw[1]).reshape(tshape)

    first, second = (
        (sub_fast, sub_slow) if inverse else (sub_slow, sub_fast)
    )
    W1, W2 = ((Wb, Wa) if inverse else (Wa, Wb))
    ur, ui = _ccontract(xr, xi, W1, first)
    if ui is None:
        vr, vi = ur * twr, ur * twi
    else:
        vr = ur * twr - ui * twi
        vi = ur * twi + ui * twr
    rr, ri = _ccontract(vr, vi, W2, second, imag_out=not real_out)

    out_shape = shp[:ax] + (n,) + shp[ax + 2 :]
    rr = rr.reshape(out_shape)
    ri = None if ri is None else ri.reshape(out_shape)
    if inverse:
        s = np.float32(1.0 / n)
        rr = rr * s
        ri = None if ri is None else ri * s
    return rr, ri


def ifft_perm(xr, xi, axis=-1, real_out=False):
    return fft_perm(xr, xi, axis, inverse=True, real_out=real_out)


def fftn_perm(xr, xi, axes):
    for ax in axes:
        xr, xi = fft_perm(xr, xi, ax)
    return xr, xi


def ifftn_perm(xr, xi, axes, real_out=False):
    axes = tuple(axes)
    for ax in axes[:-1]:
        xr, xi = fft_perm(xr, xi, ax, inverse=True)
    return fft_perm(xr, xi, axes[-1], inverse=True, real_out=real_out)


def rfftn_perm(x, axes):
    """Real-input nd transform (permuted order, full width: Hermitian
    truncation would break the pointwise-product pairing, and the first
    stage's real input already saves the dead half of the work)."""
    axes = tuple(axes)
    r, i = fft_perm(x, None, axes[0])
    for ax in axes[1:]:
        r, i = fft_perm(r, i, ax)
    return r, i


def irfftn_perm(r, i, axes):
    """Real-output inverse over ``axes`` (last axis drops the imaginary
    plane); returns the real plane in natural order."""
    axes = tuple(axes)
    for ax in axes[:-1]:
        r, i = fft_perm(r, i, ax, inverse=True)
    rr, _ = fft_perm(r, i, axes[-1], inverse=True, real_out=True)
    return rr
