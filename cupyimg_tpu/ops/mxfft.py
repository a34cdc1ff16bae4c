"""FFT as MXU matmuls (four-step Cooley-Tukey decomposition).

XLA's TPU FFT runs a fixed internal algorithm; at the lane-aligned
sizes this library pads to (multiples of 64, see
scipy/signal/signaltools.next_fast_len) an rfft2+irfft2 round trip of a
4096^2 image costs ~8.5 ms on v5e — the bottleneck of the whole FFT
group (fftconvolve / oaconvolve / resample / registration).  This
module expresses the same transform as dense matmuls that the MXU
executes directly:

    n = a * b,  x[k1 + a*k2]  (k1 in [a], k2 in [b])
    X[j2 + b*j1] = sum_k1 W_a[k1, j1] * T[k1, j2] * sum_k2 x[k1, k2] W_b[k2, j2]

i.e. one (.., b) @ (b, b) matmul, a twiddle multiply, and one
(.., a) @ (a, a) matmul per transformed axis.  Complex values travel as
separate (real, imag) float32 planes — the axon TPU runtime neither
transfers complex64 to the host nor runs complex-to-complex FFTs well —
and a pure-real input skips the imaginary half of its first stage.

Numerics: weights and data split hi/lo into bfloat16 and recombine over
three MXU passes (~2^-22 relative, the same scheme as
ops/pallas_stencil); ``precision='highest'`` switches to XLA's 6-pass
f32 dot for parity checks.

The reference delegates all of this to cuFFT (signaltools.py:437-504);
this is the TPU-native first-party equivalent, used when
``core.config.use_mxfft`` is enabled and every transformed size
factors as a*b with a, b <= 256 (next_fast_len guarantees that on the
fftconvolve path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "rfftn_pair",
    "irfftn_pair",
    "can_handle",
    "fft_pair",
    "ifft_pair",
    "fftn_pair",
    "ifftn_pair",
]

_MAX_FACTOR = 256


@functools.lru_cache(maxsize=None)
def _split(n: int):
    """Best a*b = n with a, b <= _MAX_FACTOR, minimizing a + b
    (total MXU work per element ~ a + b).  None if n doesn't factor."""
    best = None
    a = int(np.sqrt(n))
    while a >= 2:
        if n % a == 0:
            b = n // a
            if b <= _MAX_FACTOR and a <= _MAX_FACTOR:
                cost = a + b
                if best is None or cost < best[0]:
                    best = (cost, a, b)
            if best is not None and a + n // a > best[0]:
                break
        a -= 1
    return None if best is None else (best[1], best[2])


def can_handle(n: int) -> bool:
    return n >= 4 and _split(int(n)) is not None


@functools.lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    """Twiddle/DFT factor matrices as (real, imag) f32 numpy pairs."""
    a, b = _split(n)
    sgn = 2j if inverse else -2j
    Wb = np.exp(sgn * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    Tw = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(b)) / n)
    Wa = np.exp(sgn * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    as_pair = lambda m: (  # noqa: E731
        m.real.astype(np.float32), m.imag.astype(np.float32)
    )
    return a, b, as_pair(Wb), as_pair(Tw), as_pair(Wa)


def _split3(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x, w):
    """f32 matmul as 3 bf16 passes (hi*hi + hi*lo + lo*hi)."""
    xhi, xlo = _split3(x)
    whi, wlo = _split3(w)
    out = jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(xhi, wlo, preferred_element_type=jnp.float32)
    return out + jnp.dot(xlo, whi, preferred_element_type=jnp.float32)


def _rdot(x, w, precision):
    if precision == "highest":
        return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
    if jax.default_backend() == "tpu":
        return _dot3(x, w)
    return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)


def _cdot(xr, xi, w, precision):
    """(xr + i xi) @ (wr + i wi) with xi possibly None (real input)."""
    wr, wi = w
    wr = jnp.asarray(wr)
    wi = jnp.asarray(wi)
    if xi is None:
        return _rdot(xr, wr, precision), _rdot(xr, wi, precision)
    rr = _rdot(xr, wr, precision) - _rdot(xi, wi, precision)
    ri = _rdot(xr, wi, precision) + _rdot(xi, wr, precision)
    return rr, ri


def _cmul(ar, ai, br, bi):
    if ai is None:
        return ar * br, ar * bi
    return ar * br - ai * bi, ar * bi + ai * br


def fft_pair(xr, xi, axis=-1, inverse=False, precision=None):
    """Complex FFT along ``axis`` of a (real, imag) pair.

    ``xi=None`` means a pure-real input (saves the imaginary half of
    the first stage).  Returns (real, imag); the inverse applies the
    1/n normalization.
    """
    axis = axis % xr.ndim
    n = xr.shape[axis]
    a, b, Wb, Tw, Wa = _plan(int(n), bool(inverse))
    moved = axis != xr.ndim - 1
    if moved:
        xr = jnp.moveaxis(xr, axis, -1)
        xi = None if xi is None else jnp.moveaxis(xi, axis, -1)
    batch = xr.shape[:-1]

    def stage1(v):
        # k = k1 + a*k2: reshape (.., b, a) -> transpose -> (.., a, b)
        v = v.reshape(batch + (b, a))
        return jnp.swapaxes(v, -1, -2).reshape(-1, b)

    yr, yi = _cdot(
        stage1(xr), None if xi is None else stage1(xi), Wb, precision
    )
    yr = yr.reshape(batch + (a, b))
    yi = yi.reshape(batch + (a, b))
    twr = jnp.asarray(Tw[0])
    twi = jnp.asarray(Tw[1])
    zr, zi = _cmul(yr, yi, twr, twi)

    def stage2(v):
        return jnp.swapaxes(v, -1, -2).reshape(-1, a)

    ur, ui = _cdot(stage2(zr), stage2(zi), Wa, precision)
    # out index j = j2 + b*j1; current layout [j2, j1] -> swap & flatten
    ur = jnp.swapaxes(ur.reshape(batch + (b, a)), -1, -2)
    ui = jnp.swapaxes(ui.reshape(batch + (b, a)), -1, -2)
    ur = ur.reshape(batch + (n,))
    ui = ui.reshape(batch + (n,))
    if inverse:
        s = np.float32(1.0 / n)
        ur = ur * s
        ui = ui * s
    if moved:
        ur = jnp.moveaxis(ur, -1, axis)
        ui = jnp.moveaxis(ui, -1, axis)
    return ur, ui


def ifft_pair(xr, xi, axis=-1, precision=None):
    return fft_pair(xr, xi, axis, inverse=True, precision=precision)


def fftn_pair(xr, xi, axes, precision=None):
    """Complex FFT over ``axes`` (pair representation)."""
    for ax in axes:
        xr, xi = fft_pair(xr, xi, ax, precision=precision)
    return xr, xi


def ifftn_pair(xr, xi, axes, precision=None):
    for ax in axes:
        xr, xi = fft_pair(xr, xi, ax, inverse=True, precision=precision)
    return xr, xi


def rfftn_pair(x, axes, precision=None):
    """Real-input FFT over ``axes`` with Hermitian truncation: the
    FIRST axis keeps only n//2 + 1 bins (the rfftn analog), so every
    subsequent axis transforms at ~half width."""
    ax0 = axes[0] % x.ndim
    n0 = x.shape[ax0]
    r, i = fft_pair(x, None, ax0, precision=precision)
    half = n0 // 2 + 1
    r = jax.lax.slice_in_dim(r, 0, half, axis=ax0)
    i = jax.lax.slice_in_dim(i, 0, half, axis=ax0)
    for ax in axes[1:]:
        r, i = fft_pair(r, i, ax, precision=precision)
    return r, i


def irfftn_pair(r, i, axes, n0, precision=None):
    """Inverse of :func:`rfftn_pair`: full inverses on the later axes,
    then Hermitian reconstruction of the first axis and a final
    inverse whose real plane is the result."""
    ax0 = axes[0] % r.ndim
    for ax in axes[1:]:
        r, i = fft_pair(r, i, ax, inverse=True, precision=precision)
    half = r.shape[ax0]
    tail = n0 - half  # bins k in [half, n0): X[k] = conj(X[n0 - k])
    if tail:
        tr = jnp.flip(
            jax.lax.slice_in_dim(r, 1, tail + 1, axis=ax0), axis=ax0
        )
        ti = jnp.flip(
            jax.lax.slice_in_dim(i, 1, tail + 1, axis=ax0), axis=ax0
        )
        r = jnp.concatenate([r, tr], axis=ax0)
        i = jnp.concatenate([i, -ti], axis=ax0)
    out_r, _ = fft_pair(r, i, ax0, inverse=True, precision=precision)
    return out_r
