"""Total-variation denoising (reference
cupyimg/skimage/restoration/_denoise.py).

Chambolle's dual projection algorithm with functional updates: the
in-place divergence/gradient slicing of the reference becomes
pad-and-shift expressions XLA fuses into one pass per iteration.  The
energy-based stopping criterion stays a host decision per iteration, as
in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..util import img_as_float

__all__ = ["denoise_tv_chambolle"]


def _forward_diff(x, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(jnp.diff(x, axis=axis), pad)


def _shift_down(x, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def _denoise_tv_chambolle_nd(image, weight=0.1, eps=2.0e-4,
                             n_iter_max=200):
    """Rudin-Osher-Fatemi TV denoising via Chambolle's algorithm
    (reference _denoise.py:6-89)."""
    ndim = image.ndim
    p = jnp.zeros((ndim,) + image.shape, dtype=image.dtype)
    tau = 1.0 / (2.0 * ndim)

    out = image
    E_init = E_previous = None
    for i in range(n_iter_max):
        if i > 0:
            # d = (negative) divergence of p
            d = sum(
                _shift_down(p[ax], ax) - p[ax] for ax in range(ndim)
            )
            out = image + d
            E = float((d * d).sum())
        else:
            out = image
            E = 0.0

        g = jnp.stack(
            [_forward_diff(out, ax) for ax in range(ndim)]
        )
        norm = jnp.sqrt((g * g).sum(axis=0, keepdims=True))
        E += weight * float(norm.sum())
        norm = norm * (tau / weight) + 1.0
        p = (p - tau * g) / norm
        E /= float(image.size)
        if i == 0:
            E_init = E
            E_previous = E
        else:
            if abs(E_previous - E) < eps * E_init:
                break
            E_previous = E
    return out


def denoise_tv_chambolle(
    image, weight=0.1, eps=2.0e-4, n_iter_max=200, multichannel=False
):
    """Total-variation denoising of n-D images (skimage parity;
    reference _denoise.py:92-175)."""
    image = jnp.asarray(image)
    if image.dtype.kind != "f":
        image = img_as_float(image)

    if multichannel:
        channels = [
            _denoise_tv_chambolle_nd(
                image[..., c], weight, eps, n_iter_max
            )
            for c in range(image.shape[-1])
        ]
        return jnp.stack(channels, axis=-1)
    return _denoise_tv_chambolle_nd(image, weight, eps, n_iter_max)
