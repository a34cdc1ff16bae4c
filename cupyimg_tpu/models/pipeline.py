"""Composite image-processing pipelines (flagship workloads).

``edge_enhance_pipeline`` exercises the separable stencil engine end to end
(gaussian smooth -> sobel gradient magnitude -> unsharp mix); it is the
single-chip graft entry.  ``sharded_edge_enhance`` runs the same math over a
(batch, spatial) device mesh with ICI halo exchange — the multi-chip dry-run
step.  ``richardson_lucy_step`` is one iteration of Richardson-Lucy
deconvolution (the reference's restoration benchmark workload,
cupyimg/skimage/restoration/deconvolution.py:356).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.parallel import halo as _halo
from cupyimg_tpu.scipy.ndimage.filters import _gaussian_kernel1d


def edge_enhance_pipeline(x, sigma=1.5, amount=0.7):
    """Gaussian smooth + sobel gradient magnitude + unsharp mix.

    Pure jnp in/out; jittable on one chip. Works for 2-D or 3-D volumes.
    """
    x = jnp.asarray(x)
    sm = ndi.gaussian_filter(x, sigma, dtype_mode="float")
    grad = None
    for ax in range(x.ndim):
        d = ndi.sobel(sm, axis=ax, dtype_mode="float")
        grad = d * d if grad is None else grad + d * d
    grad = jnp.sqrt(grad)
    return (1.0 + amount) * x - amount * sm + 0.1 * grad


def richardson_lucy_step(image, estimate, psf_fft, psf_fft_conj):
    """One Richardson-Lucy iteration via FFT convolution (all-XLA)."""
    conv = jnp.fft.irfftn(
        jnp.fft.rfftn(estimate) * psf_fft, s=estimate.shape
    )
    relative = image / (conv + 1e-12)
    update = jnp.fft.irfftn(
        jnp.fft.rfftn(relative) * psf_fft_conj, s=estimate.shape
    )
    return estimate * update


def sharded_edge_enhance(x, mesh, spec, sigma=1.5, amount=0.7):
    """The edge-enhance pipeline over a device mesh with halo exchange.

    ``spec`` shards a batch axis (data parallel) and/or spatial axes
    (spatial parallel); stencil halos ride ICI via ppermute.
    """
    x = jnp.asarray(x)
    lw = int(4.0 * sigma + 0.5)
    g = _gaussian_kernel1d(sigma, 0, lw)[::-1]
    ndim = x.ndim
    # batch axis (axis 0) gets no filtering; spatial axes get gaussian
    weights = [None] + [g] * (ndim - 1)
    sm = _halo.sharded_separable(x, weights, mesh, spec)
    sm = sm.astype(x.dtype)

    deriv = np.array([-1.0, 0.0, 1.0])
    smooth = np.array([1.0, 2.0, 1.0])
    grad = None
    for ax in range(1, ndim):
        w = [None] + [
            deriv if a == ax else smooth for a in range(1, ndim)
        ]
        d = _halo.sharded_separable(sm, w, mesh, spec)
        grad = d * d if grad is None else grad + d * d
    grad = jnp.sqrt(grad).astype(x.dtype)
    return (1.0 + amount) * x - amount * sm + 0.1 * grad
