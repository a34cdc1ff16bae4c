"""TV-L1 and iterative Lucas-Kanade optical flow (reference
cupyimg/skimage/registration/_optical_flow.py).

TPU-native redesign: each warp iteration is a single jitted function (warp
gather + data term + dual regularization / local linear solves fused by
XLA), instead of the reference's host loop of in-place masked updates.
Boolean-mask updates become ``jnp.where`` selects; the duality projection
buffers are loop carries.  Early stopping (TV-L1 ``tol``) stays a host
decision once per warp iteration, as in the reference.
"""

from __future__ import annotations

import functools
from functools import partial
from itertools import combinations_with_replacement

import numpy as np
import jax
import jax.numpy as jnp

import cupyimg_tpu.numpy as cnp
from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage.transform import warp

from ._optical_flow_utils import coarse_to_fine, get_warp_points

__all__ = ["optical_flow_tvl1", "optical_flow_ilk"]


def _forward_diff(x, axis):
    """Forward difference with a trailing zero (the reference keeps the
    last slice of its ``g`` buffer at zero, _optical_flow.py:126-133)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(jnp.diff(x, axis=axis), pad)


def _shift_down(x, axis):
    """x shifted by +1 along ``axis`` with a leading zero."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


@functools.partial(
    jax.jit, static_argnames=("num_iter", "prefilter", "ndim")
)
def _tvl1_warp_step(
    reference_image,
    moving_image,
    grid,
    flow_in,
    proj,
    f0,
    f1,
    dt,
    num_iter,
    prefilter,
    ndim,
):
    """One warp iteration of the TV-L1 solver (fully fused under jit)."""
    flow_current = flow_in
    if prefilter:
        flow_current = ndi.median_filter(
            flow_current, [1] + ndim * [3]
        )

    image1_warp = warp(
        moving_image, grid + flow_current, mode="edge"
    )
    grad = jnp.stack(cnp.gradient(image1_warp))
    NI = (grad * grad).sum(0)
    NI = jnp.where(NI == 0, 1.0, NI)

    rho_0 = (
        image1_warp - reference_image - (grad * flow_current).sum(0)
    )

    reg_num_iter = 2
    flow_auxiliary = flow_current
    for _ in range(num_iter):
        # Data term: thresholded gradient step (masked in-place updates
        # in the reference become a single select)
        rho = rho_0 + (grad * flow_current).sum(0)
        inlier = jnp.abs(rho) <= f0 * NI
        step = jnp.where(inlier, rho / NI, f0 * jnp.sign(rho))
        flow_auxiliary = flow_current - step[None] * grad

        # Regularization term: Chambolle dual projection per component
        flow_current = flow_auxiliary
        for idx in range(ndim):
            proj_idx = proj[idx]
            comp = flow_current[idx]
            for _ in range(reg_num_iter):
                g = jnp.stack(
                    [_forward_diff(comp, ax) for ax in range(ndim)]
                )
                norm = jnp.sqrt((g * g).sum(0, keepdims=True)) * f1 + 1.0
                proj_idx = (proj_idx - dt * g) / norm
                # d = (negative) divergence of proj_idx
                d = sum(
                    _shift_down(proj_idx[ax], ax) - proj_idx[ax]
                    for ax in range(ndim)
                )
                comp = flow_auxiliary[idx] + d
            proj = proj.at[idx].set(proj_idx)
            flow_current = flow_current.at[idx].set(comp)

    delta = flow_in - flow_current
    return flow_current, proj, (delta * delta).sum()


def _tvl1(
    reference_image,
    moving_image,
    flow0,
    attachment,
    tightness,
    num_warp,
    num_iter,
    tol,
    prefilter,
):
    """TV-L1 solver for one pyramid level (reference
    _optical_flow.py:21-158)."""
    dtype = reference_image.dtype
    ndim = reference_image.ndim
    grid = jnp.stack(
        jnp.meshgrid(
            *[
                jnp.arange(n, dtype=dtype)
                for n in reference_image.shape
            ],
            indexing="ij",
        ),
        axis=0,
    )

    dt = 0.5 / ndim
    f0 = attachment * tightness
    f1 = dt / tightness
    tol = tol * reference_image.size

    flow_current = flow0
    proj = jnp.zeros(
        (ndim, ndim) + reference_image.shape, dtype=dtype
    )

    for _ in range(num_warp):
        flow_current, proj, delta = _tvl1_warp_step(
            reference_image,
            moving_image,
            grid,
            flow_current,
            proj,
            f0,
            f1,
            dt,
            num_iter,
            prefilter,
            ndim,
        )
        if float(delta) < tol:
            break

    return flow_current


def optical_flow_tvl1(
    reference_image,
    moving_image,
    *,
    attachment=15,
    tightness=0.3,
    num_warp=5,
    num_iter=10,
    tol=1e-4,
    prefilter=False,
    dtype=np.float32,
):
    r"""Coarse-to-fine TV-L1 optical flow estimator (skimage parity;
    reference _optical_flow.py:161-246).

    Returns the flow components per axis,
    shape ``(image0.ndim, M, N[, ...])``.
    """
    solver = partial(
        _tvl1,
        attachment=attachment,
        tightness=tightness,
        num_warp=num_warp,
        num_iter=num_iter,
        tol=tol,
        prefilter=prefilter,
    )
    return coarse_to_fine(
        reference_image, moving_image, solver, dtype=dtype
    )


@functools.partial(
    jax.jit, static_argnames=("radius", "gaussian", "prefilter", "ndim")
)
def _ilk_warp_step(
    reference_image,
    moving_image,
    grid,
    flow_in,
    radius,
    gaussian,
    prefilter,
    ndim,
):
    """One warp iteration of the iLK solver: warp + windowed normal
    equations + batched ndim x ndim solve (MXU-batched under jit)."""
    dtype = reference_image.dtype
    size = 2 * radius + 1

    if gaussian:
        sigma = ndim * (size / 4,)
        filter_func = partial(
            ndi.gaussian_filter, sigma=sigma, mode="mirror"
        )
    else:
        filter_func = partial(
            ndi.uniform_filter, size=ndim * (size,), mode="mirror"
        )

    flow = flow_in
    if prefilter:
        flow = ndi.median_filter(flow, (1,) + ndim * (3,))

    moving_image_warp = warp(
        moving_image, get_warp_points(grid, flow), mode="edge"
    )
    grad = jnp.stack(jnp.gradient(moving_image_warp), axis=0)
    error_image = (
        (grad * flow).sum(axis=0)
        + reference_image
        - moving_image_warp
    )

    # local ndim x ndim linear systems A X = b at every pixel
    A = jnp.zeros(reference_image.shape + (ndim, ndim), dtype=dtype)
    b = jnp.zeros(reference_image.shape + (ndim,), dtype=dtype)
    for i, j in combinations_with_replacement(range(ndim), 2):
        window = filter_func(grad[i] * grad[j]).astype(dtype)
        A = A.at[..., i, j].set(window)
        if i != j:
            A = A.at[..., j, i].set(window)
    for i in range(ndim):
        b = b.at[..., i].set(
            filter_func(grad[i] * error_image).astype(dtype)
        )

    # replace badly conditioned systems with the identity
    bad = jnp.abs(jnp.linalg.det(A)) < 1e-14
    A = jnp.where(
        bad[..., None, None], jnp.eye(ndim, dtype=dtype), A
    )
    b = jnp.where(bad[..., None], 0.0, b)

    sol = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.moveaxis(sol, -1, 0)


def _ilk(
    reference_image,
    moving_image,
    flow0,
    radius,
    num_warp,
    gaussian,
    prefilter,
):
    """Iterative Lucas-Kanade solver for one pyramid level (reference
    _optical_flow.py:249-341)."""
    dtype = reference_image.dtype
    ndim = reference_image.ndim

    grid = jnp.meshgrid(
        *[jnp.arange(n, dtype=dtype) for n in reference_image.shape],
        indexing="ij",
        sparse=True,
    )
    grid = [jnp.asarray(g) for g in grid]

    flow = flow0
    for _ in range(num_warp):
        flow = _ilk_warp_step(
            reference_image,
            moving_image,
            jnp.stack(jnp.broadcast_arrays(*grid), axis=0),
            flow,
            radius,
            gaussian,
            prefilter,
            ndim,
        )
    return flow


def optical_flow_ilk(
    reference_image,
    moving_image,
    *,
    radius=7,
    num_warp=10,
    gaussian=False,
    prefilter=False,
    dtype=np.float32,
):
    """Coarse-to-fine iterative Lucas-Kanade optical flow estimator
    (skimage parity; reference _optical_flow.py:344-421)."""
    solver = partial(
        _ilk,
        radius=radius,
        num_warp=num_warp,
        gaussian=gaussian,
        prefilter=prefilter,
    )
    return coarse_to_fine(
        reference_image, moving_image, solver, dtype=dtype
    )
