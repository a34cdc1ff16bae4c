"""Multiscale ridge/vesselness filters (skimage.filters parity; reference
cupyimg/skimage/filters/ridges.py, SURVEY.md S5): Meijering neuriteness,
Sato tubeness, Frangi vesselness and the hybrid Hessian filter, built on
scale-normalized Hessian eigenvalues (closed-form, feature.corner)."""

from __future__ import annotations

import warnings
from functools import reduce

import numpy as np
import jax.numpy as jnp

from cupyimg_tpu.skimage.feature.corner import (
    hessian_matrix,
    hessian_matrix_eigvals,
)
from cupyimg_tpu.skimage.util.dtype import img_as_float
from cupyimg_tpu.skimage.util._invert import invert

__all__ = [
    "compute_hessian_eigenvalues",
    "meijering",
    "sato",
    "frangi",
    "hessian",
]


def _divide_nonzero(array1, array2, cval=1e-10):
    denom = jnp.where(jnp.abs(array2) > cval, array2, cval)
    return array1 / denom


def _sortbyabs(array, axis=0):
    index = jnp.argsort(jnp.abs(array), axis=axis)
    return jnp.take_along_axis(array, index, axis=axis)


def _check_sigmas(sigmas):
    sigmas = np.asarray(sigmas, dtype=float)
    if np.any(sigmas < 0.0):
        raise ValueError("Sigma values less than zero are not valid")
    return sigmas


def compute_hessian_eigenvalues(
    image, sigma, sorting="none", mode="constant", cval=0
):
    """Scale-normalized (sigma^2) Hessian eigenvalues with optional
    sorting (skimage parity)."""
    image = img_as_float(jnp.asarray(image))
    elems = hessian_matrix(image, sigma=sigma, order="rc", mode=mode,
                           cval=cval)
    elems = [(sigma ** 2) * e for e in elems]
    eigvals = hessian_matrix_eigvals(elems)
    if sorting == "abs":
        eigvals = _sortbyabs(eigvals, axis=0)
    elif sorting == "val":
        eigvals = jnp.sort(eigvals, axis=0)
    return eigvals


def meijering(
    image, sigmas=range(1, 10, 2), alpha=None, black_ridges=True,
    mode="reflect", cval=0,
):
    """Meijering neuriteness filter (skimage parity)."""
    image = jnp.asarray(image)
    sigmas = _check_sigmas(sigmas)
    ndim = image.ndim
    if alpha is None:
        alpha = 1.0 / ndim
    if black_ridges:
        image = invert(image)
    outputs = []
    for sigma in sigmas:
        eigenvalues = compute_hessian_eigenvalues(
            image, sigma, sorting="abs", mode=mode, cval=cval
        )
        # modified eigenvalues: aux_i = lambda_i + alpha * sum_{j!=i} lambda_j
        total = eigenvalues[0]
        for k in range(1, ndim):
            total = total + eigenvalues[k]
        # take the largest-magnitude one (last in abs-sorted order)
        aux = (1 - alpha) * eigenvalues[ndim - 1] + alpha * total
        filtered = _divide_nonzero(aux, jnp.min(aux))
        filtered = jnp.where(aux < 0, filtered, 0)
        outputs.append(filtered)
    return jnp.max(jnp.stack(outputs), axis=0)


def _warn_implicit_mode(name):
    # reference ridges.py:346-356: a None mode warns and resolves to
    # 'reflect'
    warnings.warn(
        f"Previously, {name} implicitly used 'constant' as the "
        "border mode when dealing with the edge of the array. The new "
        "behavior is 'reflect'. To recover the old behavior, use "
        "mode='constant'. To avoid this warning, please explicitly "
        "set the mode.",
        category=FutureWarning,
        stacklevel=3,
    )
    return "reflect"


def _resolve_scale_range(sigmas, scale_range, scale_step):
    # reference ridges.py:465-471: deprecated scale_range/scale_step pair
    if scale_range is not None and scale_step is not None:
        warnings.warn(
            "Use keyword parameter `sigmas` instead of `scale_range` and "
            "`scale_range` which will be removed in version 0.17.",
            stacklevel=3,
        )
        sigmas = np.arange(scale_range[0], scale_range[1], scale_step)
    return sigmas


def sato(image, sigmas=range(1, 10, 2), black_ridges=True, mode=None,
         cval=0):
    """Sato tubeness filter (skimage parity)."""
    image = jnp.asarray(image)
    if mode is None:
        mode = _warn_implicit_mode("sato")
    sigmas = _check_sigmas(sigmas)
    if not black_ridges:
        image = invert(image)
    outputs = []
    for sigma in sigmas:
        eig = compute_hessian_eigenvalues(
            image, sigma, sorting="val", mode=mode, cval=cval
        )
        lambdas = [eig[i] for i in range(1, eig.shape[0])]
        filtered = jnp.abs(reduce(jnp.multiply, lambdas)) ** (
            1 / len(lambdas)
        )
        outputs.append(jnp.where(lambdas[-1] > 0, filtered, 0))
    return jnp.max(jnp.stack(outputs), axis=0)


def frangi(
    image, sigmas=range(1, 10, 2), scale_range=None, scale_step=None,
    alpha=0.5, beta=0.5, gamma=15, black_ridges=True, mode="reflect",
    cval=0,
):
    """Frangi vesselness filter (skimage parity)."""
    image = jnp.asarray(image)
    sigmas = _resolve_scale_range(sigmas, scale_range, scale_step)
    sigmas = _check_sigmas(sigmas)
    ndim = image.ndim
    alpha_sq = 2 * alpha ** 2
    beta_sq = 2 * beta ** 2
    gamma_sq = 2 * gamma ** 2
    if black_ridges:
        image = invert(image)
    outputs = []
    lambdas_max = []
    for sigma in sigmas:
        eig = compute_hessian_eigenvalues(
            image, sigma, sorting="abs", mode=mode, cval=cval
        )
        lambda1 = eig[0]
        lambdas = [eig[i] for i in range(1, eig.shape[0])]
        if ndim == 2:
            r_a = jnp.full_like(lambda1, np.inf)
        else:
            r_a = _divide_nonzero(lambdas[0], lambdas[1]) ** 2
        filtered_raw = jnp.abs(reduce(jnp.multiply, lambdas)) ** (
            1 / len(lambdas)
        )
        r_b = _divide_nonzero(lambda1, filtered_raw) ** 2
        r_g = lambda1 ** 2
        for lam in lambdas:
            r_g = r_g + lam ** 2
        vals = (
            (1 - jnp.exp(-r_a / alpha_sq))
            * jnp.exp(-r_b / beta_sq)
            * (1 - jnp.exp(-r_g / gamma_sq))
        )
        outputs.append(vals)
        lambdas_max.append(jnp.max(jnp.stack(lambdas), axis=0))
    filtered_array = jnp.stack(outputs)
    lambdas_array = jnp.stack(lambdas_max)
    filtered_array = jnp.where(lambdas_array > 0, 0.0, filtered_array)
    return jnp.max(filtered_array, axis=0)


def hessian(
    image, sigmas=range(1, 10, 2), scale_range=None, scale_step=None,
    alpha=0.5, beta=0.5, gamma=15, black_ridges=True, mode=None, cval=0,
):
    """Hybrid Hessian filter (Ng et al.; skimage parity: frangi response
    with background forced to 1)."""
    if mode is None:
        mode = _warn_implicit_mode("hessian")
    filtered = frangi(
        image, sigmas=sigmas, scale_range=scale_range,
        scale_step=scale_step, alpha=alpha, beta=beta, gamma=gamma,
        black_ridges=black_ridges, mode=mode, cval=cval,
    )
    return jnp.where(filtered <= 0, 1.0, filtered)
