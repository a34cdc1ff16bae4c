"""Deconvolution: wiener, unsupervised_wiener, richardson_lucy
(reference cupyimg/skimage/restoration/deconvolution.py).

All three are FFT-domain (or FFT-convolution) pipelines; the iterative
ones keep the reference's host loop with data-dependent stopping, while
each iteration's math is a fused jnp expression.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from cupyimg_tpu.core.complexutil import make_complex
from cupyimg_tpu.scipy.signal import convolve

from . import uft

__keywords__ = "restoration, image, deconvolution"


def _clip_pm1(x):
    """``x[x > 1] = 1; x[x < -1] = -1`` with the reference's semantics
    (deconvolution.py:138-141): CuPy/legacy-NumPy order complex values
    lexicographically by (real, imag), and the masked assignment zeroes
    the imaginary part of clipped pixels."""
    if not jnp.iscomplexobj(x):
        return jnp.clip(x, -1, 1)
    gt = (x.real > 1) | ((x.real == 1) & (x.imag > 0))
    lt = (x.real < -1) | ((x.real == -1) & (x.imag < 0))
    one = jnp.asarray(1.0, x.dtype)
    return jnp.where(gt, one, jnp.where(lt, -one, x))


def wiener(image, psf, balance, reg=None, is_real=True, clip=True):
    r"""Wiener-Hunt deconvolution (Fourier diagonalization), skimage
    parity (reference deconvolution.py:13-145)."""
    image = jnp.asarray(image)
    psf = jnp.asarray(psf)
    if reg is None:
        reg, _ = uft.laplacian(image.ndim, image.shape, is_real=is_real)
    reg = jnp.asarray(reg)
    if not jnp.iscomplexobj(reg):
        reg = uft.ir2tf(reg, image.shape, is_real=is_real)

    if psf.shape != reg.shape:
        trans_func = uft.ir2tf(psf, image.shape, is_real=is_real)
    else:
        trans_func = psf

    atf2 = jnp.abs(trans_func) ** 2
    areg2 = jnp.abs(reg) ** 2
    wiener_filter = jnp.conj(trans_func) / (atf2 + balance * areg2)
    if is_real:
        deconv = uft.uirfft2(
            wiener_filter * uft.urfft2(image), shape=image.shape
        )
    else:
        deconv = uft.uifft2(wiener_filter * uft.ufft2(image))

    if clip:
        deconv = _clip_pm1(deconv)
    return deconv


def unsupervised_wiener(
    image, psf, reg=None, user_params=None, is_real=True, clip=True
):
    """Unsupervised Wiener-Hunt deconvolution: Gibbs sampler over the
    (noise, prior) precisions (reference deconvolution.py:148-352).

    Returns ``(x_postmean, {"noise": chain, "prior": chain})``.

    The complex noise excursion is drawn on the host (complex
    construction from two real normals is unavailable on some TPU
    runtimes) and transferred once per iteration; all spectrum math runs
    on device.
    """
    params = {
        "threshold": 1e-4,
        "max_iter": 200,
        "min_iter": 30,
        "burnin": 15,
        "callback": None,
        "rng": None,
    }
    params.update(user_params or {})
    rng = params["rng"] or np.random.RandomState()

    image = jnp.asarray(image)
    psf = jnp.asarray(psf)
    if reg is None:
        reg, _ = uft.laplacian(image.ndim, image.shape, is_real=is_real)
    reg = jnp.asarray(reg)
    if not jnp.iscomplexobj(reg):
        reg = uft.ir2tf(reg, image.shape, is_real=is_real)

    if psf.shape != reg.shape:
        trans_fct = uft.ir2tf(psf, image.shape, is_real=is_real)
    else:
        trans_fct = psf

    # complex zeros built from real planes (no complex constants)
    _rdt = np.dtype(trans_fct.dtype).type(0).real.dtype
    x_postmean = make_complex(
        jnp.zeros(trans_fct.shape, _rdt), jnp.zeros(trans_fct.shape, _rdt)
    )
    prev_x_postmean = x_postmean
    delta = np.nan

    gn_chain, gx_chain = [1], [1]

    areg2 = jnp.abs(reg) ** 2
    atf2 = jnp.abs(trans_fct) ** 2

    float_dtype = (
        np.float64 if jnp.zeros(0).dtype == jnp.float64 else np.float32
    )
    if is_real:
        data_spectrum = uft.urfft2(image.astype(float_dtype))
    else:
        data_spectrum = uft.ufft2(image.astype(float_dtype))

    complex_dtype = data_spectrum.dtype
    iteration = 0
    for iteration in range(params["max_iter"]):
        # weighting (correlation in direct space), Eq. 29
        precision = gn_chain[-1] * atf2 + gx_chain[-1] * areg2
        # host-drawn normal excursion; real/imag planes transfer
        # separately and combine on device (no complex transfers)
        real_dtype = np.dtype(complex_dtype).type(0).real.dtype
        noise = make_complex(
            jnp.asarray(
                rng.standard_normal(data_spectrum.shape).astype(real_dtype)
            ),
            jnp.asarray(
                rng.standard_normal(data_spectrum.shape).astype(real_dtype)
            ),
        )
        excursion = np.sqrt(0.5) / jnp.sqrt(precision) * noise

        # mean Eq. 30
        wiener_filter = gn_chain[-1] * jnp.conj(trans_fct) / precision
        x_sample = wiener_filter * data_spectrum + excursion
        if params["callback"]:
            params["callback"](x_sample)

        # sample hyperparameters, Eq. 31
        gn_chain.append(
            float(
                rng.gamma(
                    image.size / 2,
                    2
                    / float(
                        uft.image_quad_norm(
                            data_spectrum - x_sample * trans_fct
                        )
                    ),
                )
            )
        )
        gx_chain.append(
            float(
                rng.gamma(
                    (image.size - 1) / 2,
                    2 / float(uft.image_quad_norm(x_sample * reg)),
                )
            )
        )

        # current empirical average
        if iteration > params["burnin"]:
            x_postmean = prev_x_postmean + x_sample

        if iteration > (params["burnin"] + 1):
            current = x_postmean / (iteration - params["burnin"])
            previous = prev_x_postmean / (
                iteration - params["burnin"] - 1
            )
            delta = float(
                jnp.sum(jnp.abs(current - previous))
                / jnp.sum(jnp.abs(x_postmean))
                / (iteration - params["burnin"])
            )

        prev_x_postmean = x_postmean

        if (iteration > params["min_iter"]) and (
            delta < params["threshold"]
        ):
            break

    x_postmean = x_postmean / (iteration - params["burnin"])
    if is_real:
        x_postmean = uft.uirfft2(x_postmean, shape=image.shape)
    else:
        x_postmean = uft.uifft2(x_postmean)

    if clip:
        x_postmean = _clip_pm1(x_postmean)

    return (x_postmean, {"noise": gn_chain, "prior": gx_chain})




@functools.partial(
    jax.jit, static_argnames=("iterations", "filter_epsilon")
)
def _rl_loop(image, psf, psf_mirror, est0, iterations, filter_epsilon):
    """Richardson-Lucy multiplicative updates inside one jitted
    fori_loop (eager per-iteration dispatch costs two convolution round
    trips per step)."""

    def body(_, est):
        conv = convolve(est, psf, mode="same")
        if filter_epsilon:
            relative_blur = jnp.where(
                conv < filter_epsilon, 0, image / conv
            )
        else:
            relative_blur = image / conv
        return est * convolve(relative_blur, psf_mirror, mode="same")

    return jax.lax.fori_loop(0, iterations, body, est0)


def richardson_lucy(
    image, psf, iterations=50, clip=True, filter_epsilon=None
):
    """Richardson-Lucy deconvolution (skimage parity; reference
    deconvolution.py:355-416).

    Fixed-iteration multiplicative updates; each iteration is two
    FFT-convolutions plus a ratio, dispatched as one fused jnp chain.
    """
    image = jnp.asarray(image)
    psf = jnp.asarray(psf)
    float_type = jnp.promote_types(image.dtype, np.float32)
    image = image.astype(float_type)
    psf = psf.astype(float_type)
    im_deconv = jnp.full(image.shape, 0.5, dtype=float_type)
    psf_mirror = psf[(slice(None, None, -1),) * psf.ndim]

    im_deconv = _rl_loop(
        image, psf, psf_mirror, im_deconv, int(iterations),
        float(filter_epsilon) if filter_epsilon else None,
    )

    if clip:
        im_deconv = _clip_pm1(im_deconv)
    return im_deconv
