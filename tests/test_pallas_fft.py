"""Permuted-order matmul FFT (ops/permfft) and its fused Pallas form
(ops/pallas_fft), plus the fftconvolve wiring.

The reference delegates FFT-domain work to cuFFT plans
(cupyimg/scipy/signal/signaltools.py:437-504); these modules are the
TPU-native first-party equivalent.  Tests run the Pallas kernels in
interpret mode on CPU; the TPU perf tier is bench_suite.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.ops import pallas_fft, permfft


def _perm_ref(x, axes):
    """numpy fftn with each transformed axis permuted to permfft order."""
    ref = np.fft.fftn(x, axes=axes)
    for ax in axes:
        p = permfft.perm_indices(x.shape[ax])
        ref = np.take(ref, p, axis=ax)
    return ref


@pytest.mark.parametrize("n", [8, 96, 255, 256, 384, 1024])
def test_permfft_axis_roundtrip(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)).astype(np.float32)
    r, i = permfft.fft_perm(jnp.asarray(x), None, axis=-1)
    ref = _perm_ref(x, (1,))
    got = np.asarray(r) + 1j * np.asarray(i)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)
    rr, ri = permfft.ifft_perm(r, i, axis=-1)
    np.testing.assert_allclose(np.asarray(rr), x, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(ri), 0, atol=3e-5 * scale)


@pytest.mark.parametrize("axes", [(0, 1), (1,), (0,)])
def test_permfft_nd_real(axes):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((96, 128)).astype(np.float32)
    r, i = permfft.rfftn_perm(jnp.asarray(x), axes)
    ref = _perm_ref(x, axes)
    got = np.asarray(r) + 1j * np.asarray(i)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)
    back = permfft.irfftn_perm(r, i, axes)
    np.testing.assert_allclose(np.asarray(back), x, atol=5e-5 * scale)


def test_permfft_pointwise_product_is_convolution():
    """The permuted order must be product-compatible: F(a)*F(b) then
    inverse equals circular convolution."""
    rng = np.random.default_rng(2)
    n = 384
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    ra, ia = permfft.fft_perm(jnp.asarray(a), None)
    rb, ib = permfft.fft_perm(jnp.asarray(b), None)
    pr = ra * rb - ia * ib
    pi = ra * ib + ia * rb
    out, _ = permfft.ifft_perm(pr, pi, real_out=True)
    ref = np.fft.ifft(np.fft.fft(a) * np.fft.fft(b)).real
    np.testing.assert_allclose(
        np.asarray(out), ref, atol=2e-4 * np.abs(ref).max()
    )


@pytest.mark.parametrize("variant", ["batched", "transpose"])
@pytest.mark.parametrize(
    "shape,ax", [((3, 384), -1), ((384, 128), 0), ((2, 384, 64), 1)]
)
def test_pallas_fft_axis_interpret(variant, shape, ax, monkeypatch):
    monkeypatch.setattr(pallas_fft, "SLOW_VARIANT", variant)
    rng = np.random.default_rng(3)
    n = shape[ax]
    x = rng.standard_normal(shape).astype(np.float32)
    r, i = pallas_fft.fft_axis(jnp.asarray(x), None, ax, interpret=True)
    ref = _perm_ref(x, (ax % x.ndim,))
    got = np.asarray(r) + 1j * np.asarray(i)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale)
    rr, _ = pallas_fft.fft_axis(
        r, i, ax, inverse=True, real_out=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(rr), x, atol=1e-4 * scale)


@pytest.mark.parametrize("shape", [(384, 512), (2, 384, 384)])
def test_pallas_fft2_interpret(shape):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    r, i = pallas_fft.fft2(jnp.asarray(x), None, interpret=True)
    ref = _perm_ref(x, (x.ndim - 2, x.ndim - 1))
    got = np.asarray(r) + 1j * np.asarray(i)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale)
    rr, _ = pallas_fft.fft2(
        r, i, inverse=True, real_out=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(rr), x, atol=1e-4 * scale)


def test_oaconvolve_pallas_fft1_path(monkeypatch):
    """The 1-D overlap-add blocks route through the axis-last Pallas
    FFT and match scipy when forced on (interpret mode on CPU)."""
    import scipy.signal as ss

    from cupyimg_tpu.scipy.signal import signaltools

    monkeypatch.setenv("CUPYIMG_TPU_USE_PALLAS_FFT", "1")
    monkeypatch.setattr(signaltools, "_PALLAS_FFT_MIN_POINTS", 0)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(20000).astype(np.float32)
    h = rng.standard_normal(257).astype(np.float32)
    blocks = jnp.asarray(x[:19968].reshape(-1, 384))  # (52, 384)
    hb = jnp.asarray(h)[None]
    assert signaltools._pallas_fft1_applies(blocks, hb, [1], [640])
    got = np.asarray(
        signaltools._pallas_fft1_real_conv(blocks, hb, [1], [640])
    )[:, : 384 + 257 - 1]
    ref = np.stack(
        [ss.fftconvolve(row, h, mode="full") for row in np.asarray(blocks)]
    )
    np.testing.assert_allclose(got, ref, atol=5e-4 * np.abs(ref).max())
    # end-to-end through oaconvolve as well
    out = np.asarray(signaltools.oaconvolve(
        jnp.asarray(x), jnp.asarray(h), mode="same"))
    ref2 = ss.oaconvolve(x, h, mode="same")
    np.testing.assert_allclose(out, ref2, atol=5e-4 * np.abs(ref2).max())


def test_fftconvolve_pallas_path(monkeypatch):
    """fftconvolve dispatches to the fused Pallas pipeline and matches
    scipy when forced on (interpret mode on CPU)."""
    import scipy.signal as ss

    from cupyimg_tpu.scipy.signal import signaltools

    monkeypatch.setenv("CUPYIMG_TPU_USE_PALLAS_FFT", "1")
    monkeypatch.setattr(signaltools, "_PALLAS_FFT_MIN_POINTS", 0)
    rng = np.random.default_rng(5)
    a = rng.standard_normal((270, 260)).astype(np.float32)
    b = rng.standard_normal((31, 17)).astype(np.float32)
    # fshape -> (384, 384) via 5-smooth on CPU... force exercising the
    # dispatcher: both sizes must satisfy fft2_applies or fall through.
    fshape = [
        signaltools.next_fast_len(270 + 31 - 1),
        signaltools.next_fast_len(260 + 17 - 1),
    ]
    applies = pallas_fft.fft2_applies(fshape[0], fshape[1])
    got = np.asarray(signaltools.fftconvolve(a, b, mode="same"))
    ref = ss.fftconvolve(a, b, mode="same")
    np.testing.assert_allclose(got, ref, atol=5e-4 * np.abs(ref).max())
    if applies:
        # and the dedicated helper path agrees as well
        out = np.asarray(
            signaltools._pallas_fft2_real_conv(
                jnp.asarray(a), jnp.asarray(b), (0, 1), fshape
            )
        )[: 270 + 31 - 1, : 260 + 17 - 1]
        full = ss.fftconvolve(a, b, mode="full")
        np.testing.assert_allclose(
            out, full, atol=5e-4 * np.abs(full).max()
        )


@pytest.mark.parametrize("n", [8, 255, 256, 384, 1024])
def test_neg_bins_is_frequency_negation(n):
    """neg_bins reindexes the permuted spectrum to bin -k: for a real
    signal, conj(neg_bins(F)) == F (Hermitian symmetry)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    r, i = permfft.fft_perm(jnp.asarray(x), None, axis=0)
    gr = np.asarray(permfft.neg_bins(r, 0))
    gi = np.asarray(permfft.neg_bins(i, 0))
    scale = np.abs(np.asarray(r)).max()
    np.testing.assert_allclose(gr, np.asarray(r), atol=1e-5 * scale)
    np.testing.assert_allclose(gi, -np.asarray(i), atol=1e-5 * scale)


def test_fftconvolve_packed_two_for_one(monkeypatch):
    """Equal padded shapes take the packed (one complex forward FFT)
    product path and still match scipy (interpret mode on CPU)."""
    import scipy.signal as ss

    from cupyimg_tpu.scipy.signal import signaltools

    monkeypatch.setenv("CUPYIMG_TPU_USE_PALLAS_FFT", "1")
    monkeypatch.setattr(signaltools, "_PALLAS_FFT_MIN_POINTS", 0)
    rng = np.random.default_rng(8)
    a = rng.standard_normal((300, 280)).astype(np.float32)
    b = rng.standard_normal((29, 23)).astype(np.float32)
    fshape = [
        signaltools.next_fast_len(300 + 29 - 1),
        signaltools.next_fast_len(280 + 23 - 1),
    ]
    assert pallas_fft.fft2_applies(fshape[0], fshape[1])
    out = np.asarray(
        signaltools._pallas_fft2_real_conv(
            jnp.asarray(a), jnp.asarray(b), (0, 1), fshape
        )
    )[: 300 + 29 - 1, : 280 + 23 - 1]
    full = ss.fftconvolve(a, b, mode="full")
    np.testing.assert_allclose(out, full, atol=5e-4 * np.abs(full).max())
    # 1-D packed path: equal-shape operands
    x1 = rng.standard_normal(3000).astype(np.float32)
    h1 = rng.standard_normal(3000).astype(np.float32)
    got1 = np.asarray(signaltools.fftconvolve(
        jnp.asarray(x1), jnp.asarray(h1), mode="full"))
    ref1 = ss.fftconvolve(x1, h1, mode="full")
    np.testing.assert_allclose(got1, ref1, atol=1e-3 * np.abs(ref1).max())


def test_fftconvolve_small_kernel_direct_dft(monkeypatch):
    """A second operand with every transformed extent <= _SMALL_DFT_MAX
    takes the direct-DFT matmul path (no full FFT of the kernel, no
    neg_bins product) and matches scipy in both 1-D and 2-D."""
    import scipy.signal as ss

    from cupyimg_tpu.scipy.signal import signaltools

    monkeypatch.setenv("CUPYIMG_TPU_USE_PALLAS_FFT", "1")
    monkeypatch.setattr(signaltools, "_PALLAS_FFT_MIN_POINTS", 0)
    rng = np.random.default_rng(11)

    # 2-D: kernel (13, 31) <= 128 on both axes -> small2 path
    a = rng.standard_normal((300, 280)).astype(np.float32)
    b = rng.standard_normal((13, 31)).astype(np.float32)
    fshape = [
        signaltools.next_fast_len(300 + 13 - 1),
        signaltools.next_fast_len(280 + 31 - 1),
    ]
    assert pallas_fft.fft2_applies(fshape[0], fshape[1])
    out = np.asarray(
        signaltools._pallas_fft2_real_conv(
            jnp.asarray(a), jnp.asarray(b), (0, 1), fshape
        )
    )[: 300 + 13 - 1, : 280 + 31 - 1]
    full = ss.fftconvolve(a, b, mode="full")
    np.testing.assert_allclose(out, full, atol=5e-4 * np.abs(full).max())

    # 1-D batched: kernel length 63 -> small2 path through fft_axis
    x1 = rng.standard_normal((4, 2000)).astype(np.float32)
    h1 = rng.standard_normal((1, 63)).astype(np.float32)
    n1 = signaltools.next_fast_len(2000 + 63 - 1)
    if pallas_fft.can_handle(n1):
        got1 = np.asarray(
            signaltools._pallas_fft1_real_conv(
                jnp.asarray(x1), jnp.asarray(h1), (1,), (n1,)
            )
        )[:, : 2000 + 63 - 1]
        ref1 = np.stack([ss.fftconvolve(r, h1[0], mode="full") for r in x1])
        np.testing.assert_allclose(
            got1, ref1, atol=5e-4 * np.abs(ref1).max()
        )

    # large kernel (> _SMALL_DFT_MAX) still falls through and agrees
    bL = rng.standard_normal((150, 9)).astype(np.float32)
    gotL = np.asarray(signaltools.fftconvolve(
        jnp.asarray(a), jnp.asarray(bL), mode="same"))
    refL = ss.fftconvolve(a, bL, mode="same")
    np.testing.assert_allclose(gotL, refL, atol=1e-3 * np.abs(refL).max())
