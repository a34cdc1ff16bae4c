"""Recover the restoration-test input image from the camera_wiener golden.

The wiener golden is clip(W(data)) where W is an invertible linear filter
(Wiener-Hunt, balance=0.05, Laplacian reg). Only 110 pixels are clipped at
1.0; everywhere else the golden IS W(data). We invert W with the clipped
overshoots as unknowns, estimated by demanding the recovered data match its
known structure data = smooth + s*n0 with n0 the seed-0 standard normal.
Validation: plain-numpy Richardson-Lucy (5 iters) on the recovered data must
reproduce the independent camera_rl golden at the reference test's rtol=1e-3.
"""
import math
import numpy as np
from numpy.fft import rfftn, irfftn


def ir2tf(imp, shape):
    irp = np.zeros(shape)
    irp[tuple(slice(0, s) for s in imp.shape)] = imp
    for axis, n in enumerate(imp.shape):
        irp = np.roll(irp, -math.floor(n / 2), axis=axis)
    return rfftn(irp)


def laplacian_tf(shape):
    impr = np.zeros((3, 3))
    impr[0, 1] = impr[2, 1] = impr[1, 0] = impr[1, 2] = -1.0
    impr[1, 1] = 4.0
    return ir2tf(impr, shape)


golden_w = np.load('/root/reference/cupyimg/skimage/restoration/tests/camera_wiener.npy')
golden_rl = np.load('/root/reference/cupyimg/skimage/restoration/tests/camera_rl.npy')
shape = golden_w.shape

psf = np.ones((5, 5)) / 25
H = ir2tf(psf, shape)
L = laplacian_tf(shape)
G = np.conj(H) / (np.abs(H) ** 2 + 0.05 * np.abs(L) ** 2)

clipped = golden_w >= 1.0
print('clipped:', clipped.sum())

# unitary scaling cancels in the roundtrip: data = irfft(rfft(x)/G)
def Winv(x):
    return irfftn(rfftn(x) / G, s=shape)

def W(d):
    return irfftn(rfftn(d) * G, s=shape)

x0 = golden_w.copy()
data0 = Winv(x0)

# sanity: W(data0) == golden at unclipped pixels
err = np.abs(W(data0) - golden_w)[~clipped].max()
print('roundtrip err (unclipped):', err)

# Known noise pattern: data = smooth + s * n0, seed 0
np.random.seed(0)
n0 = np.random.standard_normal(shape)

# Estimate s: project onto n0 (smooth part nearly orthogonal)
s_est = float((data0 * n0).sum() / (n0 * n0).sum())
print('s est (v=1):', s_est)

# RL with plain scipy, 5 iters
from scipy.signal import convolve as sconv

def rl(data, psf, iters=5):
    im = np.full(data.shape, 0.5)
    pm = psf[::-1, ::-1]
    for _ in range(iters):
        conv = sconv(im, psf, mode='same')
        im = im * sconv(data / conv, pm, mode='same')
    return np.clip(im, -1, 1)

out0 = rl(data0, psf)
relerr = np.abs(out0 - golden_rl) / np.maximum(np.abs(golden_rl), 1e-12)
print('RL v=1: max relerr', relerr.max(), 'frac>1e-3:', (relerr > 1e-3).mean())
np.save('/tmp/data0.npy', data0)

# ---- refine the 110 overshoots: data(v) = data0 + sum (v_k-1) Winv(e_k)
# prior: data - s*n0 = convolve2d(camera, psf, 'same') is spatially smooth
# => minimize ||Lap(data(v) - s*n0)||^2 over (v, s), linear least squares.
idx = np.argwhere(clipped)
NB = len(idx)

def lap(im):
    out = -4.0 * im
    out += np.roll(im, 1, 0) + np.roll(im, -1, 0)
    out += np.roll(im, 1, 1) + np.roll(im, -1, 1)
    return out

cols = []
for (i, j) in idx:
    e = np.zeros(shape)
    e[i, j] = 1.0
    cols.append(lap(Winv(e)).ravel())
cols.append(-lap(n0).ravel())
A = np.stack(cols, axis=1)
b = -lap(data0).ravel()
coef, *_ = np.linalg.lstsq(A, b, rcond=None)
v = 1.0 + coef[:NB]
s = coef[NB]
print('s refined:', s, 'v range:', v.min(), v.max())

delta = np.zeros(shape)
delta[clipped] = v - 1.0
data1 = data0 + Winv(delta)
out1 = rl(data1, psf)
relerr = np.abs(out1 - golden_rl) / np.maximum(np.abs(golden_rl), 1e-12)
print('RL refined: max relerr', relerr.max(), 'frac>1e-3:', (relerr > 1e-3).mean())
print('data1 range:', data1.min(), data1.max())
np.save('/tmp/data1.npy', data1)
