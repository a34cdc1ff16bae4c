"""Coverage for public functions no other test exercises: reference
parity checked against scipy/numpy oracles, closed-form math, or golden
values from the upstream docstrings (SURVEY.md §4 tier 1/3 style)."""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax.numpy as jnp

import cupyimg_tpu.numpy as cnp
import cupyimg_tpu.scipy.ndimage as ndi
import cupyimg_tpu.scipy.signal as sig
import cupyimg_tpu.skimage.color as color
import cupyimg_tpu.skimage.exposure as exposure
import cupyimg_tpu.skimage.feature as feature
import cupyimg_tpu.skimage.filters as filters
import cupyimg_tpu.skimage.measure as measure
import cupyimg_tpu.skimage.morphology as morph
import cupyimg_tpu.skimage.segmentation as seg
import cupyimg_tpu.skimage.transform as transform
import cupyimg_tpu.skimage.util as util


def _img(shape=(24, 25), seed=0, dtype=np.float32):
    return np.random.RandomState(seed).rand(*shape).astype(dtype)


# ---------------------------------------------------------------- ndimage

def test_generic_gradient_magnitude_vs_scipy():
    x = _img()
    got = ndi.generic_gradient_magnitude(jnp.asarray(x), ndi.sobel)
    exp = sndi.generic_gradient_magnitude(x, sndi.sobel)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5, atol=1e-5)


def test_sum_labels_is_sum():
    x = _img((10, 11))
    labels = (np.arange(110).reshape(10, 11) % 4).astype(np.int32)
    got = ndi.sum_labels(jnp.asarray(x), jnp.asarray(labels), index=[1, 2])
    exp = sndi.sum_labels(x, labels, index=[1, 2])
    np.testing.assert_allclose(np.asarray(got, dtype=float), exp, rtol=1e-6)


# ----------------------------------------------------------------- signal

@pytest.mark.parametrize("up,down,n,lh", [(1, 1, 10, 3), (2, 3, 50, 7),
                                          (7, 2, 33, 12), (3, 5, 8, 21)])
def test_upfirdn_out_len_matches_output(up, down, n, lh):
    h = np.arange(1.0, lh + 1.0)
    x = np.arange(1.0, n + 1.0)
    out = sig.upfirdn(jnp.asarray(h), jnp.asarray(x), up=up, down=down)
    assert sig.upfirdn_out_len(lh, n, up, down) == np.asarray(out).shape[-1]


# ------------------------------------------------------------------ numpy

def test_histogram2d_vs_numpy():
    rng = np.random.RandomState(1)
    x, y = rng.randn(500), rng.randn(500)
    got_h, got_ex, got_ey = cnp.histogram2d(jnp.asarray(x), jnp.asarray(y),
                                            bins=(8, 9))
    exp_h, exp_ex, exp_ey = np.histogram2d(x, y, bins=(8, 9))
    np.testing.assert_allclose(np.asarray(got_h), exp_h)
    np.testing.assert_allclose(np.asarray(got_ex), exp_ex, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ey), exp_ey, rtol=1e-6)


def test_histogramdd_vs_numpy():
    rng = np.random.RandomState(2)
    pts = rng.rand(300, 3)
    got_h, got_e = cnp.histogramdd(jnp.asarray(pts), bins=(4, 5, 6))
    exp_h, exp_e = np.histogramdd(pts, bins=(4, 5, 6))
    np.testing.assert_allclose(np.asarray(got_h), exp_h)
    for ge, ee in zip(got_e, exp_e):
        np.testing.assert_allclose(np.asarray(ge), ee, rtol=1e-6)


def test_histogramdd_weights_range():
    rng = np.random.RandomState(3)
    pts = rng.rand(200, 2) * 4 - 1
    w = rng.rand(200)
    r = [(0.0, 2.0), (-0.5, 1.5)]
    got_h, _ = cnp.histogramdd(jnp.asarray(pts), bins=5, range=r,
                               weights=jnp.asarray(w))
    exp_h, _ = np.histogramdd(pts, bins=5, range=r, weights=w)
    np.testing.assert_allclose(np.asarray(got_h), exp_h, rtol=1e-6)


# ------------------------------------------------------------------ color

def test_stain_separation_roundtrip():
    rgb = np.clip(_img((6, 7, 3), seed=4) * 0.8 + 0.1, 0.05, 0.95)
    for sep_m, com_m in [
        (color.hed_from_rgb, color.rgb_from_hed),
        (color.hdx_from_rgb, color.rgb_from_hdx),
        (color.bpx_from_rgb, color.rgb_from_bpx),
        (color.ahx_from_rgb, color.rgb_from_ahx),
        (color.gdx_from_rgb, color.rgb_from_gdx),
    ]:
        stains = color.separate_stains(jnp.asarray(rgb), jnp.asarray(sep_m))
        back = color.combine_stains(stains, jnp.asarray(com_m))
        np.testing.assert_allclose(np.asarray(back), rgb, atol=2e-3)


def test_hed_rgb_named_roundtrip():
    rgb = np.clip(_img((5, 5, 3), seed=5), 0.05, 0.95)
    back = color.hed2rgb(color.rgb2hed(jnp.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(back), rgb, atol=2e-3)


def test_lab_luv_roundtrips():
    rgb = np.clip(_img((6, 6, 3), seed=6), 0.02, 0.98)
    np.testing.assert_allclose(
        np.asarray(color.lab2rgb(color.rgb2lab(jnp.asarray(rgb)))),
        rgb, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(color.luv2rgb(color.rgb2luv(jnp.asarray(rgb)))),
        rgb, atol=1e-4)


def test_get_xyz_coords_d65():
    # D65 2-degree whitepoint (colorconv.py illuminant table)
    xyz = np.asarray(color.get_xyz_coords("D65", "2"))
    np.testing.assert_allclose(xyz, [0.95047, 1.0, 1.08883], atol=1e-4)


def test_gray2rgba_and_grey_alias():
    x = _img((4, 5))
    out = np.asarray(color.gray2rgba(jnp.asarray(x), alpha=0.5))
    assert out.shape == (4, 5, 4)
    np.testing.assert_allclose(out[..., :3],
                               np.stack([x] * 3, axis=-1), rtol=1e-6)
    np.testing.assert_allclose(out[..., 3], 0.5)
    rgb = _img((4, 5, 3), seed=7)
    np.testing.assert_allclose(np.asarray(color.rgb2grey(jnp.asarray(rgb))),
                               np.asarray(color.rgb2gray(jnp.asarray(rgb))))


def test_deltaE_ciede94_closed_form():
    lab1 = np.array([[[50.0, 2.6772, -79.7751]]])
    lab2 = np.array([[[50.0, 0.0, -82.7485]]])
    got = float(np.asarray(color.deltaE_ciede94(jnp.asarray(lab1),
                                                jnp.asarray(lab2)))[0, 0])
    # closed form (Sharma's CIE94 for the CIEDE2000 test pair #1)
    L1, a1, b1 = lab1[0, 0]
    L2, a2, b2 = lab2[0, 0]
    C1 = np.hypot(a1, b1)
    C2 = np.hypot(a2, b2)
    dC = C1 - C2
    dH2 = (a1 - a2) ** 2 + (b1 - b2) ** 2 - dC**2
    exp = np.sqrt((L1 - L2) ** 2 + (dC / (1 + 0.045 * C1)) ** 2
                  + dH2 / (1 + 0.015 * C1) ** 2)
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_adapt_rgb_each_channel_and_hsv_value():
    from cupyimg_tpu.skimage.color.adapt_rgb import (
        adapt_rgb, each_channel, hsv_value)

    @adapt_rgb(each_channel)
    def double(image):
        return image * 2

    rgb = _img((4, 5, 3), seed=8)
    np.testing.assert_allclose(np.asarray(double(jnp.asarray(rgb))),
                               rgb * 2, rtol=1e-6)

    @adapt_rgb(hsv_value)
    def negate_value(image):
        return 1.0 - image

    out = np.asarray(negate_value(jnp.asarray(rgb)))
    hsv_in = np.asarray(color.rgb2hsv(jnp.asarray(rgb)))
    hsv_out = np.asarray(color.rgb2hsv(jnp.asarray(out)))
    # hue/saturation preserved where defined, value negated
    np.testing.assert_allclose(hsv_out[..., 2], 1.0 - hsv_in[..., 2],
                               atol=1e-5)


# --------------------------------------------------------------- exposure

def test_intensity_range_modes():
    x = np.array([[-5.0, 0.0, 10.0]])
    lo, hi = exposure.intensity_range(jnp.asarray(x), "image")
    assert (float(lo), float(hi)) == (-5.0, 10.0)
    # clip_negative only applies to range_values='dtype' (skimage parity)
    lo, hi = exposure.intensity_range(jnp.asarray(x), "image",
                                      clip_negative=True)
    assert (float(lo), float(hi)) == (-5.0, 10.0)
    lo, hi = exposure.intensity_range(jnp.asarray(x), (2.0, 3.0))
    assert (float(lo), float(hi)) == (2.0, 3.0)
    xu = np.array([[3, 250]], np.uint8)
    lo, hi = exposure.intensity_range(jnp.asarray(xu), "dtype")
    assert (float(lo), float(hi)) == (0.0, 255.0)


# ---------------------------------------------------------------- feature

def test_structure_tensor_on_ramp():
    # f = 2r + 3c: skimage's derivatives are UNnormalized sobel
    # ([-1,0,1] x [1,2,1] => slope*8), so grad = (16, 24) in the
    # interior: A = [[256, 384], [384, 576]], eigenvalues (832, 0).
    r, c = np.mgrid[0:20, 0:21].astype(np.float64)
    x = jnp.asarray(2.0 * r + 3.0 * c)
    Arr, Arc, Acc = feature.structure_tensor(x, sigma=1.0, mode="reflect",
                                             order="rc")
    sl = (slice(5, -5), slice(5, -5))
    np.testing.assert_allclose(np.asarray(Arr)[sl], 256.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Arc)[sl], 384.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Acc)[sl], 576.0, rtol=1e-5)
    l1, l2 = feature.structure_tensor_eigenvalues((Arr, Arc, Acc))
    np.testing.assert_allclose(np.asarray(l1)[sl], 832.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l2)[sl], 0.0, atol=1e-4)
    # deprecated xy-order variant agrees with the rc eigenvalues
    e1, e2 = feature.structure_tensor_eigvals(Acc, Arc, Arr)
    np.testing.assert_allclose(np.asarray(e1)[sl], 832.0, rtol=1e-5)


def test_hessian_matrix_on_quadratic():
    # f = a r^2 + b r c + c0 c^2 has constant Hessian [[2a, b], [b, 2c0]];
    # gaussian smoothing preserves second derivatives of a quadratic.
    r, c = np.mgrid[0:24, 0:25].astype(np.float64)
    a, b, c0 = 1.5, 0.75, -0.5
    x = jnp.asarray(a * r * r + b * r * c + c0 * c * c)
    Hrr, Hrc, Hcc = feature.hessian_matrix(x, sigma=1.5, order="rc")
    sl = (slice(8, -8), slice(8, -8))
    # skimage quirk (kept for parity): order='rc' REVERSES the axes, so
    # the first element is the second derivative along the LAST axis
    np.testing.assert_allclose(np.asarray(Hrr)[sl], 2 * c0, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(Hrc)[sl], b, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(Hcc)[sl], 2 * a, rtol=1e-3)
    l1, l2 = feature.hessian_matrix_eigvals((Hrr, Hrc, Hcc))
    H = np.array([[2 * a, b], [b, 2 * c0]])
    ev = np.linalg.eigvalsh(H)[::-1]
    np.testing.assert_allclose(np.asarray(l1)[sl], ev[0], rtol=1e-3)
    np.testing.assert_allclose(np.asarray(l2)[sl], ev[1], rtol=1e-3)


def test_hessian_matrix_det_flat_is_zero():
    x = jnp.asarray(np.full((16, 16), 3.7))
    det = np.asarray(feature.hessian_matrix_det(x, sigma=1.0))
    # integral-image (SURF) approximation: boundary pixels see padding,
    # so only the interior is exactly flat
    np.testing.assert_allclose(det[4:-4, 4:-4], 0.0, atol=1e-8)


def _corner_image():
    x = np.zeros((30, 30), np.float64)
    x[:15, :15] = 1.0
    return x


@pytest.mark.parametrize("fn", ["corner_kitchen_rosenfeld"])
def test_corner_kitchen_rosenfeld_peaks_at_corner(fn):
    resp = np.abs(np.asarray(getattr(feature, fn)(jnp.asarray(
        _corner_image()))))
    # response should be strongest near the inner corner (14,14) and
    # (approximately) zero in flat regions
    peak = np.unravel_index(np.argmax(resp[3:-3, 3:-3]), resp[3:-3, 3:-3].shape)
    peak = (peak[0] + 3, peak[1] + 3)
    assert abs(peak[0] - 14) <= 2 and abs(peak[1] - 14) <= 2
    assert resp[25, 25] < 1e-8


def test_corner_foerstner_shapes_and_range():
    w, q = feature.corner_foerstner(jnp.asarray(_corner_image()))
    w, q = np.asarray(w), np.asarray(q)
    assert w.shape == (30, 30) and q.shape == (30, 30)
    assert np.all(q >= -1e-9) and np.all(q <= 1 + 1e-9)
    # roundness q peaks near the isotropic corner
    assert q[14, 14] > q[14, 25]


# ---------------------------------------------------------------- filters

def test_directional_edge_filters_split():
    x = _img((20, 22), seed=9, dtype=np.float64)
    xj = jnp.asarray(x)
    for h, v, full in [
        (filters.prewitt_h, filters.prewitt_v, filters.prewitt),
        (filters.scharr_h, filters.scharr_v, filters.scharr),
        (filters.farid_h, filters.farid_v, filters.farid),
    ]:
        eh = np.asarray(h(xj))
        ev = np.asarray(v(xj))
        ef = np.asarray(full(xj))
        sl = (slice(3, -3), slice(3, -3))
        np.testing.assert_allclose(
            np.sqrt(eh**2 + ev**2)[sl] / np.sqrt(2), ef[sl],
            rtol=1e-4, atol=1e-7)


def test_prewitt_h_is_separable_correlate():
    x = _img((16, 17), seed=10, dtype=np.float64)
    k = np.outer([1, 0, -1], [1, 1, 1]) / 3.0  # skimage HPREWITT_WEIGHTS
    exp = sndi.convolve(x, k, mode="reflect")
    got = np.asarray(filters.prewitt_h(jnp.asarray(x)))
    np.testing.assert_allclose(got[1:-1, 1:-1], exp[1:-1, 1:-1],
                               rtol=1e-6, atol=1e-10)


def test_roberts_diagonals():
    x = _img((14, 15), seed=11, dtype=np.float64)
    xj = jnp.asarray(x)
    pd = np.asarray(filters.roberts_pos_diag(xj))
    ndg = np.asarray(filters.roberts_neg_diag(xj))
    full = np.asarray(filters.roberts(xj))
    sl = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose((np.sqrt(pd**2 + ndg**2) / np.sqrt(2))[sl],
                               full[sl], rtol=1e-5)


def test_rank_order_golden():
    # upstream _rank_order.py docstring example
    x = jnp.asarray(np.array([[1, 4, 5], [4, 4, 1], [5, 1, 1]]))
    labels, orig = filters.rank_order(x)
    np.testing.assert_array_equal(np.asarray(labels),
                                  [[0, 1, 2], [1, 1, 0], [2, 0, 0]])
    np.testing.assert_array_equal(np.asarray(orig), [1, 4, 5])


def test_lpi_filter2d_forward_and_inverse():
    from cupyimg_tpu.skimage.filters import LPIFilter2D, inverse, wiener

    def impulse_response(r, c):
        return np.e ** (-(r**2 + c**2) / (2 * 1.5**2))

    f = LPIFilter2D(impulse_response)
    x = _img((32, 32), seed=12, dtype=np.float64)
    blurred = f(jnp.asarray(x))
    assert np.asarray(blurred).shape == (32, 32)
    # inverse filtering of the blur should approximately restore the
    # low-frequency content: correlation with the original increases
    restored = inverse(blurred, predefined_filter=f)
    assert np.asarray(restored).shape == (32, 32)
    wrest = wiener(blurred, predefined_filter=f)
    assert np.isfinite(np.asarray(wrest)).all()


def test_compute_hessian_eigenvalues_flat():
    from cupyimg_tpu.skimage.filters.ridges import (
        compute_hessian_eigenvalues)

    x = jnp.asarray(np.full((20, 21), 2.0))
    ev = np.asarray(compute_hessian_eigenvalues(x, sigma=1.0,
                                                sorting="abs"))
    # skimage-parity mode='constant' pads zeros, creating step edges at
    # the borders; the truncated gaussian reaches 4*sigma in, so only
    # the deep interior is flat (modulo f32 noise)
    np.testing.assert_allclose(ev[:, 6:-6, 6:-6], 0.0, atol=1e-3)


# ---------------------------------------------------------------- measure

def test_block_reduce_sum_and_mean():
    x = _img((12, 15), seed=13, dtype=np.float64)
    got = np.asarray(measure.block_reduce(jnp.asarray(x), (3, 5)))
    exp = x.reshape(4, 3, 3, 5).sum(axis=(1, 3))
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    got = np.asarray(measure.block_reduce(jnp.asarray(x), (3, 5),
                                          func=jnp.mean))
    np.testing.assert_allclose(got, exp / 15.0, rtol=1e-6)


def test_block_reduce_pads_with_cval():
    x = np.ones((5, 5))
    got = np.asarray(measure.block_reduce(jnp.asarray(x), (3, 3), cval=2))
    # padded to 6x6 with cval=2: each edge block gains a padded row or
    # column of three 2s in place of ones
    exp = np.array([[9.0, 12.0], [12.0, 14.0]])
    np.testing.assert_allclose(got, exp)


def test_moments_coords_central_matches_dense():
    img = np.zeros((10, 11))
    img[2:7, 3:9] = 1.0
    img[4, 5] = 3.0
    coords = np.argwhere(img > 0)
    # replicate weights by repeating the (4,5) coordinate 3x
    coords_w = np.concatenate([coords, [[4, 5]], [[4, 5]]])
    got = np.asarray(measure.moments_coords_central(jnp.asarray(coords_w),
                                                    order=3))
    exp = np.asarray(measure.moments_central(jnp.asarray(img), order=3))
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------- morphology

def test_octahedron_closed_form():
    o = np.asarray(morph.octahedron(3)).astype(bool)
    Z, Y, X = np.mgrid[-3:4, -3:4, -3:4]
    np.testing.assert_array_equal(o, np.abs(X) + np.abs(Y) + np.abs(Z) <= 3)


def test_convex_hull_image_properties():
    img = np.zeros((25, 25), bool)
    img[5, 5] = img[5, 19] = img[19, 5] = img[19, 19] = True
    hull = np.asarray(morph.convex_hull_image(jnp.asarray(img)))
    # hull of 4 rectangle corners is the filled rectangle
    exp = np.zeros_like(img)
    exp[5:20, 5:20] = True
    np.testing.assert_array_equal(hull, exp)
    # triangle: hull contains input, is convex row-wise, idempotent-ish
    img2 = np.zeros((20, 20), bool)
    img2[3, 3] = img2[3, 16] = img2[16, 3] = True
    hull2 = np.asarray(morph.convex_hull_image(jnp.asarray(img2)))
    assert hull2[img2].all()
    for row in hull2:
        on = np.flatnonzero(row)
        if on.size:
            assert (np.diff(on) == 1).all()  # contiguous run => convex row


# ------------------------------------------------------------ segmentation

def test_circle_level_set_golden():
    ls = np.asarray(seg.circle_level_set((7, 9), center=(3, 4), radius=2.5))
    I, J = np.mgrid[0:7, 0:9]
    exp = (np.sqrt((I - 3.0) ** 2 + (J - 4.0) ** 2) <= 2.5).astype(np.int8)
    np.testing.assert_array_equal(ls, exp)


# -------------------------------------------------------------- transform

def test_polynomial_transform_recovers_affine():
    rng = np.random.RandomState(14)
    src = rng.rand(40, 2) * 20
    A = np.array([[1.1, 0.2], [-0.15, 0.9]])
    dst = src @ A.T + [2.0, -3.0]
    t = transform.PolynomialTransform()
    assert t.estimate(jnp.asarray(src), jnp.asarray(dst), order=2)
    got = np.asarray(t(jnp.asarray(src)))
    np.testing.assert_allclose(got, dst, atol=1e-6)


def test_warp_coords_matches_manual():
    def shift_map(xy):
        return xy - jnp.asarray([2.5, 1.5])

    coords = np.asarray(transform.warp_coords(shift_map, (5, 6)))
    assert coords.shape == (2, 5, 6)
    r, c = np.mgrid[0:5, 0:6]
    # warp_coords maps output (col,row) pairs through coord_map
    np.testing.assert_allclose(coords[0], r - 1.5, atol=1e-6)
    np.testing.assert_allclose(coords[1], c - 2.5, atol=1e-6)


def test_pyramid_reduce_shapes_and_dc():
    x = np.full((32, 33), 5.0, np.float64)
    out = np.asarray(transform.pyramid_reduce(jnp.asarray(x), downscale=2))
    assert out.shape == (16, 17)
    np.testing.assert_allclose(out, 5.0, rtol=1e-6)


def test_pyramid_gaussian_sequence():
    x = _img((32, 32), seed=15, dtype=np.float64)
    layers = list(transform.pyramid_gaussian(jnp.asarray(x), max_layer=2,
                                             downscale=2))
    assert [np.asarray(l).shape for l in layers] == [
        (32, 32), (16, 16), (8, 8)]


# ------------------------------------------------------------------- util

def test_dtype_limits():
    assert util.dtype_limits(jnp.zeros((2,), jnp.uint8)) == (0, 255)
    assert util.dtype_limits(jnp.zeros((2,), jnp.int16),
                             clip_negative=True) == (0, 32767)
    lo, hi = util.dtype_limits(jnp.zeros((2,), jnp.float32))
    assert lo == -1 and hi == 1


def test_img_as_float32_and_64():
    xu = np.array([0, 128, 255], np.uint8)
    f32 = np.asarray(util.img_as_float32(jnp.asarray(xu)))
    assert f32.dtype == np.float32
    np.testing.assert_allclose(f32, [0.0, 128 / 255.0, 1.0], rtol=1e-6)
    f64 = np.asarray(util.img_as_float64(jnp.asarray(xu)))
    assert f64.dtype == np.float64
    np.testing.assert_allclose(f64, [0.0, 128 / 255.0, 1.0], rtol=1e-12)


def test_array_map_getitem():
    in_vals = jnp.asarray(np.array([1, 4, 7], np.int64))
    out_vals = jnp.asarray(np.array([10, 40, 70], np.int64))
    amap = util.ArrayMap(in_vals, out_vals)
    got = np.asarray(amap[jnp.asarray(np.array([[7, 1], [4, 0]], np.int64))])
    np.testing.assert_array_equal(got, [[70, 10], [40, 0]])
    # len is one more than the max remapped label (reference
    # _map_array.py:139-141)
    assert len(amap) == 8


def test_value_indices_vs_scipy():
    rng = np.random.RandomState(131)
    a = (rng.rand(6, 7) * 4).astype(np.int32)
    got = ndi.value_indices(jnp.asarray(a))
    exp = sndi.value_indices(a)
    assert sorted(got) == sorted(exp)
    for k in exp:
        for gi, ei in zip(got[k], exp[k]):
            np.testing.assert_array_equal(gi, ei)
    got = ndi.value_indices(jnp.asarray(a), ignore_value=1)
    assert 1 not in got
    with pytest.raises(ValueError):
        ndi.value_indices(jnp.asarray(a.astype(np.float64)))


def test_geometric_transform_vs_scipy():
    x = np.arange(20.0).reshape(4, 5)

    def mapping(out):
        return (out[0] - 0.7, out[1] + 0.4)

    for order in (0, 1, 3):
        got = np.asarray(ndi.geometric_transform(jnp.asarray(x), mapping,
                                                 order=order))
        exp = sndi.geometric_transform(x, mapping, order=order)
        np.testing.assert_allclose(got, exp, atol=1e-8)

    def mapping2(out, dy, dx=0.0):
        return (out[0] - dy, out[1] - dx)

    got = np.asarray(ndi.geometric_transform(
        jnp.asarray(x), mapping2, output_shape=(3, 7), order=1,
        mode="nearest", extra_arguments=(0.5,),
        extra_keywords={"dx": 1.5}))
    exp = sndi.geometric_transform(
        x, mapping2, output_shape=(3, 7), order=1, mode="nearest",
        extra_arguments=(0.5,), extra_keywords={"dx": 1.5})
    np.testing.assert_allclose(got, exp, atol=1e-12)
