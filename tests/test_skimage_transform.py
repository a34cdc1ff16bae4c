"""skimage.transform tests (geometry identities, scipy-backed warps)."""

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.skimage.transform as tf


def _img(shape=(32, 37), seed=0):
    return np.random.RandomState(seed).rand(*shape)


class TestGeometric:
    def test_similarity_estimate_exact(self):
        rng = np.random.RandomState(0)
        src = rng.rand(10, 2) * 20
        t_true = tf.SimilarityTransform(
            scale=1.3, rotation=0.4, translation=(2.0, -3.0)
        )
        dst = np.asarray(t_true(src))
        t_est = tf.estimate_transform("similarity", src, dst)
        np.testing.assert_allclose(t_est.params, t_true.params, atol=1e-9)
        assert t_est.scale == pytest.approx(1.3)
        assert t_est.rotation == pytest.approx(0.4)

    def test_euclidean_estimate(self):
        rng = np.random.RandomState(1)
        src = rng.rand(8, 2) * 10
        t_true = tf.EuclideanTransform(rotation=-0.3, translation=(1.0, 4.0))
        dst = np.asarray(t_true(src))
        t_est = tf.estimate_transform("euclidean", src, dst)
        np.testing.assert_allclose(t_est.params, t_true.params, atol=1e-9)

    def test_affine_estimate(self):
        rng = np.random.RandomState(2)
        src = rng.rand(12, 2) * 10
        t_true = tf.AffineTransform(
            scale=(1.2, 0.9), rotation=0.2, shear=0.1, translation=(3, -2)
        )
        dst = np.asarray(t_true(src))
        t_est = tf.estimate_transform("affine", src, dst)
        np.testing.assert_allclose(t_est.params, t_true.params, atol=1e-8)

    def test_projective_estimate(self):
        rng = np.random.RandomState(3)
        src = rng.rand(10, 2) * 10
        m = np.array([[1.1, 0.2, 1.0], [-0.1, 0.95, 2.0], [0.001, 0.002, 1]])
        t_true = tf.ProjectiveTransform(m)
        dst = np.asarray(t_true(src))
        t_est = tf.estimate_transform("projective", src, dst)
        np.testing.assert_allclose(
            t_est.params / t_est.params[2, 2], m / m[2, 2], atol=1e-6
        )

    def test_inverse_roundtrip(self):
        t = tf.AffineTransform(scale=(1.5, 0.7), rotation=0.3,
                               translation=(5, 6))
        pts = np.random.RandomState(4).rand(7, 2) * 10
        back = np.asarray(t.inverse(np.asarray(t(pts))))
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_compose(self):
        t1 = tf.SimilarityTransform(scale=2.0)
        t2 = tf.SimilarityTransform(translation=(1, 2))
        t = t1 + t2
        pts = np.array([[1.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(t(pts)), [[3.0, 4.0]], atol=1e-12
        )

    def test_polynomial_estimate(self):
        rng = np.random.RandomState(5)
        src = rng.rand(20, 2) * 10
        t_true = tf.AffineTransform(scale=(1.1, 0.9), translation=(1, 2))
        dst = np.asarray(t_true(src))
        t_poly = tf.estimate_transform("polynomial", src, dst, order=1)
        np.testing.assert_allclose(
            np.asarray(t_poly(src)), dst, atol=1e-7
        )

    def test_fundamental_epipolar_constraint(self):
        rng = np.random.RandomState(6)
        # synthetic stereo pair: 3D points projected into two views
        pts3 = rng.rand(20, 3) * 5 + np.array([0, 0, 10])
        R = tf.EuclideanTransform(rotation=0.1).params[:2, :2]
        R3 = np.eye(3)
        R3[:2, :2] = R
        t = np.array([1.0, 0.2, 0.1])
        src = pts3[:, :2] / pts3[:, 2:]
        cam2 = (pts3 @ R3.T) + t
        dst = cam2[:, :2] / cam2[:, 2:]
        f = tf.FundamentalMatrixTransform()
        assert f.estimate(src, dst)
        res = f.residuals(src, dst)
        assert np.max(np.abs(res)) < 1e-6

    def test_essential_matrix_construction(self):
        R = np.eye(3)
        t = np.array([1.0, 0, 0])
        e = tf.EssentialMatrixTransform(rotation=R, translation=t)
        assert e.params.shape == (3, 3)

    def test_matrix_transform(self):
        m = np.eye(3)
        m[0, 2] = 2
        out = np.asarray(tf.matrix_transform([[1.0, 1.0]], m))
        np.testing.assert_allclose(out, [[3.0, 1.0]], atol=1e-12)


class TestWarps:
    def test_warp_identity(self):
        x = _img()
        out = np.asarray(tf.warp(x, tf.AffineTransform()))
        np.testing.assert_allclose(out, x, atol=1e-9)

    def test_warp_translation_matches_shift(self):
        x = _img()
        t = tf.AffineTransform(translation=(2, 3))  # x=col shift 2, row 3
        out = np.asarray(tf.warp(x, t, order=1))
        exp = sndi.shift(x, (-3, -2), order=1, mode="constant")
        np.testing.assert_allclose(out, exp, atol=1e-8)

    def test_warp_coords_array(self):
        x = _img()
        rows, cols = np.meshgrid(
            np.arange(32), np.arange(37), indexing="ij"
        )
        coords = np.stack([rows + 1.5, cols], 0)
        out = np.asarray(tf.warp(x, coords, order=1))
        exp = sndi.shift(x, (-1.5, 0), order=1, mode="constant")
        np.testing.assert_allclose(out, exp, atol=1e-8)

    def test_rotate_90(self):
        x = _img()
        out = np.asarray(tf.rotate(x, 90.0, resize=True, order=0))
        assert out.shape == (37, 32)

    def test_rotate_matches_scipy(self):
        x = _img((40, 40), 1)
        got = np.asarray(tf.rotate(x, 35.0, order=1))
        exp = sndi.rotate(x, 35.0, reshape=False, order=1)
        interior = (slice(12, 28), slice(12, 28))
        np.testing.assert_allclose(got[interior], exp[interior], atol=1e-12)

    def test_rotate_roundtrip_smooth(self):
        r, c = np.mgrid[0:40, 0:40]
        x = np.sin(r / 6.0) * np.cos(c / 7.0) * 0.5 + 0.5
        out = np.asarray(
            tf.rotate(tf.rotate(x, 35.0, order=3), -35.0, order=3)
        )
        interior = (slice(14, 26), slice(14, 26))
        np.testing.assert_allclose(out[interior], x[interior], atol=0.01)

    def test_resize_downsample(self):
        x = _img((32, 32), 2)
        out = np.asarray(tf.resize(x, (16, 16)))
        assert out.shape == (16, 16)
        assert abs(out.mean() - x.mean()) < 0.01

    def test_resize_upsample_exact_for_constant(self):
        x = np.full((8, 8), 0.7)
        out = np.asarray(tf.resize(x, (16, 16), order=1))
        np.testing.assert_allclose(out, 0.7, atol=1e-9)

    def test_rescale(self):
        x = _img((20, 30), 3)
        out = np.asarray(tf.rescale(x, 0.5))
        assert out.shape == (10, 15)

    def test_rescale_multichannel(self):
        x = _img((20, 30), 4)[..., None] * np.ones(3)
        out = np.asarray(tf.rescale(x, 0.5, multichannel=True))
        assert out.shape == (10, 15, 3)

    def test_swirl_roundtrip_center(self):
        x = _img((40, 40), 5)
        sw = np.asarray(
            tf.swirl(x, strength=2, radius=20, mode="reflect")
        )
        assert sw.shape == x.shape
        # corner beyond the swirl radius is nearly unchanged
        np.testing.assert_allclose(sw[0, :4], x[0, :4], atol=1e-2)

    def test_warp_polar_shape(self):
        x = _img((40, 40), 6)
        out = np.asarray(tf.warp_polar(x))
        assert out.shape[0] == 360

    def test_warp_polar_rotation_shifts_rows(self):
        # a rotated image should produce a row-shifted polar image
        x = _img((64, 64), 7)
        p1 = np.asarray(tf.warp_polar(x, radius=24))
        x_rot = np.asarray(tf.rotate(x, 30.0, order=1))
        p2 = np.asarray(tf.warp_polar(x_rot, radius=24))
        shifted = np.roll(p1, -30, axis=0)
        mask = slice(5, 20)
        corr = np.corrcoef(p2[:, mask].ravel(), shifted[:, mask].ravel())[0, 1]
        assert corr > 0.8

    def test_downscale_local_mean(self):
        x = np.arange(16.0).reshape(4, 4)
        out = np.asarray(tf.downscale_local_mean(x, (2, 2)))
        exp = np.array([[2.5, 4.5], [10.5, 12.5]])
        np.testing.assert_allclose(out, exp, rtol=1e-12)


class TestIntegralPyramids:
    def test_integral_image(self):
        x = np.random.RandomState(0).rand(10, 12)
        ii = np.asarray(tf.integral_image(x))
        np.testing.assert_allclose(
            ii, x.cumsum(0).cumsum(1), rtol=1e-10
        )

    def test_integrate(self):
        x = np.random.RandomState(1).rand(10, 12)
        ii = tf.integral_image(x)
        got = float(tf.integrate(ii, (2, 3), (5, 7))[0])
        exp = x[2:6, 3:8].sum()
        np.testing.assert_allclose(got, exp, rtol=1e-9)

    def test_integrate_from_zero(self):
        x = np.random.RandomState(2).rand(8, 8)
        ii = tf.integral_image(x)
        got = float(tf.integrate(ii, (0, 0), (3, 3))[0])
        np.testing.assert_allclose(got, x[:4, :4].sum(), rtol=1e-9)

    def test_pyramid_gaussian(self):
        x = _img((32, 32), 8)
        layers = list(tf.pyramid_gaussian(x, max_layer=2))
        assert len(layers) == 3
        assert layers[1].shape == (16, 16)
        assert layers[2].shape == (8, 8)

    def test_pyramid_laplacian_reconstruction(self):
        x = _img((16, 16), 9)
        layers = list(tf.pyramid_laplacian(x, max_layer=2))
        assert layers[0].shape == (16, 16)
        assert layers[1].shape == (8, 8)

    def test_pyramid_expand(self):
        x = _img((8, 8), 10)
        out = np.asarray(tf.pyramid_expand(x, 2))
        assert out.shape == (16, 16)


def test_warp_mode_translation_legacy():
    """np.pad mode names map to LEGACY ndimage modes (reference
    _geometric.py:14-21): 'wrap' is period-(n-1) legacy wrap, 'constant'
    legacy constant; scipy map_coordinates on the forward matrix (warp's
    inverse-map convention) plus skimage's clip is the oracle."""
    import jax.numpy as jnp
    import scipy.ndimage as sndi

    rng = np.random.RandomState(53)
    modemap = {"constant": "constant", "edge": "nearest",
               "symmetric": "reflect", "reflect": "mirror",
               "wrap": "wrap"}
    x = rng.rand(14, 17)
    t = tf.SimilarityTransform(rotation=0.3, translation=(1.7, -2.1),
                               scale=1.1)
    M = np.asarray(t.params)
    r, c = np.mgrid[0:14, 0:17].astype(float)
    src_x = M[0, 0] * c + M[0, 1] * r + M[0, 2]
    src_y = M[1, 0] * c + M[1, 1] * r + M[1, 2]
    for skmode, ndmode in modemap.items():
        for order in (0, 1, 3):
            got = np.asarray(tf.warp(jnp.asarray(x), t, order=order,
                                     mode=skmode, cval=0.4))
            exp = sndi.map_coordinates(x, np.stack([src_y, src_x]),
                                       order=order, mode=ndmode,
                                       cval=0.4)
            lo, hi = x.min(), x.max()
            if skmode == "constant":
                lo, hi = min(lo, 0.4), max(hi, 0.4)
            np.testing.assert_allclose(got, np.clip(exp, lo, hi),
                                       atol=5e-5,
                                       err_msg=f"{skmode} o{order}")
