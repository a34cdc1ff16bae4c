"""skimage.feature canny/template/daisy tests."""

import numpy as np
import pytest

import cupyimg_tpu.skimage.feature as feature


class TestCanny:
    def test_square_ring(self):
        im = np.zeros((128, 128))
        im[32:-32, 32:-32] = 1
        edges = np.asarray(feature.canny(im, sigma=2))
        ys, xs = np.nonzero(edges)
        # closed ring hugging the square boundary
        assert 29 <= ys.min() <= 33 and 94 <= ys.max() <= 98
        assert 29 <= xs.min() <= 33 and 94 <= xs.max() <= 98
        # thin: on the order of the perimeter (ties on a perfect step
        # edge keep both pixels, as in the reference's `<=` NMS), not
        # an area
        assert edges.sum() < 3 * 4 * 64

    def test_zero_image(self):
        edges = np.asarray(feature.canny(np.zeros((32, 32)), sigma=1))
        assert not edges.any()

    def test_mask_limits_detection(self):
        im = np.zeros((64, 64))
        im[16:-16, 16:-16] = 1
        mask = np.zeros(im.shape, bool)
        mask[:, :32] = True
        edges = np.asarray(feature.canny(im, sigma=2, mask=mask))
        assert not edges[:, 40:].any()
        assert edges[:, :30].any()

    def test_quantile_threshold_validation(self):
        with pytest.raises(ValueError):
            feature.canny(
                np.zeros((16, 16)), use_quantiles=True,
                low_threshold=1.5,
            )
        with pytest.raises(ValueError):
            feature.canny(
                np.zeros((16, 16)), use_quantiles=True,
                high_threshold=-0.5,
            )

    def test_hysteresis_links_edges(self):
        # weak edge attached to strong edge survives; isolated weak
        # edge does not
        im = np.zeros((64, 64))
        im[20:44, 20] = 1.0  # strong vertical line
        edges_lo = np.asarray(
            feature.canny(im, sigma=1, low_threshold=0.05,
                          high_threshold=0.1)
        )
        edges_hi = np.asarray(
            feature.canny(im, sigma=1, low_threshold=0.05,
                          high_threshold=0.9)
        )
        assert edges_lo.sum() >= edges_hi.sum()

    def test_2d_only(self):
        with pytest.raises(ValueError):
            feature.canny(np.zeros((8, 8, 8)))


class TestMatchTemplate:
    def test_docstring_golden(self):
        template = np.zeros((3, 3))
        template[1, 1] = 1
        image = np.zeros((6, 6))
        image[1, 1] = 1
        image[4, 4] = -1
        r = np.round(
            np.asarray(feature.match_template(image, template)), 3
        )
        exp = np.array(
            [
                [1, -0.125, 0, 0],
                [-0.125, -0.125, 0, 0],
                [0, 0, 0.125, 0.125],
                [0, 0, 0.125, -1],
            ]
        )
        np.testing.assert_allclose(r, exp)

    def test_pad_input_center_match(self):
        template = np.zeros((3, 3))
        template[1, 1] = 1
        image = np.zeros((6, 6))
        image[1, 1] = 1
        image[4, 4] = -1
        rp = np.asarray(
            feature.match_template(image, template, pad_input=True)
        )
        assert rp.shape == image.shape
        assert rp[1, 1] == pytest.approx(1.0, abs=1e-6)
        assert rp[4, 4] == pytest.approx(-1.0, abs=1e-6)

    def test_locates_shifted_patch(self):
        rng = np.random.RandomState(0)
        image = rng.rand(64, 64)
        patch = image[20:30, 35:47]
        resp = np.asarray(feature.match_template(image, patch))
        assert np.unravel_index(np.argmax(resp), resp.shape) == (20, 35)
        assert resp.max() == pytest.approx(1.0, abs=1e-6)

    def test_3d(self):
        rng = np.random.RandomState(1)
        vol = rng.rand(20, 21, 22)
        patch = vol[5:9, 6:10, 7:11]
        resp = np.asarray(feature.match_template(vol, patch))
        assert np.unravel_index(np.argmax(resp), resp.shape) == (
            5, 6, 7,
        )

    def test_validation(self):
        with pytest.raises(ValueError):
            feature.match_template(np.zeros((4, 4)),
                                   np.zeros((5, 5)))
        with pytest.raises(ValueError):
            feature.match_template(np.zeros((4, 4)),
                                   np.zeros((2, 2, 2)))


class TestDaisy:
    def test_shapes_and_l1(self):
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64)
        d = np.asarray(
            feature.daisy(img, step=8, radius=15, rings=2,
                          histograms=6, orientations=8)
        )
        assert d.shape == (5, 5, (2 * 6 + 1) * 8)
        np.testing.assert_allclose(d.sum(-1), 1, atol=1e-6)

    def test_l2_and_daisy_norms(self):
        rng = np.random.RandomState(1)
        img = rng.rand(48, 48)
        d2 = np.asarray(
            feature.daisy(img, step=8, rings=2, normalization="l2")
        )
        np.testing.assert_allclose(
            np.sqrt((d2 * d2).sum(-1)), 1, atol=1e-6
        )
        d3 = np.asarray(
            feature.daisy(img, step=8, rings=2,
                          normalization="daisy")
        )
        np.testing.assert_allclose(
            np.sqrt((d3[:, :, :8] ** 2).sum(-1)), 1, atol=1e-6
        )

    def test_param_validation(self):
        img = np.zeros((32, 32))
        with pytest.raises(ValueError):
            feature.daisy(img, normalization="bogus")
        with pytest.raises(ValueError):
            feature.daisy(
                img, sigmas=[1, 2], ring_radii=[2, 4, 6]
            )
        # visualize=True is implemented first-party (beyond the
        # reference, whose cupyimg/skimage/feature/_daisy.py:52 raises):
        # returns (descriptors, (M, N, 3) rendering)
        descs, descs_img = feature.daisy(img, visualize=True)
        assert descs_img.shape == img.shape + (3,)

    def test_sigmas_ring_radii_override(self):
        rng = np.random.RandomState(2)
        img = rng.rand(40, 40)
        d = np.asarray(
            feature.daisy(
                img, step=10, sigmas=[1.0, 2.0],
                ring_radii=[5],
            )
        )
        # rings=1 -> (1*8+1)*8 = 72 dims; radius=5 -> 30x30 grid
        assert d.shape[-1] == (1 * 8 + 1) * 8


class TestRegisterAliases:
    def test_register_translation_alias(self):
        rng = np.random.RandomState(0)
        import scipy.ndimage as sndi

        ref = sndi.gaussian_filter(rng.rand(32, 32), 2)
        mov = np.roll(ref, (3, -2), axis=(0, 1))
        shifts, _, _ = feature.register_translation(ref, mov)
        np.testing.assert_array_equal(np.asarray(shifts), [-3, 2])

    def test_masked_alias(self):
        rng = np.random.RandomState(0)
        import scipy.ndimage as sndi

        ref = sndi.gaussian_filter(rng.rand(32, 32), 2)
        mov = np.roll(ref, (3, -2), axis=(0, 1))
        mask = np.ones(ref.shape, bool)
        sh = feature.masked_register_translation(ref, mov, mask)
        np.testing.assert_allclose(np.asarray(sh), [-3, 2])
