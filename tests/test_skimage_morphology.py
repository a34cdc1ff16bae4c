"""skimage.morphology tests (scipy + docstring/golden oracles)."""

import numpy as np
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.skimage.morphology as morph


def _img(shape=(24, 25), seed=0):
    return np.random.RandomState(seed).randint(0, 255, shape).astype(
        np.uint8
    )


class TestSelem:
    def test_square_rect_cube(self):
        assert np.asarray(morph.square(4)).shape == (4, 4)
        assert np.asarray(morph.rectangle(3, 5)).shape == (3, 5)
        assert np.asarray(morph.cube(3)).shape == (3, 3, 3)
        assert np.asarray(morph.square(4)).all()

    def test_diamond(self):
        d = np.asarray(morph.diamond(2))
        exp = np.array(
            [
                [0, 0, 1, 0, 0],
                [0, 1, 1, 1, 0],
                [1, 1, 1, 1, 1],
                [0, 1, 1, 1, 0],
                [0, 0, 1, 0, 0],
            ],
            np.uint8,
        )
        np.testing.assert_array_equal(d, exp)

    def test_disk_ball_radius(self):
        d = np.asarray(morph.disk(3))
        I, J = np.mgrid[-3:4, -3:4]
        np.testing.assert_array_equal(d, (I**2 + J**2 <= 9))
        b = np.asarray(morph.ball(2))
        Z, Y, X = np.mgrid[-2:3, -2:3, -2:3]
        np.testing.assert_array_equal(b, (X**2 + Y**2 + Z**2 <= 4))

    def test_ellipse_golden(self):
        # golden from skimage docstring (reference selem.py:155-163)
        e = np.asarray(morph.ellipse(5, 3)).astype(int)
        exp = np.zeros((7, 11), int)
        exp[1:-1] = 1
        exp[0, 2:-2] = 1
        exp[-1, 2:-2] = 1
        np.testing.assert_array_equal(e, exp)

    def test_octagon_properties(self):
        m, n = 3, 2
        o = np.asarray(morph.octagon(m, n)).astype(int)
        s = m + 2 * n
        assert o.shape == (s, s)
        # 4-fold symmetry, cut corners, solid middle band
        np.testing.assert_array_equal(o, o[::-1])
        np.testing.assert_array_equal(o, o[:, ::-1])
        np.testing.assert_array_equal(o, o.T)
        assert o[0, 0] == 0 and o[0, n] == 1
        assert o[n : n + m].all()

    def test_star(self):
        s1 = np.asarray(morph.star(1))
        np.testing.assert_array_equal(s1, np.ones((3, 3), np.uint8))
        s = np.asarray(morph.star(2)).astype(int)
        assert s.shape == (7, 7)
        np.testing.assert_array_equal(s, s[::-1])
        np.testing.assert_array_equal(s, s.T)
        assert s[0, 3] == 1 and s[0, 0] == 0 and s[1, 1] == 1


class TestGrey:
    def test_erosion_dilation_vs_scipy(self):
        x = _img()
        se = np.asarray(morph.disk(2))
        np.testing.assert_array_equal(
            np.asarray(morph.erosion(x, se)),
            sndi.grey_erosion(x, footprint=se),
        )
        np.testing.assert_array_equal(
            np.asarray(morph.dilation(x, se)),
            sndi.grey_dilation(x, footprint=se[::-1, ::-1]),
        )

    def test_erosion_docstring_example(self):
        bright = np.zeros((5, 5), np.uint8)
        bright[1:4, 1:4] = 1
        out = np.asarray(morph.erosion(bright, morph.square(3)))
        exp = np.zeros((5, 5), np.uint8)
        exp[2, 2] = 1
        np.testing.assert_array_equal(out, exp)

    def test_dilation_docstring_example(self):
        px = np.zeros((5, 5), np.uint8)
        px[2, 2] = 1
        out = np.asarray(morph.dilation(px, morph.square(3)))
        exp = np.zeros((5, 5), np.uint8)
        exp[1:4, 1:4] = 1
        np.testing.assert_array_equal(out, exp)

    def test_opening_closing_docstring_examples(self):
        bad = np.array(
            [
                [1, 0, 0, 0, 1],
                [1, 1, 0, 1, 1],
                [1, 1, 1, 1, 1],
                [1, 1, 0, 1, 1],
                [1, 0, 0, 0, 1],
            ],
            np.uint8,
        )
        out = np.asarray(morph.opening(bad, morph.square(3)))
        exp = np.array(
            [
                [0, 0, 0, 0, 0],
                [1, 1, 0, 1, 1],
                [1, 1, 0, 1, 1],
                [1, 1, 0, 1, 1],
                [0, 0, 0, 0, 0],
            ],
            np.uint8,
        )
        np.testing.assert_array_equal(out, exp)
        broken = np.zeros((5, 5), np.uint8)
        broken[2] = [1, 1, 0, 1, 1]
        out = np.asarray(morph.closing(broken, morph.square(3)))
        exp = np.zeros((5, 5), np.uint8)
        exp[2] = 1
        np.testing.assert_array_equal(out, exp)

    def test_even_selem_opening_matches_odd_pad(self):
        """Eccentric (even) selem: opening is still anti-extensive and
        idempotent."""
        x = _img((30, 31))
        se = np.ones((4, 4), np.uint8)
        o1 = np.asarray(morph.opening(x, se))
        assert (o1 <= x).all()
        o2 = np.asarray(morph.opening(o1, se))
        np.testing.assert_array_equal(o1, o2)

    def test_tophats(self):
        x = _img()
        se = np.asarray(morph.square(3))
        wt = np.asarray(morph.white_tophat(x, se))
        np.testing.assert_array_equal(
            wt, sndi.white_tophat(x, footprint=se)
        )
        bt = np.asarray(morph.black_tophat(x, se))
        closed = np.asarray(morph.closing(x, se))
        np.testing.assert_array_equal(bt, closed - x)

    def test_tophat_docstring_examples(self):
        bright_on_grey = np.array(
            [
                [2, 3, 3, 3, 2],
                [3, 4, 5, 4, 3],
                [3, 5, 9, 5, 3],
                [3, 4, 5, 4, 3],
                [2, 3, 3, 3, 2],
            ],
            np.uint8,
        )
        exp = np.array(
            [
                [0, 0, 0, 0, 0],
                [0, 0, 1, 0, 0],
                [0, 1, 5, 1, 0],
                [0, 0, 1, 0, 0],
                [0, 0, 0, 0, 0],
            ],
            np.uint8,
        )
        out = np.asarray(
            morph.white_tophat(bright_on_grey, morph.square(3))
        )
        np.testing.assert_array_equal(out, exp)
        dark_on_grey = np.array(
            [
                [7, 6, 6, 6, 7],
                [6, 5, 4, 5, 6],
                [6, 4, 0, 4, 6],
                [6, 5, 4, 5, 6],
                [7, 6, 6, 6, 7],
            ],
            np.uint8,
        )
        out = np.asarray(
            morph.black_tophat(dark_on_grey, morph.square(3))
        )
        np.testing.assert_array_equal(out, exp)


class TestBinary:
    @pytest.mark.parametrize("connectivity", [1, 2])
    def test_vs_scipy(self, connectivity):
        b = np.random.RandomState(1).rand(20, 21) > 0.5
        se = sndi.generate_binary_structure(2, connectivity)
        np.testing.assert_array_equal(
            np.asarray(morph.binary_erosion(b, se)),
            sndi.binary_erosion(b, se, border_value=1),
        )
        np.testing.assert_array_equal(
            np.asarray(morph.binary_dilation(b, se)),
            sndi.binary_dilation(b, se),
        )
        np.testing.assert_array_equal(
            np.asarray(morph.binary_opening(b, se)),
            sndi.binary_dilation(
                sndi.binary_erosion(b, se, border_value=1), se
            ),
        )

    def test_binary_matches_grey_for_bool(self):
        b = np.random.RandomState(2).rand(16, 17) > 0.4
        se = np.asarray(morph.diamond(1))
        np.testing.assert_array_equal(
            np.asarray(morph.binary_erosion(b, se)),
            np.asarray(morph.erosion(b, se)).astype(bool),
        )


class TestReconstruction:
    def _oracle(self, seed, mask, method="dilation", size=3):
        r = np.asarray(seed, dtype=float).copy()
        for _ in range(100000):
            if method == "dilation":
                new = np.minimum(
                    sndi.grey_dilation(
                        r, size=(size,) * r.ndim, mode="constant",
                        cval=-np.inf,
                    ),
                    mask,
                )
            else:
                new = np.maximum(
                    sndi.grey_erosion(
                        r, size=(size,) * r.ndim, mode="constant",
                        cval=np.inf,
                    ),
                    mask,
                )
            if np.array_equal(new, r):
                return r
            r = new

    def test_hdome(self):
        y, x = np.mgrid[:20:0.5, :20:0.5]
        bumps = np.sin(x) + np.sin(y)
        seed = bumps - 0.3
        rec = np.asarray(morph.reconstruction(seed, bumps))
        np.testing.assert_allclose(rec, self._oracle(seed, bumps))

    def test_erosion_method(self):
        rng = np.random.RandomState(3)
        mask = rng.rand(16, 17)
        seed = mask + 0.5
        rec = np.asarray(
            morph.reconstruction(seed, mask, method="erosion")
        )
        np.testing.assert_allclose(
            rec, self._oracle(seed, mask, method="erosion")
        )

    def test_1d_docstring_example(self):
        x = np.linspace(0, 4 * np.pi, 50)
        y_mask = np.cos(x)
        y_seed = y_mask.min() * np.ones_like(x)
        y_seed[0] = 0.5
        y_seed[-1] = 0
        y_rec = np.asarray(morph.reconstruction(y_seed, y_mask))
        # middle peak is fully suppressed, end peaks truncated to seeds
        assert y_rec[0] == pytest.approx(0.5)
        assert y_rec.max() <= 0.5 + 1e-12

    def test_validation(self):
        with pytest.raises(ValueError):
            morph.reconstruction(np.ones((4, 4)), np.zeros((4, 4)))
        with pytest.raises(ValueError):
            morph.reconstruction(
                np.zeros((4, 4)), np.ones((4, 4)), method="erosion"
            )
        with pytest.raises(ValueError):
            morph.reconstruction(
                np.zeros((4, 4)),
                np.ones((4, 4)) * 0.0,
                selem=np.ones((4, 4)),
            )

    def test_selem_and_offset(self):
        rng = np.random.RandomState(4)
        mask = rng.rand(12, 13)
        seed = np.full_like(mask, mask.min())
        seed[6, 6] = mask[6, 6]
        # cross selem restricts propagation to 4-connectivity
        selem = np.asarray(morph.diamond(1))
        rec = np.asarray(morph.reconstruction(seed, mask, selem=selem))
        r = seed.copy()
        fp = np.asarray(selem, bool)
        for _ in range(100000):
            new = np.minimum(
                sndi.grey_dilation(
                    r, footprint=fp, mode="constant", cval=-np.inf
                ),
                mask,
            )
            if np.array_equal(new, r):
                break
            r = new
        np.testing.assert_allclose(rec, r)


class TestMisc:
    def test_remove_small_objects(self):
        a = np.array(
            [[0, 0, 0, 1, 0], [1, 1, 1, 0, 0], [1, 1, 1, 0, 1]], bool
        )
        b = np.asarray(morph.remove_small_objects(a, 6))
        exp = np.array(
            [
                [False, False, False, False, False],
                [True, True, True, False, False],
                [True, True, True, False, False],
            ]
        )
        np.testing.assert_array_equal(b, exp)
        c = np.asarray(morph.remove_small_objects(a, 7, connectivity=2))
        exp2 = exp.copy()
        exp2[0, 3] = True
        np.testing.assert_array_equal(c, exp2)

    def test_remove_small_objects_labeled(self):
        lab = np.zeros((10, 10), np.int32)
        lab[:2, :2] = 1
        lab[5:, 5:] = 2
        out = np.asarray(morph.remove_small_objects(lab, 5))
        assert (out[:2, :2] == 0).all()
        assert (out[5:, 5:] == 2).all()

    def test_remove_small_objects_float_raises(self):
        with pytest.raises(TypeError):
            morph.remove_small_objects(np.zeros((4, 4)), 4)

    def test_remove_small_holes(self):
        a = np.array(
            [
                [1, 1, 1, 1, 1, 0],
                [1, 1, 1, 0, 1, 0],
                [1, 0, 0, 1, 1, 0],
                [1, 1, 1, 1, 1, 0],
            ],
            bool,
        )
        b = np.asarray(morph.remove_small_holes(a, 2))
        exp = np.array(
            [
                [1, 1, 1, 1, 1, 0],
                [1, 1, 1, 1, 1, 0],
                [1, 0, 0, 1, 1, 0],
                [1, 1, 1, 1, 1, 0],
            ],
            bool,
        )
        np.testing.assert_array_equal(b, exp)
        c = np.asarray(morph.remove_small_holes(a, 2, connectivity=2))
        exp2 = a.copy()
        exp2[1, 3] = False
        np.testing.assert_array_equal(c, exp2)
