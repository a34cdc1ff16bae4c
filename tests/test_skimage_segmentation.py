"""skimage.segmentation tests (docstring + brute-force oracles)."""

import numpy as np
import pytest

import cupyimg_tpu.skimage.segmentation as seg


LABELS = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 5, 5, 5, 0, 0],
        [0, 0, 1, 1, 1, 5, 5, 5, 0, 0],
        [0, 0, 1, 1, 1, 5, 5, 5, 0, 0],
        [0, 0, 1, 1, 1, 5, 5, 5, 0, 0],
        [0, 0, 0, 0, 0, 5, 5, 5, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    ],
    np.uint8,
)


class TestJoin:
    def test_join_docstring(self):
        s1 = np.array([[0, 0, 1, 1], [0, 2, 1, 1], [2, 2, 2, 1]])
        s2 = np.array([[0, 1, 1, 0], [0, 1, 1, 0], [0, 1, 1, 1]])
        j = np.asarray(seg.join_segmentations(s1, s2))
        exp = np.array([[0, 1, 3, 2], [0, 5, 3, 2], [4, 5, 5, 3]])
        np.testing.assert_array_equal(j, exp)

    def test_join_shape_mismatch(self):
        with pytest.raises(ValueError):
            seg.join_segmentations(
                np.zeros((3, 3), int), np.zeros((4, 4), int)
            )

    def test_relabel_sequential_docstring(self):
        lf = np.array([1, 1, 5, 5, 8, 99, 42])
        relab, fw, inv = seg.relabel_sequential(lf)
        np.testing.assert_array_equal(
            np.asarray(relab), [1, 1, 2, 2, 3, 5, 4]
        )
        np.testing.assert_array_equal(
            np.asarray(inv), [0, 1, 5, 8, 42, 99]
        )
        dense_fw = np.asarray(fw)
        assert dense_fw.shape == (100,)
        np.testing.assert_array_equal(
            dense_fw[[1, 5, 8, 42, 99]], [1, 2, 3, 4, 5]
        )
        assert (np.asarray(fw[lf]) == np.asarray(relab)).all()
        assert (np.asarray(inv[relab]) == lf).all()
        relab5, _, _ = seg.relabel_sequential(lf, offset=5)
        np.testing.assert_array_equal(
            np.asarray(relab5), [5, 5, 6, 6, 7, 9, 8]
        )

    def test_relabel_validation(self):
        with pytest.raises(ValueError):
            seg.relabel_sequential(np.array([1, 2]), offset=0)
        with pytest.raises(ValueError):
            seg.relabel_sequential(np.array([-1, 2]))
        with pytest.raises(TypeError):
            seg.relabel_sequential(np.array([1.0, 2.0]))

    def test_relabel_background_preserved(self):
        lf = np.array([0, 0, 7, 3])
        relab, fw, inv = seg.relabel_sequential(lf)
        np.testing.assert_array_equal(np.asarray(relab), [0, 0, 2, 1])


class TestFindBoundaries:
    def test_outer_docstring(self):
        outer = np.asarray(
            seg.find_boundaries(LABELS, mode="outer")
        ).astype(np.uint8)
        exp = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 1, 1, 0, 0],
                [0, 0, 1, 1, 1, 1, 0, 0, 1, 0],
                [0, 1, 0, 0, 1, 1, 0, 0, 1, 0],
                [0, 1, 0, 0, 1, 1, 0, 0, 1, 0],
                [0, 1, 0, 0, 1, 1, 0, 0, 1, 0],
                [0, 0, 1, 1, 1, 1, 0, 0, 1, 0],
                [0, 0, 0, 0, 0, 1, 1, 1, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            ],
            np.uint8,
        )
        np.testing.assert_array_equal(outer, exp)

    def test_thick_symmetric_and_covers_inner(self):
        thick = np.asarray(seg.find_boundaries(LABELS, mode="thick"))
        inner = np.asarray(seg.find_boundaries(LABELS, mode="inner"))
        outer = np.asarray(seg.find_boundaries(LABELS, mode="outer"))
        assert (thick & inner == inner).all()
        assert (thick & outer == outer).all()
        # inner stays on foreground
        assert (~inner[LABELS == 0]).all()
        # outer stays on background except adjacent objects
        assert (outer[(LABELS != 0)] == (inner & outer)[LABELS != 0]).all()

    def test_bool_image(self):
        b = np.zeros((5, 5), bool)
        b[1:, 2:] = True
        fb = np.asarray(seg.find_boundaries(b)).astype(int)
        exp = np.array(
            [
                [0, 0, 1, 1, 1],
                [0, 1, 1, 1, 1],
                [0, 1, 1, 0, 0],
                [0, 1, 1, 0, 0],
                [0, 1, 1, 0, 0],
            ]
        )
        np.testing.assert_array_equal(fb, exp)

    def test_subpixel_matches_bruteforce(self):
        def oracle(lab):
            ndim = lab.ndim
            maxl = np.iinfo(lab.dtype).max
            exp = np.zeros([2 * s - 1 for s in lab.shape], lab.dtype)
            exp[(slice(None, None, 2),) * ndim] = lab
            edges = np.ones(exp.shape, bool)
            edges[(slice(None, None, 2),) * ndim] = False
            exp[edges] = maxl
            pad = np.pad(exp, 1, mode="constant")
            out = np.zeros_like(edges)
            for idx in np.ndindex(exp.shape):
                if edges[idx]:
                    win = pad[tuple(slice(i, i + 3) for i in idx)]
                    if len(np.unique(win)) > 2:
                        out[idx] = True
            return out

        for lab in [
            LABELS,
            (np.random.RandomState(0).rand(7, 8) > 0.5).astype(
                np.uint8
            ),
        ]:
            got = np.asarray(
                seg.find_boundaries(lab, mode="subpixel")
            )
            np.testing.assert_array_equal(got, oracle(lab))

    def test_mark_boundaries(self):
        img = np.random.RandomState(0).rand(9, 10)
        marked = np.asarray(
            seg.mark_boundaries(img, LABELS.astype(int),
                                color=(1, 0, 0))
        )
        assert marked.shape == (9, 10, 3)
        bnd = np.asarray(
            seg.find_boundaries(LABELS.astype(int), mode="outer")
        )
        np.testing.assert_allclose(
            marked[bnd], np.tile([1, 0, 0], (bnd.sum(), 1))
        )
        # outline color path
        marked2 = seg.mark_boundaries(
            img, LABELS.astype(int), outline_color=(0, 1, 0)
        )
        assert marked2.shape == (9, 10, 3)


class TestLevelSets:
    def test_checkerboard(self):
        cb = np.asarray(seg.checkerboard_level_set((6, 6), 2))
        exp = np.array(
            [
                [0, 0, 1, 1, 0, 0],
                [0, 0, 1, 1, 0, 0],
                [1, 1, 0, 0, 1, 1],
                [1, 1, 0, 0, 1, 1],
                [0, 0, 1, 1, 0, 0],
                [0, 0, 1, 1, 0, 0],
            ]
        )
        np.testing.assert_array_equal(cb, exp)

    def test_disk(self):
        d = np.asarray(
            seg.disk_level_set((9, 9), center=(4, 4), radius=3)
        )
        I, J = np.mgrid[0:9, 0:9]
        exp = (3 - np.hypot(I - 4, J - 4)) > 0
        np.testing.assert_array_equal(d.astype(bool), exp)


class TestMorphSnakes:
    def _blob(self):
        x, y = np.mgrid[0:40, 0:40]
        return ((x - 20) ** 2 + (y - 20) ** 2 < 100).astype(float)

    def test_chan_vese_disk_init(self):
        blob = self._blob()
        u = np.asarray(
            seg.morphological_chan_vese(
                blob, 60, smoothing=1, init_level_set="disk"
            )
        ).astype(bool)
        b = blob > 0.5
        iou = (u & b).sum() / (u | b).sum()
        assert iou > 0.9

    def test_chan_vese_checkerboard_up_to_inversion(self):
        blob = self._blob()
        u = np.asarray(
            seg.morphological_chan_vese(blob, 30, smoothing=1)
        ).astype(bool)
        b = blob > 0.5
        iou = max(
            (u & b).sum() / (u | b).sum(),
            (~u & b).sum() / (~u | b).sum(),
        )
        assert iou > 0.9

    def test_gac_shrink_onto_edge(self):
        blob = self._blob()
        gimg = seg.inverse_gaussian_gradient(blob, alpha=1000, sigma=2)
        init = seg.disk_level_set(
            blob.shape, center=(20, 20), radius=17
        )
        u = np.asarray(
            seg.morphological_geodesic_active_contour(
                gimg, 60, init_level_set=init, smoothing=1, balloon=-1
            )
        ).astype(bool)
        b = blob > 0.5
        iou = (u & b).sum() / (u | b).sum()
        assert iou > 0.9

    def test_input_validation(self):
        with pytest.raises(ValueError):
            seg.morphological_chan_vese(
                np.zeros((4, 4)), 1,
                init_level_set=np.zeros((4, 4, 4)),
            )
        with pytest.raises(ValueError):
            seg.morphological_chan_vese(
                np.zeros((4, 4)), 1, init_level_set="bogus"
            )

    def test_callback_called(self):
        calls = []
        seg.morphological_chan_vese(
            self._blob(), 3, iter_callback=lambda u: calls.append(1)
        )
        assert len(calls) == 4  # initial + one per iteration

    # ported from the reference suite
    # (cupyimg/skimage/segmentation/tests/test_morphsnakes.py)

    def test_black_image(self):
        # reference test_morphsnakes_black: a zero image collapses the
        # level set to zeros; balloon=1/threshold=-1/smoothing=0 grows
        # it to ones
        img = np.zeros((11, 11))
        ls = seg.disk_level_set(img.shape, center=(5, 5), radius=3)
        acwe = np.asarray(
            seg.morphological_chan_vese(img, 6, init_level_set=ls)
        )
        np.testing.assert_array_equal(acwe, np.zeros(img.shape))
        gac = np.asarray(
            seg.morphological_geodesic_active_contour(
                img, 6, init_level_set=ls
            )
        )
        np.testing.assert_array_equal(gac, np.zeros(img.shape))
        gac2 = np.asarray(
            seg.morphological_geodesic_active_contour(
                img, 6, init_level_set=ls, balloon=1, threshold=-1,
                smoothing=0,
            )
        )
        np.testing.assert_array_equal(gac2, np.ones(img.shape))
        assert (
            acwe.dtype == gac.dtype == gac2.dtype == np.dtype(np.int8)
        )

    def test_gaussian_blob_radius_insensitive(self):
        # reference test_morphsnakes_simple_shape_chan_vese: two disk
        # inits of different radii converge to the same segmentation
        coords = np.mgrid[-5:6, -5:6]
        img = np.exp(-(coords ** 2).sum(0) / 10)
        ls1 = seg.disk_level_set(img.shape, center=(5, 5), radius=3)
        ls2 = seg.disk_level_set(img.shape, center=(5, 5), radius=6)
        a1 = np.asarray(
            seg.morphological_chan_vese(img, 10, init_level_set=ls1)
        )
        a2 = np.asarray(
            seg.morphological_chan_vese(img, 10, init_level_set=ls2)
        )
        np.testing.assert_array_equal(a1, a2)
        assert a1.dtype == a2.dtype == np.dtype(np.int8)

    def test_gac_simple_shape_golden(self):
        # reference test_morphsnakes_simple_shape_geodesic_active_contour
        img = np.asarray(
            seg.disk_level_set((11, 11), center=(5, 5), radius=3.5)
        ).astype(float)
        gimg = seg.inverse_gaussian_gradient(img, alpha=10.0, sigma=1.0)
        ls = seg.disk_level_set(img.shape, center=(5, 5), radius=6)
        ref = np.array(
            [
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
                [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
                [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0],
                [0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            ],
            dtype=np.int8,
        )
        gac = np.asarray(
            seg.morphological_geodesic_active_contour(
                gimg, 10, init_level_set=ls, balloon=-1
            )
        )
        np.testing.assert_array_equal(gac, ref)
        assert gac.dtype == np.dtype(np.int8)

    def test_init_level_set_names_golden(self):
        # reference test_init_level_sets: zero iterations return the
        # named initializations exactly
        image = np.zeros((6, 6))
        cb = np.asarray(seg.morphological_chan_vese(image, 0,
                                                    "checkerboard"))
        cb_ref = np.array(
            [
                [0, 0, 0, 0, 0, 1],
                [0, 0, 0, 0, 0, 1],
                [0, 0, 0, 0, 0, 1],
                [0, 0, 0, 0, 0, 1],
                [0, 0, 0, 0, 0, 1],
                [1, 1, 1, 1, 1, 0],
            ],
            dtype=np.int8,
        )
        disk = np.asarray(
            seg.morphological_geodesic_active_contour(image, 0, "disk")
        )
        disk_ref = np.array(
            [
                [0, 0, 0, 0, 0, 0],
                [0, 0, 1, 1, 1, 0],
                [0, 1, 1, 1, 1, 1],
                [0, 1, 1, 1, 1, 1],
                [0, 1, 1, 1, 1, 1],
                [0, 0, 1, 1, 1, 0],
            ],
            dtype=np.int8,
        )
        np.testing.assert_array_equal(cb, cb_ref)
        np.testing.assert_array_equal(disk, disk_ref)

    def test_3d_shrinks_monotonically(self):
        # reference test_morphsnakes_3d
        image = np.zeros((7, 7, 7))
        evolution = []
        ls = seg.morphological_chan_vese(
            image, 5, "disk",
            iter_callback=lambda x: evolution.append(
                float(np.asarray(x).sum())
            ),
        )
        assert evolution[0] == 81
        assert float(np.asarray(ls).sum()) == 0
        for v1, v2 in zip(evolution[:-1], evolution[1:]):
            assert v1 >= v2

    def test_incorrect_shapes_raise(self):
        # reference test_morphsnakes_incorrect_image_shape / _ndim
        img = np.zeros((10, 10, 3))
        ls = np.zeros((10, 9))
        with pytest.raises(ValueError):
            seg.morphological_chan_vese(img, 1, init_level_set=ls)
        with pytest.raises(ValueError):
            seg.morphological_geodesic_active_contour(
                img, 1, init_level_set=ls
            )
        img4 = np.zeros((4, 4, 4, 4))
        with pytest.raises(ValueError):
            seg.morphological_chan_vese(
                img4, 1, init_level_set=np.zeros((4, 4, 4, 4))
            )
