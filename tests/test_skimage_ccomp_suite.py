"""Connected-components suite for skimage.measure.label.

Ported expectations from the reference suite
/root/reference/cupyimg/skimage/measure/tests/test_ccomp.py (which itself
originated in skimage/morphology/tests/test_ccomp.py).  Oracle = the
hard-coded label images from upstream.
"""

import numpy as np
from numpy.testing import assert_array_equal

from cupyimg_tpu.skimage.measure import label

BG = 0  # background value


class TestConnectedComponents:
    def setup_method(self):
        self.x = np.asarray([
            [0, 0, 3, 2, 1, 9],
            [0, 1, 1, 9, 2, 9],
            [0, 0, 1, 9, 9, 9],
            [3, 1, 1, 5, 3, 0]])

        self.labels = np.asarray([
            [0, 0, 1, 2, 3, 4],
            [0, 5, 5, 4, 2, 4],
            [0, 0, 5, 4, 4, 4],
            [6, 5, 5, 7, 8, 0]])

        # No background - there is no label 0, labelling starts with 1
        # and all labels are incremented by 1.
        self.labels_nobg = self.labels + 1
        # The 0 at lower right corner is isolated, so it gets a new label
        self.labels_nobg[-1, -1] = 10

        # background value 9 (bg label 0)
        self.labels_bg_9 = self.labels_nobg.copy()
        self.labels_bg_9[self.x == 9] = 0
        self.labels_bg_9[self.labels_bg_9 > 5] -= 1

    def test_basic(self):
        assert_array_equal(np.asarray(label(self.x)), self.labels)
        # Make sure data wasn't modified
        assert self.x[0, 2] == 3
        # no background
        assert_array_equal(np.asarray(label(self.x, background=99)),
                           self.labels_nobg)
        # background value != 0
        assert_array_equal(np.asarray(label(self.x, background=9)),
                           self.labels_bg_9)

    def test_random(self):
        rng = np.random.RandomState(0)
        x = (rng.rand(20, 30) * 5).astype(np.int64)
        labels = np.asarray(label(x))

        n = int(labels.max())
        for i in range(n):
            values = x[labels == i]
            assert np.all(values == values[0])

    def test_diag(self):
        x = np.asarray([[0, 0, 1],
                        [0, 1, 0],
                        [1, 0, 0]])
        assert_array_equal(np.asarray(label(x)), x)

    def test_4_vs_8(self):
        x = np.asarray([[0, 1],
                        [1, 0]], dtype=int)
        assert_array_equal(np.asarray(label(x, connectivity=1)),
                           [[0, 1],
                            [2, 0]])
        assert_array_equal(np.asarray(label(x, connectivity=2)),
                           [[0, 1],
                            [1, 0]])

    def test_background(self):
        x = np.asarray([[1, 0, 0],
                        [1, 1, 5],
                        [0, 0, 0]])
        assert_array_equal(np.asarray(label(x)),
                           [[1, 0, 0],
                            [1, 1, 2],
                            [0, 0, 0]])
        assert_array_equal(np.asarray(label(x, background=0)),
                           [[1, 0, 0],
                            [1, 1, 2],
                            [0, 0, 0]])

    def test_background_two_regions(self):
        x = np.asarray([[0, 0, 6],
                        [0, 0, 6],
                        [5, 5, 5]])
        res = np.asarray(label(x, background=0))
        assert_array_equal(res,
                           [[0, 0, 1],
                            [0, 0, 1],
                            [2, 2, 2]])

    def test_background_one_region_center(self):
        x = np.asarray([[0, 0, 0],
                        [0, 1, 0],
                        [0, 0, 0]])
        assert_array_equal(np.asarray(label(x, connectivity=1, background=0)),
                           [[0, 0, 0],
                            [0, 1, 0],
                            [0, 0, 0]])

    def test_return_num(self):
        x = np.asarray([[1, 0, 6],
                        [0, 0, 6],
                        [5, 5, 5]])
        assert int(label(x, return_num=True)[1]) == 3
        assert int(label(x, background=-1, return_num=True)[1]) == 4


class TestConnectedComponents3d:
    def setup_method(self):
        self.x = np.zeros((3, 4, 5), int)
        self.x[0] = np.asarray([[0, 3, 2, 1, 9],
                                [0, 1, 9, 2, 9],
                                [0, 1, 9, 9, 9],
                                [3, 1, 5, 3, 0]])

        self.x[1] = np.asarray([[3, 3, 2, 1, 9],
                                [0, 3, 9, 2, 1],
                                [0, 3, 3, 1, 1],
                                [3, 1, 3, 3, 0]])

        self.x[2] = np.asarray([[3, 3, 8, 8, 0],
                                [2, 3, 9, 8, 8],
                                [2, 3, 0, 8, 0],
                                [2, 1, 0, 0, 0]])

        self.labels = np.zeros((3, 4, 5), int)

        self.labels[0] = np.asarray([[0, 1, 2, 3, 4],
                                     [0, 5, 4, 2, 4],
                                     [0, 5, 4, 4, 4],
                                     [1, 5, 6, 1, 0]])

        self.labels[1] = np.asarray([[1, 1, 2, 3, 4],
                                     [0, 1, 4, 2, 3],
                                     [0, 1, 1, 3, 3],
                                     [1, 5, 1, 1, 0]])

        self.labels[2] = np.asarray([[1, 1, 7, 7, 0],
                                     [8, 1, 4, 7, 7],
                                     [8, 1, 0, 7, 0],
                                     [8, 5, 0, 0, 0]])

    def test_basic(self):
        labels = np.asarray(label(self.x))
        assert_array_equal(labels, self.labels)
        assert self.x[0, 0, 2] == 2, "Data was modified!"

    def test_random(self):
        rng = np.random.RandomState(1)
        x = (rng.rand(20, 30) * 5).astype(np.int64)
        labels = np.asarray(label(x))

        n = int(labels.max())
        for i in range(n):
            values = x[labels == i]
            assert np.all(values == values[0])

    def test_diag(self):
        x = np.zeros((3, 3, 3), int)
        x[0, 2, 2] = 1
        x[1, 1, 1] = 1
        x[2, 0, 0] = 1
        assert_array_equal(np.asarray(label(x)), x)

    def test_connectivity_1_vs_2(self):
        x = np.zeros((2, 2, 2), int)
        x[0, 1, 1] = 1
        x[1, 0, 0] = 1
        label1 = x.copy()
        label1[1, 0, 0] = 2
        assert_array_equal(np.asarray(label(x, connectivity=1)), label1)
        assert_array_equal(np.asarray(label(x, connectivity=3)), x)

    def test_background(self):
        x = np.zeros((2, 3, 3), int)
        x[0] = np.asarray([[1, 0, 0],
                           [1, 0, 0],
                           [0, 0, 0]])
        x[1] = np.asarray([[0, 0, 0],
                           [0, 1, 5],
                           [0, 0, 0]])

        lnb = x.copy()
        lnb[0] = np.asarray([[1, 2, 2],
                             [1, 2, 2],
                             [2, 2, 2]])
        lnb[1] = np.asarray([[2, 2, 2],
                             [2, 1, 3],
                             [2, 2, 2]])
        lb = x.copy()
        lb[0] = np.asarray([[1,  BG, BG],
                            [1,  BG, BG],
                            [BG, BG, BG]])
        lb[1] = np.asarray([[BG, BG, BG],
                            [BG, 1,   2],
                            [BG, BG, BG]])
        assert_array_equal(np.asarray(label(x)), lb)
        assert_array_equal(np.asarray(label(x, background=-1)), lnb)

    def test_background_two_regions(self):
        x = np.zeros((2, 3, 3), int)
        x[0] = np.asarray([[0, 0, 6],
                           [0, 0, 6],
                           [5, 5, 5]])
        x[1] = np.asarray([[6, 6, 0],
                           [5, 0, 0],
                           [0, 0, 0]])
        lb = x.copy()
        lb[0] = np.asarray([[BG, BG, 1],
                            [BG, BG, 1],
                            [2,  2,  2]])
        lb[1] = np.asarray([[1,  1,  BG],
                            [2,  BG, BG],
                            [BG, BG, BG]])
        res = np.asarray(label(x, background=0))
        assert_array_equal(res, lb)

    def test_background_one_region_center(self):
        x = np.zeros((3, 3, 3), int)
        x[1, 1, 1] = 1

        lb = np.ones_like(x) * BG
        lb[1, 1, 1] = 1

        assert_array_equal(np.asarray(label(x, connectivity=1, background=0)),
                           lb)

    def test_return_num(self):
        x = np.asarray([[1, 0, 6],
                        [0, 0, 6],
                        [5, 5, 5]])
        assert int(label(x, return_num=True)[1]) == 3
        assert int(label(x, background=-1, return_num=True)[1]) == 4

    def test_1D(self):
        x = np.asarray((0, 1, 2, 2, 1, 1, 0, 0))
        xlen = len(x)
        y = np.asarray((0, 1, 2, 2, 3, 3, 0, 0))
        reshapes = (
            (xlen,),
            (1, xlen),
            (xlen, 1),
            (1, xlen, 1),
            (xlen, 1, 1),
            (1, 1, xlen),
        )
        for reshape in reshapes:
            x2 = x.reshape(reshape)
            labelled = label(x2)
            assert_array_equal(y, np.asarray(labelled).flatten())
