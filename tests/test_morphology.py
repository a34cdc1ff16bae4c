"""ndimage morphology vs scipy.ndimage."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import cupyimg_tpu.scipy.ndimage.morphology as tmorph


def _binary(shape, seed=0, p=0.5):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape) > p


def _grey(shape, dtype=np.float64, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * 10).astype(dtype)


@pytest.mark.parametrize("rank,conn", [(1, 1), (2, 1), (2, 2), (3, 1), (3, 3)])
def test_generate_binary_structure(rank, conn):
    np.testing.assert_array_equal(
        tmorph.generate_binary_structure(rank, conn),
        ndi.generate_binary_structure(rank, conn),
    )


@pytest.mark.parametrize("iterations", [2, 3])
def test_iterate_structure(iterations):
    s = ndi.generate_binary_structure(2, 1)
    np.testing.assert_array_equal(
        np.asarray(tmorph.iterate_structure(s, iterations)),
        ndi.iterate_structure(s, iterations),
    )


class TestBinary:
    @pytest.mark.parametrize("border_value", [0, 1])
    @pytest.mark.parametrize("iterations", [1, 2, -1])
    @pytest.mark.parametrize("op", ["binary_erosion", "binary_dilation"])
    def test_erosion_dilation(self, op, iterations, border_value):
        x = _binary((16, 17))
        got = getattr(tmorph, op)(
            x, iterations=iterations, border_value=border_value
        )
        exp = getattr(ndi, op)(
            x, iterations=iterations, border_value=border_value
        )
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("op", ["binary_erosion", "binary_dilation"])
    def test_structure(self, op):
        x = _binary((16, 17))
        s = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 1]], bool)
        got = getattr(tmorph, op)(x, structure=s)
        exp = getattr(ndi, op)(x, structure=s)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("origin", [-1, 0, 1])
    @pytest.mark.parametrize("op", ["binary_erosion", "binary_dilation"])
    def test_origin(self, op, origin):
        x = _binary((16, 17))
        s = np.ones((3, 3), bool)
        got = getattr(tmorph, op)(x, structure=s, origin=origin)
        exp = getattr(ndi, op)(x, structure=s, origin=origin)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_even_structure(self):
        x = _binary((12, 13))
        s = np.ones((2, 2), bool)
        for op in ["binary_erosion", "binary_dilation"]:
            got = getattr(tmorph, op)(x, structure=s)
            exp = getattr(ndi, op)(x, structure=s)
            np.testing.assert_array_equal(np.asarray(got), exp, err_msg=op)

    def test_mask(self):
        x = _binary((14, 15))
        mask = _binary((14, 15), seed=3)
        got = tmorph.binary_dilation(x, iterations=3, mask=mask)
        exp = ndi.binary_dilation(x, iterations=3, mask=mask)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_mask_fixpoint(self):
        x = np.zeros((14, 15), bool)
        x[7, 7] = True
        mask = _binary((14, 15), seed=4, p=0.3)
        mask[7, 7] = True
        got = tmorph.binary_dilation(x, iterations=-1, mask=mask)
        exp = ndi.binary_dilation(x, iterations=-1, mask=mask)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("op", ["binary_opening", "binary_closing"])
    def test_opening_closing(self, op):
        x = _binary((20, 20), p=0.3)
        got = getattr(tmorph, op)(x)
        exp = getattr(ndi, op)(x)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_3d(self):
        x = _binary((8, 9, 10))
        got = tmorph.binary_erosion(x)
        exp = ndi.binary_erosion(x)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_hit_or_miss(self):
        x = np.zeros((10, 10), bool)
        x[3:7, 3:7] = True
        x[4, 4] = False
        s1 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
        got = tmorph.binary_hit_or_miss(x, structure1=s1)
        exp = ndi.binary_hit_or_miss(x, structure1=s1)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_hit_or_miss_two_structures(self):
        x = _binary((12, 12), seed=5)
        s1 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
        s2 = np.array([[1, 0, 1], [0, 0, 0], [1, 0, 1]], bool)
        got = tmorph.binary_hit_or_miss(x, s1, s2)
        exp = ndi.binary_hit_or_miss(x, s1, s2)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_propagation(self):
        x = np.zeros((12, 12), bool)
        x[5, 5] = True
        mask = _binary((12, 12), seed=6, p=0.25)
        mask[5, 5] = True
        got = tmorph.binary_propagation(x, mask=mask)
        exp = ndi.binary_propagation(x, mask=mask)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_fill_holes(self):
        x = np.zeros((12, 13), bool)
        x[2:10, 2:11] = True
        x[4:7, 5:8] = False
        got = tmorph.binary_fill_holes(x)
        exp = ndi.binary_fill_holes(x)
        np.testing.assert_array_equal(np.asarray(got), exp)


class TestGrey:
    @pytest.mark.parametrize("mode", ["reflect", "nearest", "constant"])
    @pytest.mark.parametrize(
        "op", ["grey_erosion", "grey_dilation", "grey_opening", "grey_closing"]
    )
    def test_size(self, op, mode):
        x = _grey((15, 16))
        got = getattr(tmorph, op)(x, size=3, mode=mode, cval=1.0)
        exp = getattr(ndi, op)(x, size=3, mode=mode, cval=1.0)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("op", ["grey_erosion", "grey_dilation"])
    def test_footprint(self, op):
        x = _grey((15, 16))
        fp = np.array([[0, 1, 0], [1, 1, 1], [1, 0, 0]], bool)
        got = getattr(tmorph, op)(x, footprint=fp)
        exp = getattr(ndi, op)(x, footprint=fp)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("op", ["grey_erosion", "grey_dilation"])
    def test_structure(self, op):
        x = _grey((15, 16))
        s = np.array([[0.0, 1.0, 0.0], [1.0, 2.0, 1.0], [0.0, 1.0, 0.0]])
        got = getattr(tmorph, op)(x, structure=s)
        exp = getattr(ndi, op)(x, structure=s)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize("op", ["grey_erosion", "grey_dilation"])
    def test_structure_asymmetric(self, op):
        x = _grey((15, 16), seed=2)
        s = np.arange(6, dtype=np.float64).reshape(2, 3)
        fp = np.array([[1, 0, 1], [1, 1, 0]], bool)
        got = getattr(tmorph, op)(x, structure=s, footprint=fp)
        exp = getattr(ndi, op)(x, structure=s, footprint=fp)
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_int_dtype(self):
        x = _grey((12, 13), np.int32)
        got = tmorph.grey_dilation(x, size=3)
        exp = ndi.grey_dilation(x, size=3)
        np.testing.assert_array_equal(np.asarray(got), exp)

    @pytest.mark.parametrize(
        "op",
        [
            "morphological_gradient",
            "morphological_laplace",
            "white_tophat",
            "black_tophat",
        ],
    )
    def test_derived(self, op):
        x = _grey((15, 16))
        got = getattr(tmorph, op)(x, size=3)
        exp = getattr(ndi, op)(x, size=3)
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-12, atol=1e-12)
