"""Distance transform tests (scipy oracles) — functionality the
reference documents as missing (cupyimg morphology.py:32-38)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as sndi

import cupyimg_tpu.scipy.ndimage as ndi


def _mask(shape, seed=0, p=0.3):
    return np.random.RandomState(seed).rand(*shape) > p


class TestEDT:
    @pytest.mark.parametrize(
        "shape", [(32,), (24, 31), (12, 13, 14), (64, 64)]
    )
    def test_matches_scipy(self, shape):
        a = _mask(shape)
        got = np.asarray(ndi.distance_transform_edt(a))
        exp = sndi.distance_transform_edt(a)
        np.testing.assert_allclose(got, exp, atol=1e-5)

    @pytest.mark.parametrize("sampling", [2.5, (1.0, 3.0)])
    def test_sampling(self, sampling):
        a = _mask((24, 31), seed=1)
        got = np.asarray(
            ndi.distance_transform_edt(a, sampling=sampling)
        )
        exp = sndi.distance_transform_edt(a, sampling=sampling)
        np.testing.assert_allclose(got, exp, atol=1e-5)

    def test_indices(self):
        a = _mask((24, 31), seed=2)
        d, idx = ndi.distance_transform_edt(
            a, return_indices=True, return_distances=True
        )
        de = sndi.distance_transform_edt(a)
        np.testing.assert_allclose(np.asarray(d), de, atol=1e-5)
        ii = np.asarray(idx)
        assert ii.shape == (2, 24, 31)
        r, c = np.mgrid[0:24, 0:31]
        implied = np.hypot(r - ii[0], c - ii[1])
        # argmin ties may differ from scipy, but implied distances must
        # be exact and features must be background pixels
        np.testing.assert_allclose(implied, de, atol=1e-5)
        bg = ~a
        assert (bg[ii[0], ii[1]] | (de == 0)).all()

    def test_indices_only(self):
        a = _mask((16, 17), seed=3)
        idx = ndi.distance_transform_edt(
            a, return_distances=False, return_indices=True
        )
        assert np.asarray(idx).shape == (2, 16, 17)

    def test_all_foreground_and_all_background(self):
        ones = np.ones((8, 9), bool)
        d = np.asarray(ndi.distance_transform_edt(~ones))
        assert (d == 0).all()

    def test_validation(self):
        with pytest.raises(RuntimeError):
            ndi.distance_transform_edt(
                np.ones((4, 4)), return_distances=False,
                return_indices=False,
            )
        with pytest.raises(NotImplementedError):
            ndi.distance_transform_edt(
                np.ones((4, 4)), distances=np.zeros((4, 4))
            )


class TestCDT:
    @pytest.mark.parametrize("metric", ["taxicab", "chessboard"])
    @pytest.mark.parametrize("shape", [(24, 31), (10, 11, 12)])
    def test_matches_scipy(self, metric, shape):
        a = _mask(shape, seed=4)
        got = np.asarray(
            ndi.distance_transform_cdt(a, metric=metric)
        )
        exp = sndi.distance_transform_cdt(a, metric=metric)
        np.testing.assert_array_equal(got, exp)

    def test_bad_metric(self):
        with pytest.raises(ValueError):
            ndi.distance_transform_cdt(
                np.ones((4, 4)), metric="bogus"
            )


class TestBF:
    @pytest.mark.parametrize(
        "metric", ["euclidean", "taxicab", "chessboard"]
    )
    def test_matches_scipy(self, metric):
        a = _mask((20, 21), seed=5)
        got = np.asarray(
            ndi.distance_transform_bf(a, metric=metric)
        )
        exp = sndi.distance_transform_bf(a, metric=metric)
        np.testing.assert_allclose(got, exp, atol=1e-5)


def test_all_foreground_scipy_artifact():
    """No background anywhere: scipy's edt reports distance to a virtual
    zero at index (-1, 0, ..., 0); cdt returns -1 everywhere."""
    m = np.ones((4, 5), bool)
    got = np.asarray(ndi.distance_transform_edt(jnp.asarray(m)))
    np.testing.assert_allclose(got, sndi.distance_transform_edt(m),
                               atol=1e-5)
    got = np.asarray(ndi.distance_transform_edt(
        jnp.asarray(m), sampling=(2.0, 0.5)))
    np.testing.assert_allclose(
        got, sndi.distance_transform_edt(m, sampling=(2.0, 0.5)),
        atol=1e-5)
    d, i = ndi.distance_transform_edt(jnp.asarray(m), return_indices=True)
    ed, ei = sndi.distance_transform_edt(m, return_indices=True)
    np.testing.assert_array_equal(np.asarray(i), ei)
    got = np.asarray(ndi.distance_transform_cdt(jnp.asarray(m),
                                                metric="taxicab"))
    np.testing.assert_array_equal(
        got, sndi.distance_transform_cdt(m, metric="taxicab"))
