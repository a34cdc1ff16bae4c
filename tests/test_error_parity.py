"""Error-path parity tier: both backends must raise equivalent errors
(the reference harness's error-compatibility check, helper.py:105-214 —
scipy-style RuntimeError/ValueError/TypeError, never raw XLA errors)."""

import numpy as np
import pytest

import cupyimg_tpu.testing as testing


raises = testing.numpy_cupyimg_raises


def test_invalid_spline_order():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.shift(xp.ones((4, 4)), (1.0, 1.0), order=7)

    run()


def test_negative_spline_order():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.zoom(xp.ones((4, 4)), 2.0, order=-1)

    run()


def test_invalid_mode():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.uniform_filter(xp.ones((4, 4)), 3, mode="bogus")

    run()


def test_interp_invalid_mode():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.shift(xp.ones((4, 4)), (0.5, 0.5), mode="bogus")

    run()


def test_origin_outside_footprint():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.uniform_filter(xp.ones((6, 6)), size=3, origin=4)

    run()


def test_weights_rank_mismatch():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.correlate(xp.ones((5, 5)), xp.ones((3, 3, 3)))

    run()


def test_map_coordinates_bad_coord_rank():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.map_coordinates(xp.ones((5, 5)),
                                    xp.ones((3, 10)), order=1)

    run()


def test_affine_bad_matrix_shape():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.affine_transform(xp.ones((5, 5)),
                                     xp.ones((3, 3, 3)))

    run()


def test_rank_filter_rank_out_of_range():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.rank_filter(xp.ones((5, 5)), 99, size=3)

    run()


def test_percentile_out_of_range():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.percentile_filter(xp.ones((5, 5)), 150.0, size=3)

    run()


def test_spline_filter_order_out_of_range():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.spline_filter(xp.ones((5, 5)), order=6)

    run()


def test_binary_erosion_bad_structure_rank():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.binary_erosion(xp.ones((5, 5), bool),
                                   xp.ones((3, 3, 3), bool))

    run()


def test_label_bad_structure():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.label(xp.ones((5, 5)), structure=xp.ones((4, 4)))

    run()


def test_zoom_bad_zoom_length():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.zoom(xp.ones((4, 4)), (2.0, 2.0, 2.0))

    run()


def test_gaussian_bad_sigma_length():
    @raises(scipy_name="scp")
    def run(xp, scp):
        scp.ndimage.gaussian_filter(xp.ones((4, 4)), (1.0, 1.0, 1.0))

    run()


def test_upfirdn_empty_h():
    import cupyimg_tpu.scipy.signal as csig
    import scipy.signal as ssig
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        ssig.upfirdn(np.array([]), np.arange(5.0), up=1, down=1)
    with pytest.raises(ValueError):
        csig.upfirdn(jnp.asarray(np.array([])), jnp.arange(5.0),
                     up=1, down=1)


def test_upfirdn_bad_updown():
    import cupyimg_tpu.scipy.signal as csig
    import scipy.signal as ssig
    import jax.numpy as jnp

    with pytest.raises(ValueError):
        ssig.upfirdn(np.ones(3), np.arange(5.0), up=0)
    with pytest.raises(ValueError):
        csig.upfirdn(jnp.ones(3), jnp.arange(5.0), up=0)
