"""Golden-file test tier: bundled test vectors from the reference suite.

- ndimage label vectors (scipy 0.10 outputs; reference
  cupyimg/scipy/ndimage/tests/data/) exercise connected-component
  labeling over every bundled structuring element.
- CIEDE2000 vectors (Sharma et al. implementation notes; reference
  cupyimg/skimage/color/tests/ciede2000_test_data.txt).
- Registration image pairs (reference
  cupyimg/skimage/registration/tests/data/): translated image pairs
  with known shifts for phase_cross_correlation.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestLabelGolden:
    def test_label_vectors(self):
        import cupyimg_tpu.scipy.ndimage as ndi

        data = np.loadtxt(
            os.path.join(DATA, "ndimage", "label_inputs.txt")
        ).reshape(-1, 7, 7)
        strels = np.loadtxt(
            os.path.join(DATA, "ndimage", "label_strels.txt")
        ).reshape(-1, 3, 3)
        results = np.loadtxt(
            os.path.join(DATA, "ndimage", "label_results.txt")
        ).reshape(-1, 7, 7)
        r = 0
        for i in range(data.shape[0]):
            for j in range(strels.shape[0]):
                out, n = ndi.label(
                    jnp.asarray(data[i]), jnp.asarray(strels[j])
                )
                expected = results[r]
                r += 1
                # label ids must match exactly: the reference relabels
                # roots in first-appearance order, as do we
                np.testing.assert_array_equal(
                    np.asarray(out), expected,
                    err_msg=f"input {i}, strel {j}",
                )
                assert int(n) == int(expected.max())


class TestCIEDE2000Golden:
    def test_sharma_vectors(self):
        from cupyimg_tpu.skimage import color

        path = os.path.join(DATA, "color", "ciede2000_test_data.txt")
        # row layout (Sharma implementation notes): pair, 1, L1, a1,
        # b1, <6 intermediates>, <5 weights>, RT, dE, 2, L2, a2, b2, ...
        rows = np.loadtxt(path)
        lab1 = rows[:, 2:5]
        lab2 = rows[:, 17:20]
        dE2 = rows[:, 15]
        got = np.asarray(
            color.deltaE_ciede2000(
                jnp.asarray(lab1[:, None, :]),
                jnp.asarray(lab2[:, None, :]),
            )
        ).ravel()
        np.testing.assert_allclose(got, dE2, rtol=1e-4)


class TestRegistrationGolden:
    @pytest.mark.parametrize("xi, yi", [(75, 75), (-130, 130),
                                        (130, 130)])
    def test_masked_registration_padfield_data(self, xi, yi):
        """Masked translation registration on Padfield's published
        image pairs (reference
        test_masked_phase_cross_correlation.py:134-182): recovered
        (shift_x, shift_y) must equal (-xi, yi) exactly."""
        from PIL import Image

        from cupyimg_tpu.skimage.registration import (
            phase_cross_correlation,
        )

        fixed = np.asarray(
            Image.open(os.path.join(
                DATA, "registration", f"OriginalX{xi:d}Y{yi:d}.png"
            )).convert("L"),
            dtype=np.float32,
        )
        moving = np.asarray(
            Image.open(os.path.join(
                DATA, "registration",
                f"TransformedX{xi:d}Y{yi:d}.png"
            )).convert("L"),
            dtype=np.float32,
        )
        shift_y, shift_x = np.asarray(
            phase_cross_correlation(
                jnp.asarray(fixed),
                jnp.asarray(moving),
                reference_mask=jnp.asarray(fixed != 0),
                moving_mask=jnp.asarray(moving != 0),
                overlap_ratio=0.1,
            )
        )
        assert (shift_x, shift_y) == (-xi, yi)
