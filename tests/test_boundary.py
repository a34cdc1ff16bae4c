"""Tests for core boundary-mode semantics vs numpy.pad and scipy behavior."""

import numpy as np
import pytest

from cupyimg_tpu.core import boundary


@pytest.mark.parametrize(
    "mode,np_mode",
    [
        ("reflect", "symmetric"),
        ("grid-mirror", "symmetric"),
        ("mirror", "reflect"),
        ("nearest", "edge"),
        ("wrap", "wrap"),
        ("grid-wrap", "wrap"),
    ],
)
@pytest.mark.parametrize("pad", [(0, 0), (1, 2), (3, 3), (5, 7)])
def test_pad_matches_numpy(mode, np_mode, pad):
    x = np.arange(1, 9, dtype=np.float64)
    expected = np.pad(x, [pad], mode=np_mode)
    got = boundary.pad(x, [pad], mode)
    np.testing.assert_array_equal(np.asarray(got), expected)


@pytest.mark.parametrize("mode", ["constant", "grid-constant"])
def test_pad_constant(mode):
    x = np.arange(1, 5, dtype=np.float32)
    got = boundary.pad(x, [(2, 3)], mode, cval=-1.5)
    expected = np.pad(x, [(2, 3)], mode="constant", constant_values=-1.5)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_pad_2d_mixed():
    x = np.arange(12, dtype=np.float64).reshape(3, 4)
    got = boundary.pad(x, [(2, 1), (1, 2)], "reflect")
    expected = np.pad(x, [(2, 1), (1, 2)], mode="symmetric")
    np.testing.assert_array_equal(np.asarray(got), expected)


@pytest.mark.parametrize("n", [1, 2, 5])
@pytest.mark.parametrize(
    "mode", ["reflect", "mirror", "nearest", "wrap", "grid-wrap"]
)
def test_pad_large_padding(mode, n):
    """Pads larger than the axis length must still be well-defined."""
    x = np.arange(1, n + 1, dtype=np.float64)
    got = np.asarray(boundary.pad(x, [(3 * n + 2, 3 * n + 1)], mode))
    # brute-force oracle via index map semantics
    idx = np.arange(-(3 * n + 2), n + 3 * n + 1)
    if mode == "reflect":
        period = 2 * n
        im = idx % period
        ref_idx = np.where(im < n, im, period - 1 - im)
    elif mode == "mirror":
        if n == 1:
            ref_idx = np.zeros_like(idx)
        else:
            period = 2 * n - 2
            im = idx % period
            ref_idx = np.where(im < n, im, period - im)
    elif mode == "nearest":
        ref_idx = np.clip(idx, 0, n - 1)
    else:
        ref_idx = idx % n
    np.testing.assert_array_equal(got, x[ref_idx])


def test_check_mode_rejects_unknown():
    with pytest.raises(RuntimeError):
        boundary.check_mode("bogus")
