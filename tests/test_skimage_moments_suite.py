"""Upstream moments suite — TPU-native port.

Ports /root/reference/cupyimg/skimage/measure/tests/test_moments.py.
``skimage.draw.ellipsoid`` (unavailable here) is replaced by an inline
level-set ellipsoid with the same +1 padding convention; every oracle in
this file is analytic (translation/scale/rotation invariants), so no
image data is needed.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.scipy import ndimage as ndi
from cupyimg_tpu.skimage.measure import (
    moments,
    moments_central,
    moments_coords,
    moments_coords_central,
    moments_normalized,
    moments_hu,
    centroid,
    inertia_tensor,
    inertia_tensor_eigvals,
)


def _ellipsoid(a, b, c):
    """Boolean ellipsoid on the integer grid, one-voxel zero border
    (the skimage.draw.ellipsoid convention the reference relies on)."""
    za, zb, zc = int(np.ceil(a)), int(np.ceil(b)), int(np.ceil(c))
    z, y, x = np.mgrid[-za - 1:za + 2, -zb - 1:zb + 2, -zc - 1:zc + 2]
    return (z / a) ** 2 + (y / b) ** 2 + (x / c) ** 2 <= 1.0


def test_moments():
    image = np.zeros((20, 20), dtype=np.double)
    image[14, 14] = 1
    image[15, 15] = 1
    image[14, 15] = 0.5
    image[15, 14] = 0.5
    m = np.asarray(moments(jnp.asarray(image)))
    np.testing.assert_array_equal(m[0, 0], 3)
    np.testing.assert_almost_equal(m[1, 0] / m[0, 0], 14.5)
    np.testing.assert_almost_equal(m[0, 1] / m[0, 0], 14.5)


def test_moments_central():
    image = np.zeros((20, 20), dtype=np.double)
    image[14, 14] = 1
    image[15, 15] = 1
    image[14, 15] = 0.5
    image[15, 14] = 0.5
    ig = jnp.asarray(image)
    mu = moments_central(ig, (14.5, 14.5))

    mu_calc_centroid = moments_central(ig)
    np.testing.assert_array_equal(np.asarray(mu),
                                  np.asarray(mu_calc_centroid))

    image2 = np.zeros((20, 20), dtype=np.double)
    image2[16, 16] = 1
    image2[17, 17] = 1
    image2[16, 17] = 0.5
    image2[17, 16] = 0.5
    mu2 = moments_central(jnp.asarray(image2), (14.5 + 2, 14.5 + 2))
    # central moments must be translation invariant
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu2))


def test_moments_coords():
    image = np.zeros((20, 20), dtype=np.double)
    image[13:17, 13:17] = 1
    mu_image = moments(jnp.asarray(image))

    coords = jnp.asarray(
        [[r, c] for r in range(13, 17) for c in range(13, 17)],
        dtype=jnp.float64,
    )
    mu_coords = moments_coords(coords)
    np.testing.assert_array_almost_equal(
        np.asarray(mu_coords), np.asarray(mu_image)
    )


def test_moments_central_coords():
    image = np.zeros((20, 20), dtype=np.double)
    image[13:17, 13:17] = 1
    mu_image = moments_central(jnp.asarray(image), (14.5, 14.5))

    coords = jnp.asarray(
        [[r, c] for r in range(13, 17) for c in range(13, 17)],
        dtype=jnp.float64,
    )
    mu_coords = moments_coords_central(coords, (14.5, 14.5))
    np.testing.assert_array_almost_equal(
        np.asarray(mu_coords), np.asarray(mu_image)
    )

    mu_coords_calc_centroid = moments_coords_central(coords)
    np.testing.assert_array_almost_equal(
        np.asarray(mu_coords_calc_centroid), np.asarray(mu_coords)
    )

    image = np.zeros((20, 20), dtype=np.double)
    image[16:20, 16:20] = 1
    mu_image = moments_central(jnp.asarray(image), (14.5, 14.5))

    coords = jnp.asarray(
        [[r, c] for r in range(16, 20) for c in range(16, 20)],
        dtype=jnp.float64,
    )
    mu_coords = moments_coords_central(coords, (14.5, 14.5))
    np.testing.assert_array_almost_equal(
        np.asarray(mu_coords), np.asarray(mu_image)
    )


def test_moments_normalized():
    image = np.zeros((20, 20), dtype=np.double)
    image[13:17, 13:17] = 1
    mu = moments_central(jnp.asarray(image), (14.5, 14.5))
    nu = moments_normalized(mu)
    image2 = np.zeros((20, 20), dtype=np.double)
    image2[11:13, 11:13] = 1
    mu2 = moments_central(jnp.asarray(image2), (11.5, 11.5))
    nu2 = moments_normalized(mu2)
    # central moments must be translation and scale invariant
    np.testing.assert_array_almost_equal(
        np.asarray(nu), np.asarray(nu2), decimal=1
    )


def test_moments_normalized_3d():
    image = jnp.asarray(_ellipsoid(1, 1, 10))
    mu_image = moments_central(image)
    nu = np.asarray(moments_normalized(mu_image))
    assert nu[0, 0, 2] > nu[0, 2, 0]
    np.testing.assert_almost_equal(nu[0, 2, 0], nu[2, 0, 0])

    coords = jnp.stack(
        [jnp.asarray(c) for c in np.where(np.asarray(image))], axis=-1
    ).astype(jnp.float64)
    mu_coords = moments_coords_central(coords)
    np.testing.assert_array_almost_equal(
        np.asarray(mu_coords), np.asarray(mu_image)
    )


def test_moments_normalized_invalid():
    with pytest.raises(ValueError):
        moments_normalized(jnp.zeros((3, 3)), 3)
    with pytest.raises(ValueError):
        moments_normalized(jnp.zeros((3, 3)), 4)


def test_moments_hu():
    image = np.zeros((20, 20), dtype=np.double)
    image[13:15, 13:17] = 1
    mu = moments_central(jnp.asarray(image), (13.5, 14.5))
    nu = moments_normalized(mu)
    hu = moments_hu(nu)
    # shift by (2, 3), scale by 0.5, rotate 90 deg
    image2 = np.zeros((20, 20), dtype=np.double)
    image2[11, 11:13] = 1
    image2 = image2.T
    mu2 = moments_central(jnp.asarray(image2), (11.5, 11))
    nu2 = moments_normalized(mu2)
    hu2 = moments_hu(nu2)
    # Hu moments are translation/scale/rotation invariant
    np.testing.assert_array_almost_equal(
        np.asarray(hu), np.asarray(hu2), decimal=1
    )


def test_centroid():
    image = np.zeros((20, 20), dtype=np.double)
    image[14, 14:16] = 1
    image[15, 14:16] = 1 / 3
    image_centroid = centroid(jnp.asarray(image))
    np.testing.assert_allclose(
        np.asarray(image_centroid), (14.25, 14.5)
    )


def test_inertia_tensor_2d():
    image = np.zeros((40, 40))
    image[15:25, 5:35] = 1  # big horizontal rectangle
    ig = jnp.asarray(image)
    T = inertia_tensor(ig)
    T_np = np.asarray(T)
    assert T_np[0, 0] > T_np[1, 1]
    np.testing.assert_allclose(T_np[0, 1], 0)
    v0, v1 = inertia_tensor_eigvals(ig, T=T)
    np.testing.assert_allclose(
        np.sqrt(float(v0) / float(v1)), 3, rtol=0.01, atol=0.05
    )


def test_inertia_tensor_3d():
    image = jnp.asarray(_ellipsoid(10, 5, 3))
    T0 = inertia_tensor(image)
    eig0, V0 = np.linalg.eig(np.asarray(T0))
    v0 = V0[:, np.argmin(eig0)]
    assert np.allclose(v0, [1, 0, 0]) or np.allclose(-v0, [1, 0, 0])

    imrot = ndi.rotate(image.astype(float), 30, axes=(0, 1), order=1)
    Tr = inertia_tensor(imrot)
    eigr, Vr = np.linalg.eig(np.asarray(Tr))
    vr = Vr[:, np.argmin(eigr)]

    pi, cos, sin = np.pi, np.cos, np.sin
    R = np.array([
        [cos(pi / 6), -sin(pi / 6), 0],
        [sin(pi / 6), cos(pi / 6), 0],
        [0, 0, 1],
    ])
    expected_vr = R @ v0
    assert (
        np.allclose(vr, expected_vr, atol=1e-3, rtol=0.01)
        or np.allclose(-vr, expected_vr, atol=1e-3, rtol=0.01)
    )


def test_inertia_tensor_eigvals():
    # a positive semidefinite matrix must not produce a (slightly)
    # negative eigenvalue through floating-point rounding
    image = jnp.asarray(
        [
            [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
        ]
    )
    eigvals = inertia_tensor_eigvals(image=image)
    assert min(float(v) for v in eigvals) >= 0
