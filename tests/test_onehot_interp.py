"""One-hot MXU affine resampling tests.

The path is TPU-gated in production; here the gate is bypassed so the
pure-XLA core runs on CPU and is compared against scipy and against the
gather engine it replaces.
"""

import numpy as np
import pytest
import scipy.ndimage as sndi

import jax
import jax.numpy as jnp

import cupyimg_tpu.ops.onehot_interp as oh
import cupyimg_tpu.scipy.ndimage as ndi
from cupyimg_tpu.core.config import config as _config


@pytest.fixture(autouse=True)
def _f32_coords():
    """The public API routes to the f32 samplers only outside the f64
    parity tier (interpolation._coord_dtype); force f32 here so the
    sampler paths under test are actually taken on the CPU backend."""
    old = _config.coord_precision
    _config.coord_precision = "f32"
    yield
    _config.coord_precision = old


@pytest.fixture
def force_onehot(monkeypatch):
    real = oh.supports_affine

    def patched(x, matrix, order):
        import numpy as _np

        m = _np.asarray(matrix)
        if m.shape != (2, 2):
            return False
        if order not in (0, 1, 3):
            return False
        return x.ndim == 2 and _np.dtype(x.dtype).kind == "f"

    monkeypatch.setattr(oh, "supports_affine", patched)
    yield
    monkeypatch.setattr(oh, "supports_affine", real)


MAT = np.array([[0.9, 0.1], [-0.1, 0.9]])


class TestOneHotAffine:
    @pytest.mark.parametrize("order", [0, 1, 3])
    @pytest.mark.parametrize(
        "mode", ["nearest", "constant", "mirror", "grid-constant"]
    )
    def test_matches_scipy(self, force_onehot, order, mode):
        if order == 0 and mode == "mirror":
            pytest.skip("tie-sensitive mode routed to gather path")
        x = np.random.RandomState(0).rand(160, 150).astype(
            np.float32
        )
        got = oh.affine_onehot_2d(
            jnp.asarray(x), MAT, (1.5, -2.0), order, mode, 0.3,
            (160, 150),
        )
        assert got is not None
        # caller applies the legacy-constant outer mask; emulate it
        got = np.asarray(got)
        exp = sndi.affine_transform(
            x.astype(np.float64), MAT, offset=(1.5, -2.0),
            order=order, mode=mode, cval=0.3, prefilter=False,
        )
        if mode == "constant":
            ii, jj = np.mgrid[0:160, 0:150]
            r = MAT[0, 0] * ii + MAT[0, 1] * jj + 1.5
            c = MAT[1, 0] * ii + MAT[1, 1] * jj - 2.0
            keep = (
                (r >= 0) & (r <= 159) & (c >= 0) & (c <= 149)
            )
        else:
            keep = np.ones((160, 150), bool)
        # order-0 ties under f32 coords: compare off-tie points
        if order == 0:
            rr = MAT[0, 0] * np.mgrid[0:160, 0:150][0] + \
                MAT[0, 1] * np.mgrid[0:160, 0:150][1] + 1.5
            cc = MAT[1, 0] * np.mgrid[0:160, 0:150][0] + \
                MAT[1, 1] * np.mgrid[0:160, 0:150][1] - 2.0
            off_tie = (np.abs(rr % 1 - 0.5) > 1e-3) & (
                np.abs(cc % 1 - 0.5) > 1e-3
            )
            keep &= off_tie
        np.testing.assert_allclose(
            got[keep], exp[keep], atol=5e-4
        )

    def test_order3_prefiltered_end_to_end(self, force_onehot):
        # through the public affine_transform (prefilter + masks)
        x = np.random.RandomState(1).rand(200, 190).astype(
            np.float32
        )
        got = np.asarray(
            ndi.affine_transform(
                jnp.asarray(x), MAT, order=3, mode="mirror"
            )
        )
        exp = sndi.affine_transform(
            x.astype(np.float64), MAT, order=3, mode="mirror"
        )
        np.testing.assert_allclose(got, exp, atol=5e-4)

    def test_fallbacks(self):
        x = jnp.zeros((64, 64), jnp.float32)
        # legacy wrap and order-0 reflect must decline
        assert (
            oh.affine_onehot_2d(
                x, MAT, (0, 0), 1, "wrap", 0.0, (64, 64)
            )
            is None
        )
        assert (
            oh.affine_onehot_2d(
                x, MAT, (0, 0), 0, "reflect", 0.0, (64, 64)
            )
            is None
        )

    def test_supports_gating(self):
        big = jnp.zeros((2048, 2048), jnp.float32)
        # blow up the per-block bbox with a huge minification
        m = np.array([[40.0, 0.0], [0.0, 40.0]])
        assert not oh.supports_affine(big, m, 1)
        assert not oh.supports_affine(
            jnp.zeros((8, 8, 8), jnp.float32), MAT, 1
        )


class TestMapOnehot:
    """Locality-adaptive one-hot map_coordinates path (CPU, gate patched)."""

    @pytest.fixture(autouse=True)
    def force_map_onehot(self, monkeypatch):
        real = oh.supports_map

        def patched(x, coords, order, mode):
            if x.ndim != 2 or len(coords) != 2:
                return False
            if isinstance(x, jax.core.Tracer) or any(
                isinstance(c, jax.core.Tracer) for c in coords
            ):
                return False
            if order not in (1, 3):
                return False
            if mode not in (
                "nearest", "reflect", "mirror", "grid-wrap",
                "grid-mirror", "constant", "grid-constant",
            ):
                return False
            return True

        monkeypatch.setattr(oh, "supports_map", patched)
        yield
        monkeypatch.setattr(oh, "supports_map", real)

    def _field(self, H, W):
        rr, cc = np.mgrid[0:H, 0:W].astype(np.float32)
        r = rr + 3.0 * np.sin(cc / 17.0) - 2.0
        c = cc + 4.0 * np.cos(rr / 23.0) + 1.5
        return np.stack([r, c])

    @pytest.mark.parametrize("order", [1, 3])
    @pytest.mark.parametrize(
        "mode",
        ["nearest", "constant", "grid-constant", "reflect", "mirror",
         "grid-wrap"],
    )
    def test_modes_vs_scipy(self, order, mode):
        rng = np.random.RandomState(0)
        x = rng.rand(180, 200).astype(np.float32)
        coords = self._field(*x.shape)
        got = np.asarray(
            ndi.map_coordinates(
                jnp.asarray(x), jnp.asarray(coords), order=order,
                mode=mode, cval=0.3,
            )
        )
        exp = sndi.map_coordinates(
            x.astype(np.float64), coords.astype(np.float64), order=order,
            mode=mode, cval=0.3,
        )
        assert np.abs(got - exp).max() < 2e-5

    def test_far_out_of_domain(self):
        rng = np.random.RandomState(1)
        x = rng.rand(150, 150).astype(np.float32)
        rr, cc = np.mgrid[0:150, 0:150].astype(np.float32)
        for shift, mode in [
            (-170.0, "nearest"), (300.0, "constant"), (-170.0, "grid-wrap"),
        ]:
            coords = np.stack([rr + shift, cc - shift / 2])
            got = np.asarray(
                ndi.map_coordinates(
                    jnp.asarray(x), jnp.asarray(coords), order=1,
                    mode=mode, cval=0.25,
                )
            )
            exp = sndi.map_coordinates(
                x.astype(np.float64), coords.astype(np.float64), order=1,
                mode=mode, cval=0.25,
            )
            assert np.abs(got - exp).max() < 2e-6, mode

    def test_nonsquare_output_shape(self):
        rng = np.random.RandomState(2)
        x = rng.rand(130, 277).astype(np.float32)
        rr, cc = np.mgrid[0:301, 0:99].astype(np.float32)
        coords = np.stack([rr * 0.41 + 2.3 * np.sin(cc / 7), cc * 2.7 - 1.1])
        got = np.asarray(
            ndi.map_coordinates(
                jnp.asarray(x), jnp.asarray(coords), order=3, mode="reflect"
            )
        )
        exp = sndi.map_coordinates(
            x.astype(np.float64), coords.astype(np.float64), order=3,
            mode="reflect",
        )
        assert np.abs(got - exp).max() < 2e-6

    def test_scattered_coords_fall_back(self):
        # per-block span exceeds every bucket -> path declines (None) and
        # map_coordinates still returns the gather result
        rng = np.random.RandomState(3)
        x = rng.rand(700, 700).astype(np.float32)
        coords = rng.rand(2, 256, 256).astype(np.float32) * 699
        r = oh.map_onehot_2d(
            jnp.asarray(x),
            [jnp.asarray(coords[0]), jnp.asarray(coords[1])],
            1, "nearest", 0.0,
        )
        assert r is None
        got = np.asarray(
            ndi.map_coordinates(
                jnp.asarray(x), jnp.asarray(coords), order=1, mode="nearest"
            )
        )
        exp = sndi.map_coordinates(
            x.astype(np.float64), coords.astype(np.float64), order=1,
            mode="nearest",
        )
        assert np.abs(got - exp).max() < 2e-6

    def test_tracer_declines(self):
        x = jnp.zeros((600, 600), np.float32)
        rr, cc = np.mgrid[0:600, 0:600].astype(np.float32)

        @jax.jit
        def f(img, r, c):
            out = ndi.map_coordinates(img, jnp.stack([r, c]), order=1,
                                      mode="nearest")
            return out

        # must trace through (gate declines tracers) without error
        f(x, jnp.asarray(rr), jnp.asarray(cc))


class TestBatchedPlaneOnehot:
    """nd affine with one coupled plane -> batched one-hot sampler,
    incl. order >= 2 spline reconstruction along identity axes."""

    @pytest.fixture(autouse=True)
    def force_plane_onehot(self, monkeypatch):
        real = oh.supports_affine

        def patched(x, matrix, order):
            m = np.asarray(matrix)
            return (
                x.ndim == 2 and m.shape == (2, 2)
                and order in (0, 1, 3)
                and np.dtype(x.dtype).kind == "f"
            )

        monkeypatch.setattr(oh, "supports_affine", patched)
        yield
        monkeypatch.setattr(oh, "supports_affine", real)

    def _vol(self):
        return np.random.RandomState(0).rand(20, 48, 52).astype(np.float32)

    @pytest.mark.parametrize("order", [1, 3])
    @pytest.mark.parametrize(
        "mode",
        ["constant", "nearest", "reflect", "mirror", "grid-wrap",
         "grid-constant"],
    )
    def test_plane_rotation_vs_scipy(self, order, mode):
        vol = self._vol()
        c, s = np.cos(0.3), np.sin(0.3)
        M = np.eye(3)
        M[1, 1], M[1, 2], M[2, 1], M[2, 2] = c, -s, s, c
        off = np.array([0.0, 3.2, -1.7])
        got = np.asarray(
            ndi.affine_transform(
                jnp.asarray(vol), M, off, order=order, mode=mode, cval=0.4
            )
        )
        exp = sndi.affine_transform(
            vol.astype(np.float64), M, off, order=order, mode=mode,
            cval=0.4,
        )
        assert np.abs(got - exp).max() < 5e-5

    def test_spy_confirms_path_taken(self, monkeypatch):
        calls = {"n": 0}
        real = oh.affine_onehot_batched2d

        def spy(*a, **k):
            r = real(*a, **k)
            if r is not None:
                calls["n"] += 1
            return r

        monkeypatch.setattr(oh, "affine_onehot_batched2d", spy)
        vol = self._vol()
        M = np.eye(3)
        c, s = np.cos(0.2), np.sin(0.2)
        M[0, 0], M[0, 2], M[2, 0], M[2, 2] = c, -s, s, c
        got = np.asarray(
            ndi.affine_transform(jnp.asarray(vol), M, order=3,
                                 mode="mirror")
        )
        assert calls["n"] == 1
        exp = sndi.affine_transform(vol.astype(np.float64), M, order=3,
                                    mode="mirror")
        assert np.abs(got - exp).max() < 5e-5

    def test_rotate_volume(self):
        vol = self._vol()
        got = np.asarray(
            ndi.rotate(jnp.asarray(vol), 17.0, axes=(1, 2), reshape=True,
                       order=3)
        )
        exp = sndi.rotate(vol.astype(np.float64), 17.0, axes=(1, 2),
                          reshape=True, order=3)
        assert got.shape == exp.shape
        assert np.abs(got - exp).max() < 5e-5

    def test_even_orders_fall_back_correctly(self):
        vol = self._vol()
        M = np.eye(3)
        c, s = np.cos(0.3), np.sin(0.3)
        M[1, 1], M[1, 2], M[2, 1], M[2, 2] = c, -s, s, c
        for order in (2, 4):
            got = np.asarray(
                ndi.affine_transform(jnp.asarray(vol), M, order=order,
                                     mode="reflect")
            )
            exp = sndi.affine_transform(vol.astype(np.float64), M,
                                        order=order, mode="reflect")
            assert np.abs(got - exp).max() < 5e-5
