"""Ported reference random_noise suite
(cupyimg/skimage/util/tests/test_random_noise.py), adapted to be
RNG-value-agnostic: the reference pins cupy's bit streams, so the
assertions here keep its behavior contracts (determinism per seed,
salt/pepper value and proportion invariants, per-region localvar
variances, signed/unsigned clipping ranges) on synthetic images."""

import numpy as np
import pytest

import cupyimg_tpu.skimage.util as util

random_noise = util.random_noise
img_as_float = util.img_as_float


def _cam():
    rng = np.random.RandomState(3)
    return np.clip(
        rng.rand(128, 128) * 0.8 + 0.1, 0, 1
    ).astype(np.float64)


def test_set_seed():
    cam = _cam()
    a = np.asarray(random_noise(cam, seed=42))
    b = np.asarray(random_noise(cam, seed=42))
    np.testing.assert_array_equal(a, b)


def test_salt():
    cam = _cam()
    noisy = np.asarray(
        random_noise(cam, seed=42, mode="salt", amount=0.15)
    )
    saltmask = cam != noisy
    np.testing.assert_allclose(noisy[saltmask], 1.0)
    proportion = saltmask.sum() / cam.size
    assert 0.11 < proportion <= 0.15


def test_salt_p1():
    image = np.random.RandomState(0).rand(2, 3)
    noisy = np.asarray(random_noise(image, mode="salt", amount=1))
    np.testing.assert_array_equal(noisy, np.ones((2, 3)))


def test_singleton_dim():
    image = np.random.RandomState(0).rand(1, 200)
    noisy = np.asarray(
        random_noise(image, mode="salt", amount=0.1, seed=42)
    )
    n = int((noisy == 1).sum())
    assert 10 <= n <= 30


def test_pepper():
    cam = _cam()
    noisy = np.asarray(
        random_noise(cam, seed=42, mode="pepper", amount=0.15)
    )
    peppermask = cam != noisy
    np.testing.assert_allclose(noisy[peppermask], 0.0)
    proportion = peppermask.sum() / cam.size
    assert 0.11 < proportion <= 0.15

    # pepper on signed images writes -1, not 0
    data_signed = cam * 2.0 - 1.0
    orig_neg = (data_signed == -1).sum()
    noisy_signed = np.asarray(
        random_noise(data_signed, seed=42, mode="pepper", amount=0.15)
    )
    proportion = ((noisy_signed == -1).sum() - orig_neg) / cam.size
    assert 0.11 < proportion <= 0.15


def test_salt_and_pepper():
    cam = _cam()
    noisy = np.asarray(
        random_noise(
            cam, seed=42, mode="s&p", amount=0.15, salt_vs_pepper=0.25
        )
    )
    saltmask = (cam != noisy) & (noisy == 1.0)
    peppermask = (cam != noisy) & (noisy == 0.0)
    changed = (cam != noisy)
    # every change is to exactly 0 or 1
    assert (saltmask.sum() + peppermask.sum()) == changed.sum()
    proportion = changed.sum() / cam.size
    assert 0.11 < proportion <= 0.18
    assert 0.18 < saltmask.sum() / peppermask.sum() < 0.45


def test_gaussian():
    data = np.zeros((128, 128)) + 0.5
    noisy = np.asarray(random_noise(data, seed=42, var=0.01))
    assert 0.008 < noisy.var() < 0.012

    noisy = np.asarray(
        random_noise(data, seed=42, mean=0.3, var=0.015, clip=False)
    )
    assert 0.28 < noisy.mean() - 0.5 < 0.32
    assert 0.012 < noisy.var() < 0.018


def test_localvar():
    data = np.zeros((128, 128)) + 0.5
    local_vars = np.zeros((128, 128)) + 0.001
    local_vars[:64, 64:] = 0.1
    local_vars[64:, :64] = 0.25
    local_vars[64:, 64:] = 0.45

    noisy = np.asarray(
        random_noise(
            data, mode="localvar", seed=42, local_vars=local_vars,
            clip=False,
        )
    )
    assert 0.0 < noisy[:64, :64].var() < 0.002
    assert 0.087 < noisy[:64, 64:].var() < 0.115
    assert 0.225 < noisy[64:, :64].var() < 0.275
    assert 0.41 < noisy[64:, 64:].var() < 0.49

    bad_local_vars = np.zeros_like(data)
    with pytest.raises(ValueError):
        random_noise(
            data, mode="localvar", seed=42, local_vars=bad_local_vars
        )
    bad_local_vars = bad_local_vars + 0.1
    bad_local_vars[0, 0] = -1
    with pytest.raises(ValueError):
        random_noise(
            data, mode="localvar", seed=42, local_vars=bad_local_vars
        )


def test_speckle_statistics():
    data = np.zeros((128, 128)) + 0.1
    noisy = np.asarray(
        random_noise(
            data, mode="speckle", seed=42, mean=0.1, var=0.02,
            clip=False,
        )
    )
    # out = x + x*n with n ~ N(0.1, 0.02): mean 0.1*1.1, var 0.01*0.02
    assert abs(noisy.mean() - 0.11) < 0.002
    assert 0.00015 < noisy.var() < 0.00025


def test_poisson_statistics():
    data = (_cam() * 255).astype(np.uint8)
    noisy = np.asarray(
        random_noise(data, mode="poisson", seed=42, clip=False)
    )
    x = np.asarray(img_as_float(data))
    # Poisson(x * 256)/256: mean ~ x, var ~ x/256
    assert abs(noisy.mean() - x.mean()) < 0.01
    resid_var = (noisy - x).var()
    assert 0.7 * (x.mean() / 256) < resid_var < 1.3 * (x.mean() / 256)


def test_clip_poisson():
    data = (_cam() * 255).astype(np.uint8)
    data_signed = np.asarray(img_as_float(data)) * 2.0 - 1.0

    p1 = np.asarray(random_noise(data, mode="poisson", seed=42,
                                 clip=True))
    p2 = np.asarray(random_noise(data_signed, mode="poisson", seed=42,
                                 clip=True))
    assert p1.max() <= 1.0 and p1.min() >= 0.0
    assert p2.max() <= 1.0 and p2.min() >= -1.0

    p3 = np.asarray(random_noise(data, mode="poisson", seed=42,
                                 clip=False))
    assert p3.max() > 1.0


def test_clip_gaussian():
    data = (_cam() * 255).astype(np.uint8)
    data_signed = np.asarray(img_as_float(data)) * 2.0 - 1.0

    g1 = np.asarray(random_noise(data, mode="gaussian", seed=42,
                                 clip=True))
    g2 = np.asarray(random_noise(data_signed, mode="gaussian", seed=42,
                                 clip=True))
    assert g1.max() == 1.0 and g1.min() == 0.0
    assert g2.max() == 1.0 and g2.min() == -1.0

    g3 = np.asarray(random_noise(data, mode="gaussian", seed=42,
                                 clip=False))
    assert g3.max() > 1.0 and g3.min() < 0.0


def test_clip_speckle():
    data = (_cam() * 255).astype(np.uint8)
    data_signed = np.asarray(img_as_float(data)) * 2.0 - 1.0

    s1 = np.asarray(random_noise(data, mode="speckle", seed=42,
                                 clip=True))
    s2 = np.asarray(random_noise(data_signed, mode="speckle", seed=42,
                                 clip=True))
    assert s1.max() == 1.0 and s1.min() >= 0.0
    assert s2.max() == 1.0 and s2.min() >= -1.0

    s3 = np.asarray(random_noise(data, mode="speckle", seed=42,
                                 clip=False))
    assert s3.max() > 1.0


def test_bad_mode_raises():
    with pytest.raises(KeyError):
        random_noise(np.zeros((8, 8)), mode="bogus")
