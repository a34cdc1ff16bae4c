"""Port of the reference skimage.color colorlabel suite
(cupyimg/skimage/color/tests/test_colorlabel.py) onto jnp +
cupyimg_tpu."""

import itertools
import warnings

import numpy as np
import pytest
import jax.numpy as jnp

from cupyimg_tpu.skimage.color.colorlabel import label2rgb

assert_array_almost_equal = np.testing.assert_array_almost_equal
assert_array_equal = np.testing.assert_array_equal


def test_deprecation_warning():
    image = jnp.ones((3, 3))
    label = jnp.ones((3, 3))

    with pytest.warns(FutureWarning) as record:
        label2rgb(image, label)

    expected_msg = "The new recommended value"
    assert str(record[0].message).startswith(expected_msg)


def test_shape_mismatch():
    image = jnp.ones((3, 3))
    label = jnp.ones((2, 2))
    with pytest.raises(ValueError):
        label2rgb(image, label, bg_label=-1)


def test_wrong_kind():
    label = jnp.ones((3, 3))
    # must not raise an error
    label2rgb(label, bg_label=-1)
    # kind='foo' is wrong
    with pytest.raises(ValueError):
        label2rgb(label, kind="foo", bg_label=-1)


def test_uint_image():
    rng = np.random.RandomState(0)
    img = jnp.asarray(
        rng.randint(0, 255, (10, 10)).astype(np.uint8)
    )
    labels = np.zeros((10, 10), dtype=np.int64)
    labels[1:3, 1:3] = 1
    labels[6:9, 6:9] = 2
    labels = jnp.asarray(labels)
    output = label2rgb(labels, image=img, bg_label=0)
    assert np.issubdtype(output.dtype, np.floating)
    assert float(output.max()) <= 1


def test_rgb():
    image = jnp.ones((1, 3))
    label = jnp.arange(3).reshape(1, -1)
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    rgb = label2rgb(
        label, image=image, colors=colors, alpha=1,
        image_alpha=1, bg_label=-1
    )
    assert_array_almost_equal(rgb, [colors])


def test_alpha():
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.uniform(size=(3, 3)))
    label = jnp.asarray(rng.randint(0, 9, size=(3, 3)))
    # alpha = 0 means rgb matches image exactly
    rgb = label2rgb(
        label, image=image, alpha=0, image_alpha=1, bg_label=-1
    )
    assert_array_almost_equal(rgb[..., 0], image)
    assert_array_almost_equal(rgb[..., 1], image)
    assert_array_almost_equal(rgb[..., 2], image)


def test_no_input_image():
    label = jnp.arange(3).reshape(1, -1)
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    rgb = label2rgb(label, colors=colors, bg_label=-1)
    assert_array_almost_equal(rgb, [colors])


def test_image_alpha():
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.uniform(size=(1, 3)))
    label = jnp.arange(3).reshape(1, -1)
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    # image_alpha = 0 means rgb matches label colors exactly
    rgb = label2rgb(
        label, image=image, colors=colors, alpha=1,
        image_alpha=0, bg_label=-1
    )
    assert_array_almost_equal(rgb, [colors])


def test_color_names():
    image = jnp.ones((1, 3))
    label = jnp.arange(3).reshape(1, -1)
    cnames = ["red", "lime", "blue"]
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    rgb = label2rgb(
        label, image=image, colors=cnames, alpha=1,
        image_alpha=1, bg_label=-1
    )
    assert_array_almost_equal(rgb, [colors])


def test_bg_and_color_cycle():
    image = jnp.zeros((1, 10))  # dummy image
    label = jnp.arange(10).reshape(1, -1)
    colors = [(1, 0, 0), (0, 0, 1)]
    bg_color = (0, 0, 0)
    rgb = label2rgb(
        label,
        image=image,
        bg_label=0,
        bg_color=bg_color,
        colors=colors,
        alpha=1,
    )
    assert_array_almost_equal(rgb[0, 0], bg_color)
    for pixel, color in zip(
        np.asarray(rgb)[0, 1:], itertools.cycle(colors)
    ):
        assert_array_almost_equal(pixel, color)


def test_negative_labels():
    labels = jnp.array([0, -1, -2, 0])
    rout = np.array(
        [
            (0.0, 0.0, 0.0),
            (0.0, 0.0, 1.0),
            (1.0, 0.0, 0.0),
            (0.0, 0.0, 0.0),
        ]
    )
    assert_array_almost_equal(
        rout, label2rgb(labels, bg_label=0, alpha=1, image_alpha=1)
    )


def test_nonconsecutive():
    labels = jnp.array([0, 2, 4, 0])
    colors = [(1, 0, 0), (0, 0, 1)]
    rout = np.array(
        [
            (1.0, 0.0, 0.0),
            (0.0, 0.0, 1.0),
            (1.0, 0.0, 0.0),
            (1.0, 0.0, 0.0),
        ]
    )
    r = label2rgb(
        labels, colors=colors, alpha=1, image_alpha=1, bg_label=-1
    )
    assert_array_almost_equal(rout, r)


def test_label_consistency():
    """The same labels map to the same colors."""
    label_1 = jnp.arange(5).reshape(1, -1)
    label_2 = jnp.array([0, 1])
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1)]
    rgb_1 = np.asarray(label2rgb(label_1, colors=colors, bg_label=-1))
    rgb_2 = np.asarray(label2rgb(label_2, colors=colors, bg_label=-1))
    for label_id in np.asarray(label_2).ravel():
        assert_array_almost_equal(
            rgb_1[np.asarray(label_1) == label_id],
            rgb_2[np.asarray(label_2) == label_id],
        )


def test_leave_labels_alone():
    labels = jnp.array([-1, 0, 1])
    labels_saved = np.asarray(labels).copy()

    label2rgb(labels, bg_label=-1)
    label2rgb(labels, bg_label=1)
    assert_array_equal(labels, labels_saved)


def test_avg():
    # label image
    label_field = jnp.asarray(
        [[1, 1, 1, 2], [1, 2, 2, 2], [3, 3, 4, 4]], dtype=jnp.uint8
    )

    # color image
    r = np.asarray(
        [[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0],
         [0.0, 0.0, 0.0, 0.0]]
    )
    g = np.asarray(
        [[0.0, 0.0, 0.0, 1.0], [1.0, 1.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 0.0]]
    )
    b = np.asarray(
        [[0.0, 0.0, 0.0, 1.0], [0.0, 1.0, 1.0, 1.0],
         [0.0, 0.0, 1.0, 1.0]]
    )
    image = jnp.asarray(np.dstack((r, g, b)))

    # reference label-colored image
    rout = np.asarray(
        [[0.5, 0.5, 0.5, 0.5], [0.5, 0.5, 0.5, 0.5],
         [0.0, 0.0, 0.0, 0.0]]
    )
    gout = np.asarray(
        [[0.25, 0.25, 0.25, 0.75], [0.25, 0.75, 0.75, 0.75],
         [0.0, 0.0, 0.0, 0.0]]
    )
    bout = np.asarray(
        [[0.0, 0.0, 0.0, 1.0], [0.0, 1.0, 1.0, 1.0],
         [0.0, 0.0, 1.0, 1.0]]
    )
    expected_out = np.dstack((rout, gout, bout))

    # standard averaging
    out = label2rgb(label_field, image, kind="avg", bg_label=-1)
    assert_array_equal(out, expected_out)

    # averaging with custom background value
    out_bg = label2rgb(
        label_field, image, bg_label=2, bg_color=(0, 0, 0), kind="avg"
    )
    expected_out_bg = expected_out.copy()
    expected_out_bg[np.asarray(label_field) == 2] = 0
    assert_array_equal(out_bg, expected_out_bg)

    # default background color
    out_bg = label2rgb(label_field, image, bg_label=2, kind="avg")
    assert_array_equal(out_bg, expected_out_bg)


def test_negative_intensity():
    labels = jnp.arange(100).reshape(10, 10)
    image = jnp.full((10, 10), -1, dtype="float64")
    with pytest.warns(UserWarning):
        label2rgb(labels, image, bg_label=-1)


def test_bg_color_rgb_string():
    rng = np.random.RandomState(0)
    img = jnp.asarray(
        rng.randint(0, 255, (10, 10)).astype(np.uint8)
    )
    labels = np.zeros((10, 10), dtype=np.int64)
    labels[1:3, 1:3] = 1
    labels[6:9, 6:9] = 2
    labels = jnp.asarray(labels)
    output = label2rgb(
        labels, image=img, alpha=0.9, bg_label=0, bg_color="red"
    )
    assert float(output[0, 0, 0]) > 0.9  # red channel


def test_avg_with_2d_image():
    rng = np.random.RandomState(0)
    img = jnp.asarray(
        rng.randint(0, 255, (10, 10)).astype(np.uint8)
    )
    labels = np.zeros((10, 10), dtype=np.int64)
    labels[1:3, 1:3] = 1
    labels[6:9, 6:9] = 2
    labels = jnp.asarray(labels)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        label2rgb(labels, image=img, bg_label=0, kind="avg")
