from cupyimg_tpu.testing.helper import (  # noqa: F401
    numpy_tpu_allclose,
    product,
    assert_allclose,
)
