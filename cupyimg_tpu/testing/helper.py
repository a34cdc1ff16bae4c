"""Dual-backend test oracle.

TPU-native analog of the reference's testing harness
(cupyimg/testing/helper.py:408-862): a decorated test body runs twice —
once with ``xp=jax.numpy`` (+ ``scp=cupyimg_tpu.scipy``) and once with
``xp=numpy`` (+ ``scp=scipy``) — and the results are compared with allclose
semantics, including *error equivalence* (both backends must raise the same
exception class, reference helper.py:105-214).

Tests run on the JAX CPU backend with x64 enabled (see tests/conftest.py) so
``dtype_mode='ndimage'`` f64 parity is exact; TPU runs are the perf tier.
"""

from __future__ import annotations

import functools
import itertools
import traceback

import numpy as np


def product(parameter_dicts):
    """Cartesian product of parameter dicts (cupy.testing.product analog)."""
    keys = list(parameter_dicts.keys())
    out = []
    for values in itertools.product(*(parameter_dicts[k] for k in keys)):
        out.append(dict(zip(keys, values)))
    return out


def assert_allclose(actual, desired, rtol=1e-7, atol=0, err_msg=""):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), rtol=rtol, atol=atol,
        err_msg=err_msg,
    )


_ACCEPTABLE_ERRORS = (Exception,)


def _call_backend(impl, self_args, kwargs, xp, scp, scipy_name):
    kw = dict(kwargs)
    kw["xp"] = xp
    if scipy_name is not None:
        kw[scipy_name] = scp
    try:
        return impl(*self_args, **kw), None
    except _ACCEPTABLE_ERRORS as e:
        return None, e


def numpy_tpu_allclose(
    rtol=1e-7,
    atol=0,
    err_msg="",
    scipy_name=None,
    name="xp",
    accept_error=False,
):
    """Decorator running a test vs numpy/scipy and comparing results.

    The test function receives ``xp`` (numpy or jax.numpy) and, when
    ``scipy_name`` is given, that kwarg bound to ``scipy`` or
    ``cupyimg_tpu.scipy``.
    """

    def decorator(impl):
        @functools.wraps(impl)
        def wrapper(*args, **kwargs):
            import jax.numpy as jnp
            import scipy as _scipy
            import cupyimg_tpu.scipy as _tscipy

            tpu_result, tpu_error = _call_backend(
                impl, args, kwargs, jnp, _tscipy, scipy_name
            )
            np_result, np_error = _call_backend(
                impl, args, kwargs, np, _scipy, scipy_name
            )
            if np_error is not None or tpu_error is not None:
                _check_error_equivalence(tpu_error, np_error, accept_error)
                return
            if np_result is None and tpu_result is None:
                return  # test asserted internally
            assert tpu_result is not None and np_result is not None, (
                "one backend returned None: "
                f"jax={tpu_result!r} numpy={np_result!r}"
            )
            tpu_results = (
                tpu_result if isinstance(tpu_result, tuple) else (tpu_result,)
            )
            np_results = (
                np_result if isinstance(np_result, tuple) else (np_result,)
            )
            assert len(tpu_results) == len(np_results)
            for t, n in zip(tpu_results, np_results):
                assert_allclose(t, n, rtol=rtol, atol=atol, err_msg=err_msg)

        return wrapper

    return decorator


def _check_error_equivalence(tpu_error, np_error, accept_error):
    if not accept_error:
        if tpu_error is not None:
            raise AssertionError(
                "JAX backend raised but errors not accepted:\n"
                + "".join(
                    traceback.format_exception(
                        type(tpu_error), tpu_error, tpu_error.__traceback__
                    )
                )
            )
        raise AssertionError(
            f"numpy backend raised but errors not accepted: {np_error!r}"
        )
    if accept_error is True:
        accepted = Exception
    else:
        accepted = accept_error
    if tpu_error is None or np_error is None:
        raise AssertionError(
            f"only one backend raised: jax={tpu_error!r} numpy={np_error!r}"
        )
    if not isinstance(tpu_error, accepted):
        raise AssertionError(f"JAX error not of accepted type: {tpu_error!r}")
    if not isinstance(np_error, accepted):
        raise AssertionError(f"numpy error not of accepted type: {np_error!r}")


def _dual_backend(compare, scipy_name=None, accept_error=False):
    """Build a dual-run decorator with a custom comparison function
    (reference-named decorator family, helper.py:408-862)."""

    def decorator(impl):
        @functools.wraps(impl)
        def wrapper(*args, **kwargs):
            import jax.numpy as jnp
            import scipy as _scipy
            import cupyimg_tpu.scipy as _tscipy

            tpu_result, tpu_error = _call_backend(
                impl, args, kwargs, jnp, _tscipy, scipy_name
            )
            np_result, np_error = _call_backend(
                impl, args, kwargs, np, _scipy, scipy_name
            )
            if np_error is not None or tpu_error is not None:
                _check_error_equivalence(
                    tpu_error, np_error, accept_error
                )
                return
            if np_result is None and tpu_result is None:
                return
            t_res = (
                tpu_result
                if isinstance(tpu_result, tuple)
                else (tpu_result,)
            )
            n_res = (
                np_result
                if isinstance(np_result, tuple)
                else (np_result,)
            )
            assert len(t_res) == len(n_res)
            for t, n in zip(t_res, n_res):
                compare(np.asarray(t), np.asarray(n))

        return wrapper

    return decorator


def numpy_cupyimg_allclose(
    rtol=1e-7, atol=0, err_msg="", scipy_name=None, name="xp",
    accept_error=False, **ignored,
):
    """Run the test with xp=jnp and xp=numpy; assert allclose."""
    return numpy_tpu_allclose(
        rtol=rtol, atol=atol, err_msg=err_msg, scipy_name=scipy_name,
        name=name, accept_error=accept_error,
    )


def numpy_cupyimg_array_almost_equal(
    decimal=6, err_msg="", scipy_name=None, accept_error=False,
    **ignored,
):
    def compare(t, n):
        np.testing.assert_array_almost_equal(
            t, n, decimal=decimal, err_msg=err_msg
        )

    return _dual_backend(compare, scipy_name, accept_error)


def numpy_cupyimg_array_almost_equal_nulp(
    nulp=1, scipy_name=None, accept_error=False, **ignored
):
    def compare(t, n):
        np.testing.assert_array_almost_equal_nulp(t, n, nulp=nulp)

    return _dual_backend(compare, scipy_name, accept_error)


def numpy_cupyimg_array_max_ulp(
    maxulp=1, dtype=None, scipy_name=None, accept_error=False,
    **ignored,
):
    def compare(t, n):
        np.testing.assert_array_max_ulp(t, n, maxulp=maxulp,
                                        dtype=dtype)

    return _dual_backend(compare, scipy_name, accept_error)


def numpy_cupyimg_array_equal(
    err_msg="", scipy_name=None, accept_error=False, strides_check=False,
    **ignored,
):
    def compare(t, n):
        np.testing.assert_array_equal(t, n, err_msg=err_msg)

    return _dual_backend(compare, scipy_name, accept_error)


def numpy_cupyimg_array_list_equal(
    err_msg="", scipy_name=None, **ignored
):
    def compare(t, n):
        np.testing.assert_array_equal(t, n, err_msg=err_msg)

    return _dual_backend(compare, scipy_name, False)


def numpy_cupyimg_array_less(
    err_msg="", scipy_name=None, accept_error=False, **ignored
):
    def compare(t, n):
        np.testing.assert_array_less(t, n, err_msg=err_msg)

    return _dual_backend(compare, scipy_name, accept_error)


def numpy_cupyimg_equal(scipy_name=None, **ignored):
    def compare(t, n):
        assert (t == n).all(), f"results differ: {t!r} != {n!r}"

    return _dual_backend(compare, scipy_name, False)


def numpy_cupyimg_raises(
    scipy_name=None, accept_error=Exception, **ignored
):
    """Both backends must raise an (equivalent) error."""

    def decorator(impl):
        @functools.wraps(impl)
        def wrapper(*args, **kwargs):
            import jax.numpy as jnp
            import scipy as _scipy
            import cupyimg_tpu.scipy as _tscipy

            _, tpu_error = _call_backend(
                impl, args, kwargs, jnp, _tscipy, scipy_name
            )
            _, np_error = _call_backend(
                impl, args, kwargs, np, _scipy, scipy_name
            )
            _check_error_equivalence(tpu_error, np_error, accept_error)

        return wrapper

    return decorator


def for_dtypes(dtypes, name="dtype"):
    """Parameterize a test over dtypes (reference helper.py:864)."""

    def decorator(impl):
        @functools.wraps(impl)
        def wrapper(*args, **kwargs):
            for dtype in dtypes:
                try:
                    kwargs[name] = np.dtype(dtype).type
                    impl(*args, **kwargs)
                except Exception:
                    print(f"dtype is {dtype}")
                    raise

        return wrapper

    return decorator
