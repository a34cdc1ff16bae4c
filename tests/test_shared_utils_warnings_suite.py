"""_shared utils + warnings suites.

Ported from the reference suites
/root/reference/cupyimg/skimage/_shared/tests/test_utils.py and
/root/reference/cupyimg/skimage/_shared/tests/test_warnings.py.
Oracle = the hard-coded upstream warning messages and behaviors.
"""

import os
import sys
import warnings

import numpy as np
import pytest

from cupyimg_tpu.skimage._shared.utils import (
    check_nD,
    deprecate_kwarg,
    _validate_interpolation_order,
    change_default_value,
)
from cupyimg_tpu.skimage._shared._warnings import expected_warnings


def test_change_default_value():
    @change_default_value("arg1", new_value=-1, changed_version="0.12")
    def foo(arg0, arg1=0, arg2=1):
        """Expected docstring"""
        return arg0, arg1, arg2

    @change_default_value(
        "arg1",
        new_value=-1,
        changed_version="0.12",
        warning_msg="Custom warning message",
    )
    def bar(arg0, arg1=0, arg2=1):
        """Expected docstring"""
        return arg0, arg1, arg2

    # Assert warning messages
    with pytest.warns(FutureWarning) as record:
        assert foo(0) == (0, 0, 1)
        assert bar(0) == (0, 0, 1)

    expected_msg = (
        "The new recommended value for arg1 is -1. Until "
        "version 0.12, the default arg1 value is 0. From "
        "version 0.12, the arg1 default value will be -1. "
        "To avoid this warning, please explicitly set arg1 value."
    )

    assert str(record[0].message) == expected_msg
    assert str(record[1].message) == "Custom warning message"

    # Nothing happens if arg1 is set
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert foo(0, 2) == (0, 2, 1)
        assert foo(0, arg1=0) == (0, 0, 1)
        assert foo.__name__ == "foo"
        if sys.flags.optimize < 2:
            assert foo.__doc__ == "Expected docstring"


def test_deprecated_kwarg():
    @deprecate_kwarg({"old_arg1": "new_arg1"})
    def foo(arg0, new_arg1=1, arg2=None):
        """Expected docstring"""
        return arg0, new_arg1, arg2

    @deprecate_kwarg(
        {"old_arg1": "new_arg1"}, warning_msg="Custom warning message"
    )
    def bar(arg0, new_arg1=1, arg2=None):
        """Expected docstring"""
        return arg0, new_arg1, arg2

    with pytest.warns(FutureWarning) as record:
        assert foo(0, old_arg1=1) == (0, 1, None)
        assert bar(0, old_arg1=1) == (0, 1, None)

    msg = (
        "'old_arg1' is a deprecated argument name "
        "for `foo`. Please use 'new_arg1' instead."
    )
    assert str(record[0].message) == msg
    assert str(record[1].message) == "Custom warning message"

    # No warnings with the new API
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert foo(0) == (0, 1, None)
        assert foo(0, 2) == (0, 2, None)
        assert foo(0, 1, 2) == (0, 1, 2)
        assert foo(0, new_arg1=1, arg2=2) == (0, 1, 2)
        assert foo(0, new_arg1=2) == (0, 2, None)
        assert foo(0, arg2=2) == (0, 1, 2)
        assert foo(0, 1, arg2=2) == (0, 1, 2)
        assert foo.__name__ == "foo"
        if sys.flags.optimize < 2:
            assert foo.__doc__ == "Expected docstring"


def test_check_nD():
    z = np.random.random(200 ** 2).reshape((200, 200))
    x = z[10:30, 30:10]
    with pytest.raises(ValueError):
        check_nD(x, 2)


@pytest.mark.parametrize(
    "dtype", [bool, int, np.uint8, np.uint16, float, np.float32, np.float64]
)
@pytest.mark.parametrize("order", [None, -1, 0, 1, 2, 3, 4, 5, 6])
def test_validate_interpolation_order(dtype, order):
    if order is None:
        # Default order
        assert (
            _validate_interpolation_order(dtype, None) == 0
            if dtype == bool
            else 1
        )
    elif order < 0 or order > 5:
        # Order not in valid range
        with pytest.raises(ValueError):
            _validate_interpolation_order(dtype, order)
    elif dtype == bool and order != 0:
        # Deprecated order for bool array
        with expected_warnings(["Input image dtype is bool"]):
            assert _validate_interpolation_order(bool, order) == order
    else:
        # Valid use case
        assert _validate_interpolation_order(dtype, order) == order


@pytest.fixture(scope="function")
def strictness_env():
    old_strictness = os.environ.pop("SKIMAGE_TEST_STRICT_WARNINGS", None)
    yield
    if old_strictness is not None:
        os.environ["SKIMAGE_TEST_STRICT_WARNINGS"] = old_strictness
    else:
        os.environ.pop("SKIMAGE_TEST_STRICT_WARNINGS", None)


def test_strict_warnings_default(strictness_env):
    # By default we should fail on missing expected warnings
    with pytest.raises(ValueError):
        with expected_warnings(["some warnings"]):
            pass


@pytest.mark.parametrize("strictness", ["1", "true", "True", "TRUE"])
def test_strict_warning_true(strictness_env, strictness):
    os.environ["SKIMAGE_TEST_STRICT_WARNINGS"] = strictness
    with pytest.raises(ValueError):
        with expected_warnings(["some warnings"]):
            pass


@pytest.mark.parametrize("strictness", ["0", "false", "False", "FALSE"])
def test_strict_warning_false(strictness_env, strictness):
    os.environ["SKIMAGE_TEST_STRICT_WARNINGS"] = strictness
    with expected_warnings(["some warnings"]):
        pass
