"""Shared helpers (reference cupyimg/skimage/_shared/)."""

from ._warnings import all_warnings, expected_warnings, warn  # noqa: F401
