"""TPU-executed correctness tier (VERDICT r1 next-step #3).

Unlike ``tests/`` (CPU x64 parity tier), this suite runs on the machine's
default backend — the real TPU chip — and exercises the COMPILED Pallas /
Mosaic kernels end-to-end through the public API, compared against scipy
oracles computed on the host.  This is the tier that would have caught the
round-1 padless lane-matmul unpack bug, which only manifested in compiled
(non-interpret) execution and shipped silently behind a blanket fallback.

Run it explicitly (it is NOT part of ``pytest tests/``)::

    python -m pytest tests_tpu/ -q

Design constraints on this relay-backed TPU dev environment:

- f64 is emulated and extremely slow on TPU: everything here is f32 with
  tolerances vs scipy's f64 oracle.
- Complex-dtype device ops can be UNIMPLEMENTED on the relay AND poison
  the whole process (every later op fails too).  Tests that need complex
  intermediates (FFT paths) depend on the ``complex_ok`` fixture, which
  probes support in a throwaway subprocess first.
- First compile of each kernel shape is slow (~20-40 s); the persistent
  XLA compile cache is left ON so re-runs are fast.  Keep shapes shared
  across tests.
"""

import os
import sys

import numpy as np
import pytest

# Do NOT force a platform: the point is the default (TPU) backend.
os.environ.pop("JAX_PLATFORMS", None)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_helpers import complex_supported  # noqa: E402

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(
            reason="tests_tpu requires the real TPU backend "
            f"(default backend is {jax.default_backend()!r})"
        )
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def complex_ok():
    if not complex_supported():
        pytest.skip("complex dtypes unsupported on this TPU relay "
                    "(device op would poison the process)")
    return True


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)
