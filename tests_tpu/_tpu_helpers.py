"""Shared helpers for the TPU-executed correctness tier."""

import functools
import os
import subprocess
import sys

import numpy as np


def assert_close(actual, desired, rtol=1e-5, atol=1e-5, **kw):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), rtol=rtol, atol=atol, **kw
    )


_PROBE = r"""
import jax, jax.numpy as jnp
z = (jnp.arange(8, dtype=jnp.complex64) * (1+2j)).sum()
complex_ok = False
try:
    abs(complex(z))
    complex_ok = True
except Exception:
    pass
# the relay poisons the process after a failed complex op: require a
# float op to still succeed for complex support to count as real
f = float(jnp.arange(8, dtype=jnp.float32).sum())
print("COMPLEX_OK" if (complex_ok and f == 28.0) else "COMPLEX_BAD")
"""


@functools.lru_cache(maxsize=1)
def complex_supported():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=300, env=env,
        )
    except subprocess.TimeoutExpired:
        return False
    return "COMPLEX_OK" in out.stdout
