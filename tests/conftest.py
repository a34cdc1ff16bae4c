"""Test configuration: CPU backend with x64 + 8 virtual devices.

Correctness tests run on JAX CPU (parity with SciPy f64 semantics and no TPU
required in CI); sharding tests use an 8-device virtual CPU mesh
(xla_force_host_platform_device_count). TPU runs are the perf tier
(bench.py).
"""

import os

# The env var alone is not enough: the machine's sitecustomize registers an
# 'axon' TPU backend and forces jax_platforms programmatically, so tests must
# override via jax.config *after* import.
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent XLA cache can hold AOT artifacts compiled for a different
# host CPU (observed: '+prefer-no-scatter' feature mismatch warnings and
# wrong gather results loaded from cache) — keep tests hermetic.
os.environ["CUPYIMG_TPU_NO_CACHE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
