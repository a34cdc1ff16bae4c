"""Core semantics shared by every op: boundary modes, dtype policy, utilities.

TPU-native equivalent of the reference's L1 layer (cupyimg/_misc.py,
cupyimg/scipy/ndimage/_util.py) — but where the reference emits CUDA C++
strings for boundary handling (_util.py:170-228), here boundary semantics are
pure index-space JAX functions usable both by jnp reference paths and inside
Pallas kernels.
"""

from cupyimg_tpu.core.boundary import (  # noqa: F401
    BOUNDARY_MODES,
    check_mode,
    map_indices,
    pad,
)
from cupyimg_tpu.core.dtypes import promote_weights_dtype  # noqa: F401
from cupyimg_tpu.core import util  # noqa: F401
