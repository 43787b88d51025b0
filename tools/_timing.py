"""Shared honest-timing primitives for the bench tools.

The axon-tunneled TPU's ``block_until_ready`` returns without syncing, so
every PERFORMANCE.md number rests on the same recipe (docs/DESIGN.md):
chain iterations through a data dependency inside jit-compiled code,
fetch a scalar (``np.asarray`` does sync), and subtract the measured
tunnel roundtrip. This module is the single copy of that roundtrip
measurement — the tools used to carry byte-identical private copies,
which invited silent drift in the load-bearing methodology.
"""

from __future__ import annotations

import time


def roundtrip_ms() -> float:
    """Scalar-fetch roundtrip floor (ms): min of 5 samples after warm-up.

    Subtract this from any chained-timing measurement that ends in one
    scalar fetch; on the tunnel it is ~30 ms, locally ~0.
    """
    import jax.numpy as jnp
    import numpy as np

    tiny = jnp.zeros(())
    _ = np.asarray(tiny + 1)
    samples = []
    for _ in range(5):
        tic = time.perf_counter()
        _ = np.asarray(tiny + 1)
        samples.append((time.perf_counter() - tic) * 1e3)
    return min(samples)
