"""Profiling and timing utilities.

The reference's only timing is wall-clock bookends in the notebook
(SURVEY.md §5 tracing); here:
  * ``trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace,
  * ``time_jitted`` — compile-then-time loop that ends in a real scalar
    fetch (device-honest throughput numbers on backends whose
    ``block_until_ready`` is not a sync — the axon tunnel after the
    2026-08-18 outage stopped applying dispatch backpressure, so naive
    loops time only dispatch; docs/DESIGN.md),
  * ``flops_estimate`` — analytic FLOPs of a detector config, for
    MXU-utilisation reporting in the benchmark suite.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

from ..config import DetectorConfig


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: ``with trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fetch_scalar(result) -> None:
    """Force completion of all enqueued device work by fetching one real
    element. Device programs execute in order, so materialising any part
    of the LAST result waits for every prior dispatch; unlike
    ``block_until_ready`` this cannot be satisfied without execution
    (the axon tunnel's block_until_ready returns without syncing)."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(result)
    if leaves:
        # Slice on device first so only one scalar crosses the tunnel.
        _ = np.asarray(leaves[-1].ravel()[0])


def time_jitted(fn: Callable, *args, iterations: int = 10,
                warmup: int = 1) -> Tuple[float, float]:
    """(seconds_per_call, calls_per_second) for a jitted fn; compiles via
    warmup calls, synchronises by fetching a scalar from the last result
    and subtracts the measured fetch-roundtrip floor (~30 ms on the
    tunnel, ~0 locally)."""
    result = None
    for _ in range(max(1, warmup)):
        result = fn(*args)
    _fetch_scalar(result)
    # Fetch-roundtrip floor: min of 3 samples on the now-idle device.
    rt = []
    for _ in range(3):
        tic = time.perf_counter()
        _fetch_scalar(result)
        rt.append(time.perf_counter() - tic)
    floor = min(rt)
    # The floor is subtracted from a single timed run; for sub-ms calls
    # the run must dwarf the floor or tunnel jitter dominates the
    # corrected elapsed (round-3 advisor finding: vit_s16_224 at
    # ~0.95 ms/call x 10 iterations ~ 9.5 ms vs a ~30 ms floor could go
    # non-positive). Scale iterations until the uncorrected elapsed is
    # >= 10x the floor, then require a positive correction.
    while True:
        tic = time.perf_counter()
        for _ in range(iterations):
            result = fn(*args)
        _fetch_scalar(result)
        toc = time.perf_counter()
        elapsed = toc - tic
        if elapsed >= 10.0 * floor or iterations >= 10_000:
            break
        iterations *= 4
    corrected = elapsed - floor
    if corrected <= 0:
        raise RuntimeError(
            f"time_jitted: corrected elapsed {corrected * 1e3:.3f} ms is "
            f"non-positive (elapsed {elapsed * 1e3:.3f} ms, roundtrip "
            f"floor {floor * 1e3:.3f} ms over {iterations} iterations) — "
            "the fetch-roundtrip jitter exceeded the run; re-run with "
            "more iterations or on a quieter link")
    per_call = corrected / iterations
    return per_call, 1.0 / per_call


def flops_estimate(config: DetectorConfig, batch_size: int = 1) -> float:
    """Analytic forward FLOPs (matmuls only; 2*M*N*K convention)."""
    tokens = config.num_patches
    d = config.embedding_dim
    h, k = config.num_heads, config.key_dim

    flops = 2.0 * tokens * config.patch_dim * d  # patch projection

    per_block = 0.0
    per_block += 3 * 2.0 * tokens * d * h * k       # qkv projections
    if config.attention_window:
        window_tokens = config.attention_window ** 2
        per_block += 2 * 2.0 * tokens * window_tokens * h * k
    else:
        per_block += 2 * 2.0 * tokens * tokens * h * k  # scores + p@v
    per_block += 2.0 * tokens * h * k * d           # output projection
    in_dim = d
    for units in config.encoder_mlp_units:
        per_block += 2.0 * tokens * in_dim * units
        in_dim = units
    flops += config.encoder_blocks * per_block

    if config.head_scales == (1,):
        flops += 2.0 * tokens * d * config.max_objects  # token dense
        in_dim = config.num_patches
    else:
        # Multi-scale head (models/vit_detector.py): one token-dense per
        # pooled grid; the per-slot feature concatenates over scales.
        gh, gw = config.grid_size
        in_dim = 0
        for s in config.head_scales:
            pooled = (gh // s) * (gw // s)
            flops += 2.0 * pooled * d * config.max_objects
            in_dim += pooled
    for units in config.head_units:
        for _ in range(config.head_block_repeats):
            flops += 2.0 * config.max_objects * in_dim * units
            in_dim = units
    flops += 2.0 * config.max_objects * in_dim * 6

    return flops * batch_size
