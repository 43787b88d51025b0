"""A/B: separate q/k/v projection einsums vs one fused (D, H, 3K) matmul.

The reference arch's projections contract over D=28 — far below the
128-lane MXU width — so each of the three per-block projection matmuls
runs lane-starved. Fusing them into ONE einsum with a 3x wider output
amortises that starvation (same FLOPs, fewer/wider MXU ops). The concat
of the three kernels is a (D, H, 3K) copy of parameter bytes per call —
negligible next to the matmuls.

Measures the headline inference config both ways WITHOUT touching the
model code (standalone forward built from the same building blocks), to
decide whether a config option is worth wiring.

VERDICT (2026-08-20, v5e, PERFORMANCE.md round-5 note): fused measures
43.33 ms vs 8.15 ms separate per block at 640px b128, outputs
bit-identical — a decisive loss (the (B, H, N, 3K) intermediate's q/k/v
slicing forces re-layouts that cost more than the lane starvation the
fusion saves). Not wired; kept for re-testing on future XLA versions.

Run on TPU: python tools/bench_fused_qkv.py
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import DetectorConfig
    from vision_transformer_detector_tpu.models.vit_detector import (
        init_params)
    from vision_transformer_detector_tpu.utils.profiling import time_jitted
    from vision_transformer_detector_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()
    config = DetectorConfig(image_size=(640, 640),
                            compute_dtype="bfloat16",
                            attention_heads_major=True)
    params = init_params(jax.random.PRNGKey(0), config)
    h_heads, kd = config.num_heads, config.key_dim
    dtype = jnp.bfloat16

    # One encoder block's attention, isolated (batch 128 headline shape).
    batch = 128
    n = config.num_patches
    d = config.embedding_dim
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n, d), dtype)
    mha = params["encoder"][0]["mha"]

    def attention_separate(x, mha):
        def proj(layer):
            kernel = layer["kernel"].astype(dtype)
            y = jnp.einsum("bnd,dhk->bhnk", x, kernel,
                           preferred_element_type=jnp.float32)
            return y + layer["bias"].astype(jnp.float32)[None, :, None, :]
        q = (proj(mha["query"]) / math.sqrt(kd)).astype(dtype)
        key = proj(mha["key"]).astype(dtype)
        v = proj(mha["value"]).astype(dtype)
        scores = jnp.einsum("bgnk,bgmk->bgnm", q, key,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bgnm,bgmk->bgnk", probs.astype(dtype), v,
                         preferred_element_type=jnp.float32)
        o = jnp.einsum("bhnk,hkd->bnd", out.astype(dtype),
                       mha["out"]["kernel"].astype(dtype),
                       preferred_element_type=jnp.float32)
        return o + mha["out"]["bias"].astype(jnp.float32)

    def attention_fused(x, mha):
        kernel = jnp.concatenate(
            [mha["query"]["kernel"], mha["key"]["kernel"],
             mha["value"]["kernel"]], axis=-1).astype(dtype)  # (D, H, 3K)
        bias = jnp.concatenate(
            [mha["query"]["bias"], mha["key"]["bias"],
             mha["value"]["bias"]], axis=-1)                  # (H, 3K)
        qkv = jnp.einsum("bnd,dhk->bhnk", x, kernel,
                         preferred_element_type=jnp.float32)
        qkv = qkv + bias.astype(jnp.float32)[None, :, None, :]
        q = (qkv[..., :kd] / math.sqrt(kd)).astype(dtype)
        key = qkv[..., kd:2 * kd].astype(dtype)
        v = qkv[..., 2 * kd:].astype(dtype)
        scores = jnp.einsum("bgnk,bgmk->bgnm", q, key,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bgnm,bgmk->bgnk", probs.astype(dtype), v,
                         preferred_element_type=jnp.float32)
        o = jnp.einsum("bhnk,hkd->bnd", out.astype(dtype),
                       mha["out"]["kernel"].astype(dtype),
                       preferred_element_type=jnp.float32)
        return o + mha["out"]["bias"].astype(jnp.float32)

    ref = None
    for name, fn in (("separate", attention_separate),
                     ("fused_qkv", attention_fused)):
        jitted = jax.jit(fn)
        out = jitted(x, mha)
        if ref is None:
            ref = out
        else:
            import numpy as np
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(json.dumps({"check": "fused_vs_separate_max_err",
                              "err": round(err, 6)}), flush=True)
        per_call, _ = time_jitted(jitted, x, mha, iterations=20)
        print(json.dumps({"bench": f"attn_block_640_b128_{name}",
                          "ms": round(per_call * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
