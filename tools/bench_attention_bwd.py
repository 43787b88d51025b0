"""Micro-benchmark: attention forward+backward at the ViT-L/16 640px shape.

Times jax.grad of sum(flash_attention(q,k,v)) per variant — the chunked jnp
recomputation vs the fused Pallas backward at several block sizes.

Measurement recipe for this environment (axon tunnel): block_until_ready
is NOT a reliable sync, so each variant runs `iterations` gradient steps
CHAINED by a data dependency inside ONE jit (lax.scan) and fetches a
scalar via np.asarray; the ~30 ms tunnel roundtrip is measured separately
and subtracted.

Usage: python tools/bench_attention_bwd.py [--b 8] [--n 1600] [--heads 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def roundtrip_ms():
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--b", type=int, default=8)
    parser.add_argument("--n", type=int, default=1600)
    parser.add_argument("--heads", type=int, default=16)
    parser.add_argument("--k", type=int, default=64)
    parser.add_argument("--layers", type=int, default=24,
                        help="scale per-call time to a per-step estimate")
    parser.add_argument("--iterations", type=int, default=20)
    parser.add_argument("--only", default=None,
                        help="substring filter on variant names (e.g. "
                             "'chunked' to skip the pallas sweeps)")
    parser.add_argument("--repeats", type=int, default=1,
                        help="timed repetitions per variant (variance)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_transformer_detector_tpu.kernels.flash_attention import (
        flash_attention)

    rng = jax.random.PRNGKey(0)
    shape = (args.b, args.n, args.heads, args.k)
    q, k, v = (jax.random.normal(r, shape, jnp.bfloat16) * 0.1
               for r in jax.random.split(rng, 3))
    # Non-trivial output cotangent: grad-of-plain-sum feeds an all-ones
    # cotangent that XLA can simplify in the jnp backward (dv = p^T @ 1 is
    # a reduction) but not inside the Pallas kernel — an unfair comparison.
    cot = jax.random.normal(jax.random.PRNGKey(9), shape, jnp.float32)

    rt = roundtrip_ms()
    print(json.dumps({"tunnel_roundtrip_ms": round(rt, 1)}), flush=True)

    def bench(name, fn):
        if args.only and args.only not in name:
            return None
        grad_fn = jax.grad(
            lambda q, k, v: (fn(q, k, v).astype(jnp.float32) * cot).sum(),
            argnums=(0, 1, 2))

        @jax.jit
        def chained(q, k, v):
            def body(carry, _):
                qq, acc = carry
                dq, dk, dv = grad_fn(qq, k, v)
                # Feed dq back into q: forces strict sequencing.
                return ((dq * 1e-3 + qq).astype(qq.dtype),
                        acc + dk.astype(jnp.float32).mean()), None
            (qq, acc), _ = jax.lax.scan(
                body, (q, jnp.zeros(())), None, length=args.iterations)
            return acc

        _ = np.asarray(chained(q, k, v))        # compile + run
        samples = []
        for _ in range(args.repeats):
            tic = time.perf_counter()
            _ = np.asarray(chained(q, k, v))
            samples.append(((time.perf_counter() - tic) * 1e3 - rt)
                           / args.iterations)
        per = min(samples)
        print(json.dumps({
            "variant": name, "ms": round(per, 3),
            "samples_ms": [round(s, 3) for s in samples],
            "est_step_contrib_ms": round(per * args.layers, 1)}),
            flush=True)
        return per

    bench("chunked", functools.partial(
        flash_attention, use_pallas_backward=False))
    # Bandwidth-shaped chunked variants (round 4, the VERDICT r3
    # attention-bandwidth lever): delta trick and bf16 score streaming.
    bench("chunked delta", functools.partial(
        flash_attention, use_pallas_backward=False, bwd_variant="delta"))
    bench("chunked bf16_delta", functools.partial(
        flash_attention, use_pallas_backward=False,
        bwd_variant="bf16_delta"))
    # Whole-row schedule: full-N blocks collapse the kv grid axis and the
    # q fori_loop to 1 — per (batch, head) the entire N x N score lives in
    # VMEM and the backward is five unblocked matmuls (viable because this
    # framework's sequences are <= ~4k tokens; a long-context flash kernel
    # could never do this).
    full = -(-args.n // 128) * 128
    variants = [(256, 256), (512, 512), (256, full), (512, 1024),
                (1024, 512), (full, full)]
    for bq, bkv in variants:
        bench(f"pallas_bwd bq={bq} bkv={bkv}", functools.partial(
            flash_attention, block_q=bq, block_kv=bkv,
            use_pallas_backward=True))


if __name__ == "__main__":
    main()
