"""Forward-only attention block sweep at the inference headline shape.

The 640px b128 headline's einsum attention sits at its materialisation
roofline (~8.5 GB of probs HBM traffic per block -> ~10.4 ms/layer at
819 GB/s; PERFORMANCE.md round-3b trace). A flash kernel that never
materialises probs has a ~4-5 ms/layer floor at this shape — but the
measured flash path ran ~2x SLOWER than einsum at b128. This sweep asks
whether that is intrinsic or a block-policy artifact: _auto_blocks picks
one giant (1536, 1536) score tile here (9.4 MB fp32), serialising
matmul -> 4 VPU passes -> matmul with no intra-program overlap, while
finer kv blocks give Mosaic a loop to software-pipeline.

Methodology: chained lax.scan inside one jit + scalar fetch (docs/
DESIGN.md; block_until_ready does not sync on this tunnel), tunnel
roundtrip subtracted.

Usage: python tools/bench_flash_infer.py [--b 128] [--n 1444] [--heads 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import roundtrip_ms  # noqa: E402



def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--b", type=int, default=128)
    parser.add_argument("--n", type=int, default=1444)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--k", type=int, default=40)
    parser.add_argument("--iterations", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_transformer_detector_tpu.kernels.flash_attention import (
        flash_attention)

    rng = jax.random.PRNGKey(0)
    shape = (args.b, args.heads, args.n, args.k)        # heads-major
    q, k, v = (jax.random.normal(r, shape, jnp.bfloat16) * 0.1
               for r in jax.random.split(rng, 3))

    rt = roundtrip_ms()
    print(json.dumps({"tunnel_roundtrip_ms": round(rt, 1)}), flush=True)

    def bench(name, fn):
        @jax.jit
        def chained(q, k, v):
            def body(carry, _):
                out = fn(carry, k, v)
                return out.astype(carry.dtype), ()
            final, _ = jax.lax.scan(body, q, None,
                                    length=args.iterations)
            return final.mean()

        _ = np.asarray(chained(q, k, v))              # compile
        tic = time.perf_counter()
        _ = np.asarray(chained(q, k, v))
        total_ms = (time.perf_counter() - tic) * 1e3 - rt
        per_call = total_ms / args.iterations
        print(json.dumps({"variant": name,
                          "ms_per_call": round(per_call, 3)}), flush=True)
        return per_call

    def einsum_attn(q, k, v):
        # The model's materialised path in the same heads-major layout:
        # bf16 contractions with fp32 accumulation (models/vit_detector.py).
        scores = jnp.einsum("bhnk,bhmk->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhnm,bhmk->bhnk", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    bench("einsum bhnk (materialised)", einsum_attn)
    bench("flash auto blocks", lambda q, k, v: flash_attention(
        q, k, v, layout="bhnk"))
    for bq, bkv in ((1536, 1536), (768, 1536), (512, 1536), (256, 1536),
                    (128, 1536), (768, 768), (512, 512), (256, 512),
                    (512, 256), (256, 256), (128, 512)):
        bench(f"flash bq={bq} bkv={bkv}", lambda q, k, v, bq=bq, bkv=bkv:
              flash_attention(q, k, v, block_q=bq, block_kv=bkv,
                              layout="bhnk"))


if __name__ == "__main__":
    main()
