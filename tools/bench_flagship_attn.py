"""Flagship inference attention-routing A/B + device-time attribution.

Round-5 MFU shot (VERDICT r4 #6): vit_b16_384 / vit_l16_640 inference
sits at ~54% est. MXU util, flat in batch (8/16/32 sweep — so not
batch starvation). This measures the remaining routing lever (flash
kernel vs XLA einsum attention at inference, both 64-aligned head
dims) and optionally writes a profiler trace of the winner for
per-kernel attribution via tools/analyze_trace.py.

Run on TPU: python tools/bench_flagship_attn.py [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--presets", default="vit_b16_384,vit_l16_640")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--trace", default=None,
                        help="write a jax.profiler trace of each variant "
                             "under DIR/<preset>_<variant>")
    args = parser.parse_args()

    import jax

    from vision_transformer_detector_tpu.config import get_config
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params)
    from vision_transformer_detector_tpu.ops.decode import (
        transform_predictions)
    from vision_transformer_detector_tpu.utils.profiling import (
        flops_estimate, time_jitted, trace)
    from vision_transformer_detector_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()
    peak = 394e12 / 2  # v5e bf16

    for name in args.presets.split(","):
        base = get_config(name.strip())
        h, w = base.image_size
        params = init_params(jax.random.PRNGKey(0), base)
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (args.batch_size, h, w, 3),
            minval=-1.0, maxval=1.0)
        flops = flops_estimate(base, args.batch_size)
        for variant, cfg in (("flash", base.replace(
                                  use_flash_attention=True)),
                             ("einsum", base.replace(
                                  use_flash_attention=False))):
            def infer(params, images, cfg=cfg):
                return transform_predictions(
                    forward(params, images, cfg), cfg)

            jitted = jax.jit(infer)
            per_call, _ = time_jitted(jitted, params, images,
                                      iterations=10)
            print(json.dumps({
                "preset": name.strip(), "variant": variant,
                "batch": args.batch_size,
                "infer_ms": round(per_call * 1e3, 2),
                "img_s": round(args.batch_size / per_call, 1),
                "mxu_util_pct": round(100 * flops / per_call / peak, 1),
            }), flush=True)
            if args.trace:
                tdir = os.path.join(args.trace,
                                    f"{name.strip()}_{variant}")
                with trace(tdir):
                    jitted(params, images).block_until_ready()
                print(json.dumps({"trace": tdir}), flush=True)


if __name__ == "__main__":
    main()
