"""Trace the 640px b128 bf16 headline inference program and attribute
device time (tools/analyze_trace.py) — is there anything left on the
table (patchify layout? decode?) beyond the encoder matmuls?

Run on TPU: python tools/trace_headline.py [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out",
                        default=os.path.join(_REPO, "artifacts",
                                             "trace_headline"))
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import DetectorConfig
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params)
    from vision_transformer_detector_tpu.ops.decode import (
        transform_predictions)
    from vision_transformer_detector_tpu.utils.profiling import (
        time_jitted, trace)
    from vision_transformer_detector_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()
    config = DetectorConfig(image_size=(640, 640),
                            compute_dtype="bfloat16",
                            attention_heads_major=True)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_params(jax.random.PRNGKey(0), config)
    params = jax.device_put(params, jax.devices()[0])
    images = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch_size, 640, 640, 3),
        minval=-1.0, maxval=1.0)

    @jax.jit
    def infer(params, images):
        return transform_predictions(forward(params, images, config),
                                     config)

    per_call, _ = time_jitted(infer, params, images, iterations=10)
    print(json.dumps({"bench": "headline_640_b128",
                      "ms": round(per_call * 1e3, 2),
                      "img_s": round(args.batch_size / per_call, 1)}),
          flush=True)
    with trace(args.out):
        infer(params, images).block_until_ready()
    print(json.dumps({"trace": args.out}), flush=True)


if __name__ == "__main__":
    main()
