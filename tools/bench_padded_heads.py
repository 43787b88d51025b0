"""A/B: weight-level head-dim padding (40 -> 64) on the reference arch.

VERDICT round 2 next-step #4: the reference arch's attention runs 4-5x
off MXU peak because key_dim 40 tiles poorly on the 128-lane array; the
per-call kernel padding measured as a loss, but zero-padding the
projection WEIGHTS once at load (models/vit_detector.py:
pad_attention_key_dim, exact numerics) was untried.

Measures, padded vs unpadded, same time_jitted methodology as
tools/bench_suite.py (numbers comparable to the 543 img/s headline):
  * 640px bf16 batch-128 inference, heads-major einsum (headline config)
  * 640px bf16 batch-128 inference, flash kernel path
  * reference-arch 608px train step, tokens-major (training default)

Run on the TPU chip: python tools/bench_padded_heads.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import (
        DetectorConfig, LossConfig, TrainConfig, get_config)
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params, pad_attention_key_dim)
    from vision_transformer_detector_tpu.ops.decode import (
        transform_predictions)
    from vision_transformer_detector_tpu.train.optimizer import (
        make_optimizer)
    from vision_transformer_detector_tpu.train.trainer import (
        make_train_step)
    from vision_transformer_detector_tpu.utils.profiling import time_jitted
    from vision_transformer_detector_tpu.utils.runtime import (
        enable_compilation_cache)

    enable_compilation_cache()

    # --- inference headline: 640px bf16 b128 ---------------------------
    batch = 128
    base = DetectorConfig(image_size=(640, 640), compute_dtype="bfloat16",
                          attention_heads_major=True)
    params = init_params(jax.random.PRNGKey(0), base)
    padded = pad_attention_key_dim(params, to=64)
    h, w = base.image_size
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, w, 3),
                                minval=-1.0, maxval=1.0)

    for label, cfg in (("einsum_hm", base),
                       ("flash_hm", base.replace(use_flash_attention=True))):
        for tag, p in (("plain", params), ("padded", padded)):
            def infer(p, x, cfg=cfg):
                return transform_predictions(forward(p, x, cfg), cfg)
            per_call, _ = time_jitted(jax.jit(infer), p, images,
                                      iterations=10)
            print(json.dumps({
                "bench": f"infer_640_b128_{label}_{tag}",
                "ms": round(per_call * 1e3, 1),
                "img_s": round(batch / per_call, 1)}), flush=True)

    # --- train step: reference arch 608px, tokens-major ----------------
    cfg = get_config("reference_608").replace(compute_dtype="bfloat16")
    tb = 8
    h, w = cfg.image_size
    t_images = jax.random.uniform(jax.random.PRNGKey(2), (tb, h, w, 3),
                                  minval=-1.0, maxval=1.0)
    labels = jnp.zeros((tb, cfg.max_objects, 6))
    labels = labels.at[:, 0].set(
        jnp.asarray([1.0, 3.0, w / 2, h / 2, h / 4, w / 4]))
    optimizer = make_optimizer(TrainConfig())
    t_params = init_params(jax.random.PRNGKey(3), cfg)
    t_padded = pad_attention_key_dim(t_params, to=64)
    rng = jax.random.PRNGKey(4)
    step = make_train_step(cfg, LossConfig(), optimizer, donate=False)
    for tag, p in (("plain", t_params), ("padded", t_padded)):
        state = {"params": p, "opt_state": optimizer.init(p),
                 "step": jnp.zeros((), jnp.int32)}
        per_step, _ = time_jitted(
            lambda s, i, l: step(s, i, l, rng)[1], state, t_images,
            labels, iterations=10)
        print(json.dumps({
            "bench": f"train_608_b8_tokens_major_{tag}",
            "ms": round(per_step * 1e3, 1),
            "img_s": round(tb / per_step, 1)}), flush=True)


if __name__ == "__main__":
    main()
