"""A/B: flash vs einsum attention for the small ViT presets.

vit_s16_224 has only 196 tokens and vit_b16_384 576 — shapes where the
blocked flash kernel's padding (block sizes >= 128) and its chunked-VJP
backward may lose to XLA's materialised einsum attention, the same
direction-dependent crossover measured at the reference arch
(PERFORMANCE.md round 3b). Both presets currently default to
use_flash_attention=True everywhere; this tool measures whether that is
right per direction (inference / train).

Honest-timing recipe (axon tunnel, docs/DESIGN.md): inference chains
iterations inside one jit via lax.scan feeding a scalar of the output
back into the images; train python-loops a donated-state step and fetches
only the final loss. Params init on CPU + one device_put; all arrays are
jit ARGUMENTS (closures embed as HLO constants -> remote_compile 413).

Usage: python tools/bench_small_vits.py [--presets vit_s16_224,vit_b16_384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import roundtrip_ms  # noqa: E402



def bench_preset(name: str, batch_infer: int, batch_train: int,
                 iterations: int, rt: float) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_transformer_detector_tpu.config import (
        LossConfig, TrainConfig, get_config)
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params)
    from vision_transformer_detector_tpu.ops.decode import (
        transform_predictions)
    from vision_transformer_detector_tpu.train.optimizer import make_optimizer
    from vision_transformer_detector_tpu.train.trainer import (
        create_train_state, make_train_step)

    base = get_config(name)
    h, w = base.image_size
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = init_params(jax.random.PRNGKey(0), base)
    params = jax.device_put(params, jax.devices()[0])

    variants = {
        "flash": base.replace(use_flash_attention=True,
                              train_use_flash_attention=None),
        "einsum": base.replace(use_flash_attention=False,
                               train_use_flash_attention=None),
    }

    # ---------------- inference ----------------
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch_infer, h, w, 3),
                                minval=-1.0, maxval=1.0)
    for vname, config in variants.items():
        @jax.jit
        def infer_chain(params, images, _config=config):
            def body(carry, _):
                img, acc = carry
                decoded = transform_predictions(
                    forward(params, img, _config, train=False), _config)
                feedback = decoded.astype(jnp.float32).mean() * 1e-6
                return (img + feedback, acc + feedback), None
            (_, acc), _ = jax.lax.scan(body, (images, jnp.zeros(())), None,
                                       length=iterations)
            return acc

        _ = np.asarray(infer_chain(params, images))
        tic = time.perf_counter()
        _ = np.asarray(infer_chain(params, images))
        per = ((time.perf_counter() - tic) * 1e3 - rt) / iterations
        print(json.dumps({"preset": name, "dir": "infer",
                          "attention": vname, "batch": batch_infer,
                          "ms": round(per, 2),
                          "img_per_s": round(batch_infer / (per / 1e3), 1)}),
              flush=True)

    # ---------------- train ----------------
    images_t = jax.random.uniform(jax.random.PRNGKey(2),
                                  (batch_train, h, w, 3),
                                  minval=-1.0, maxval=1.0)
    # Label layout: (objectness, category, cy, cx, h, w) pixels, -8 fill.
    labels = np.full((batch_train, base.max_objects, 6), -8.0, np.float32)
    labels[..., 0] = 0.0
    labels[:, 0] = (1, 3, h / 2, w / 2, h / 4, w / 4)
    labels_t = jnp.asarray(labels)
    rng = jax.random.PRNGKey(0)
    for vname, config in variants.items():
        optimizer = make_optimizer(TrainConfig(learning_rate=1e-4,
                                               batch_size=batch_train), 1)
        step = make_train_step(config, LossConfig(), optimizer, donate=True)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            state = create_train_state(jax.random.PRNGKey(0), config,
                                       optimizer)
        state = jax.device_put(state, jax.devices()[0])
        state, loss = step(state, images_t, labels_t, rng)
        _ = float(loss)                       # compile + sync
        tic = time.perf_counter()
        for _ in range(iterations):
            state, loss = step(state, images_t, labels_t, rng)
        _ = float(loss)                       # the state chain syncs all
        per = ((time.perf_counter() - tic) * 1e3 - rt) / iterations
        print(json.dumps({"preset": name, "dir": "train",
                          "attention": vname, "batch": batch_train,
                          "ms": round(per, 2),
                          "img_per_s": round(batch_train / (per / 1e3), 1)}),
              flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--presets", default="vit_s16_224,vit_b16_384")
    parser.add_argument("--batch-infer", type=int, default=64)
    parser.add_argument("--batch-train", type=int, default=8)
    parser.add_argument("--iterations", type=int, default=20)
    args = parser.parse_args()

    rt = roundtrip_ms()
    print(json.dumps({"tunnel_roundtrip_ms": round(rt, 1)}), flush=True)
    for name in args.presets.split(","):
        bench_preset(name.strip(), args.batch_infer, args.batch_train,
                     args.iterations, rt)


if __name__ == "__main__":
    main()
