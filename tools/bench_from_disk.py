"""End-to-end FILE-FED throughput: train / inference / serving from disk.

Every prior perf number in PERFORMANCE.md feeds pre-materialized device
arrays; this harness closes the loop the reference actually ran — JPEG
files on disk -> host decode+letterbox+labels -> host->device transfer ->
train/predict step — with the package's prefetch pipeline overlapping the
device step, on the corpus rendered by tools/make_corpus.py from the REAL
val annotation dict (4,952 images, real-COCO file sizes).

For each scenario it reports, measured in the same session:
  * ``host_img_s``  — host-only decode roofline (dataset iterated, device
    untouched): the ceiling any end-to-end number can reach on this host.
  * ``e2e_img_s``   — the composed pipeline+device throughput.
  * ``device_img_s``— device-step-only throughput on one pre-staged batch
    (the ceiling a many-core host would reach).
  * ``overlap_eff`` — e2e / min(host, device): how much of the binding
    resource the composed pipeline captures. 1.0 = perfect overlap.
  * ``cores_to_feed`` — device_img_s / host_img_s: host cores needed to
    keep the chip fed, assuming linear decode scaling (the native batch
    decoder is GIL-free C++, native/pipeline.cc).

Reference counterpart: the GIL-bound tf.py_function pipeline at
/root/reference/vision_transformer_utilities.py:510-615 (never measured
end-to-end in the reference either; SURVEY.md §3.1 flags it as the hot
spot).

Usage:
    python tools/make_corpus.py --out /tmp/corpus_full   # once
    python tools/bench_from_disk.py --corpus /tmp/corpus_full \
        [--images 512] [--scenario all|train608|infer640|serve224]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ANNOTATIONS = "/root/reference/val_annotations_dict.json"


FAST_DECODE = False  # set by --fast-decode: DCT-domain reduced-scale JPEG


def _dataset(paths, annotations, config, batch_size, num_workers,
             pool="thread"):
    from vision_transformer_detector_tpu.data.pipeline import (
        CocoDetectionDataset)
    return CocoDetectionDataset(
        paths, annotations, config, batch_size=batch_size,
        drop_remainder=True, num_workers=num_workers, prefetch=4,
        normalize=False,  # uint8 ships 4x less host->device traffic
        fast_decode=FAST_DECODE, pool=pool)


def _host_roofline(paths, annotations, config, batch_size, num_workers):
    """Iterate the full dataset, never touching the device."""
    ds = _dataset(paths, annotations, config, batch_size, num_workers)
    n = 0
    tic = time.perf_counter()
    for images, labels in ds:
        n += images.shape[0]
    return n / (time.perf_counter() - tic), n


def sweep_workers(paths, annotations, config_name, batch_size,
                  worker_counts, pools=("thread", "process")):
    """Host-decode roofline vs worker count and pool type — the measured
    answer to "does decode scale with cores?" (round-4 verdict #8: the
    claim was extrapolated from 1-worker runs on a 1-core host; this
    emits the actual curve for whatever host it runs on). Device never
    touched, so the sweep isolates the host stage.
    """
    from vision_transformer_detector_tpu.config import get_config

    config = get_config(config_name)
    rows = []
    for pool in pools:
        for w in worker_counts:
            ds = _dataset(paths, annotations, config, batch_size, w,
                          pool=pool)
            n = 0
            tic = time.perf_counter()
            for images, _labels in ds:
                n += images.shape[0]
            img_s = n / (time.perf_counter() - tic)
            row = {"sweep": "host_decode", "preset": config_name,
                   "pool": pool, "num_workers": w, "images": n,
                   "host_decode_img_s": round(img_s, 1),
                   "host_cores": os.cpu_count()}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def _roundtrip_s() -> float:
    from _timing import roundtrip_ms  # tools/ (sys.path includes repo root)
    return roundtrip_ms() / 1e3


def _require_positive(corrected: float, elapsed: float, rt: float,
                      what: str) -> None:
    """Timing guard shared by the three device-timing recipes below (they
    grow their runs differently — donated-state loop, rebuilt scan chain,
    fixed-iter put — but all subtract the same roundtrip floor). A raise,
    not an assert: python -O must not silently disable the check."""
    if corrected <= 0:
        raise RuntimeError(
            f"{what}: corrected elapsed {corrected * 1e3:.2f} ms <= 0 "
            f"(run {elapsed * 1e3:.2f} ms vs roundtrip floor "
            f"{rt * 1e3:.2f} ms) — tunnel jitter exceeded the run; "
            "rerun or lengthen the chain")


def _device_only_train(step, state, images, labels, iters=40):
    """Steady-state train-step throughput on one pre-staged batch.

    Honest timing on the tunneled chip (docs/DESIGN.md): iterations are
    CHAINED through the donated train state (step i's input is step i-1's
    output, so no execution can be elided or reordered), the timed region
    ends in a scalar fetch (``float(loss)`` syncs; ``block_until_ready``
    does NOT on this tunnel), and the measured roundtrip floor is
    subtracted. Consumes the caller's state (donation) and returns
    ``(img_s, evolved_state)``.
    """
    import jax

    rng = jax.random.PRNGKey(0)
    state, loss = step(state, images, labels, rng)  # compile + warm
    _ = float(loss)
    rt = _roundtrip_s()
    while True:
        tic = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, images, labels, rng)
        _ = float(loss)
        elapsed = time.perf_counter() - tic
        if elapsed >= 3.0 * rt or iters >= 2000:
            break
        iters *= 4
    corrected = elapsed - rt
    _require_positive(corrected, elapsed, rt, "_device_only_train")
    return iters * images.shape[0] / corrected, state


def _put_throughput(images_host, iters=8):
    """Host->device transfer throughput for one uint8 batch (img/s and
    MB/s), synced by a scalar fetch per put, roundtrip-subtracted.

    On a production TPU host this is PCIe (>10 GB/s, never binding); on
    the tunneled dev chip it is the tunnel itself and shows up as a
    real pipeline stage that shares the single host core with decode.
    """
    import jax
    import numpy as np

    dev = jax.device_put(images_host)
    _ = float(np.asarray(dev[0, 0, 0, 0]))
    rt = _roundtrip_s()
    tic = time.perf_counter()
    for _ in range(iters):
        dev = jax.device_put(images_host)
        _ = float(np.asarray(dev[0, 0, 0, 0]))
    elapsed = time.perf_counter() - tic - iters * rt
    _require_positive(elapsed, elapsed + iters * rt, iters * rt,
                      "_put_throughput")
    img_s = iters * images_host.shape[0] / elapsed
    mb_s = iters * images_host.nbytes / 1e6 / elapsed
    return img_s, mb_s


def _device_only_infer(predict_fn, params, images, steps=20):
    """Steady-state inference throughput: scan-chained inside ONE jit
    (bench.py's recipe — a tiny data-dependent feedback term makes every
    iteration non-elidable), scalar fetch, roundtrip subtracted."""
    import jax
    import numpy as np

    def build_chain(n):
        @jax.jit
        def chain(params, imgs_u8):
            imgs = imgs_u8.astype("float32") / 127.5 - 1.0

            def body(x, _):
                out = predict_fn(params, x)
                feedback = (out.mean() * 1e-12).astype(x.dtype)
                return x + feedback, ()

            x, _ = jax.lax.scan(body, imgs, None, length=n)
            return x[0, 0, 0, 0]

        return chain

    chain = build_chain(steps)
    _ = np.asarray(chain(params, images))
    rt = _roundtrip_s()
    while True:
        tic = time.perf_counter()
        _ = np.asarray(chain(params, images))
        elapsed = time.perf_counter() - tic
        if elapsed >= 3.0 * rt or steps >= 1000:
            break
        steps *= 4
        chain = build_chain(steps)
        _ = np.asarray(chain(params, images))
    corrected = elapsed - rt
    _require_positive(corrected, elapsed, rt, "_device_only_infer")
    return steps * images.shape[0] / corrected


def bench_train(paths, annotations, config_name, batch_size, num_workers):
    """Composed train-from-disk: Trainer-grade step + device prefetch."""
    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import (
        TrainConfig, get_config)
    from vision_transformer_detector_tpu.train.trainer import (
        Trainer)

    config = get_config(config_name)
    tc = TrainConfig(batch_size=batch_size)
    trainer = Trainer(config, train_config=tc, steps_per_epoch=1)
    state = trainer.init_state()

    host_img_s, n_host = _host_roofline(
        paths, annotations, config, batch_size, num_workers)

    # Device-only ceiling on one real decoded batch.
    ds = _dataset(paths, annotations, config, batch_size, num_workers)
    first = next(iter(ds))
    images_dev = jnp.asarray(first[0])
    labels_dev = jnp.asarray(first[1])
    put_img_s, put_mb_s = _put_throughput(first[0])
    device_img_s, state = _device_only_train(
        trainer.train_step, state, images_dev, labels_dev)

    # Composed: dataset -> _device_prefetch -> train_step, timed end to
    # end over the whole corpus slice (compile excluded via the warm
    # steps above; the first composed batch still pays host startup,
    # which is honest — the reference paid it too). Steps chain through
    # the donated state, so the final ``float(loss)`` fetch syncs the
    # whole run; the roundtrip floor is subtracted.
    rng = jax.random.PRNGKey(1)
    rt = _roundtrip_s()
    ds = _dataset(paths, annotations, config, batch_size, num_workers)
    n = 0
    tic = time.perf_counter()
    for images, labels in trainer._device_prefetch(iter(ds)):
        state, loss = trainer.train_step(state, images, labels, rng)
        n += batch_size
    final_loss = float(loss)
    e2e_img_s = n / (time.perf_counter() - tic - rt)
    return _row("train608" if "608" in config_name else config_name,
                config_name, batch_size, n, host_img_s, device_img_s,
                e2e_img_s, final_loss, put_img_s, put_mb_s)


def bench_infer(paths, annotations, config_name, batch_size, num_workers,
                label):
    """Composed inference-from-disk: predict step + decode on device."""
    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import get_config
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params)
    from vision_transformer_detector_tpu.ops.decode import (
        transform_predictions)

    config = get_config(config_name)
    params = init_params(jax.random.PRNGKey(0), config)

    def raw_predict(params, images_float):
        logits = forward(params, images_float, config, train=False)
        return transform_predictions(logits, config)

    @jax.jit
    def predict(params, images_u8):
        images = images_u8.astype(jnp.float32) / 127.5 - 1.0
        return raw_predict(params, images)

    host_img_s, _ = _host_roofline(
        paths, annotations, config, batch_size, num_workers)

    ds = _dataset(paths, annotations, config, batch_size, num_workers)
    first_host = next(iter(ds))[0]
    first_images = jnp.asarray(first_host)
    put_img_s, put_mb_s = _put_throughput(first_host)
    device_img_s = _device_only_infer(raw_predict, params, first_images)

    # Composed: the TPU executes enqueued programs in order on one
    # stream, so fetching a scalar from the LAST batch's output syncs
    # every prior dispatch; the roundtrip floor is subtracted.
    import numpy as np

    _ = predict(params, first_images)  # compile outside the timed region
    rt = _roundtrip_s()
    ds = _dataset(paths, annotations, config, batch_size, num_workers)
    n = 0
    out = None
    tic = time.perf_counter()
    for images, _labels in ds:
        out = predict(params, jax.device_put(images))
        n += batch_size
    _ = float(np.asarray(out[0, 0, 0]))
    e2e_img_s = n / (time.perf_counter() - tic - rt)
    return _row(label, config_name, batch_size, n, host_img_s,
                device_img_s, e2e_img_s, None, put_img_s, put_mb_s)


def _row(label, config_name, batch_size, n, host_img_s, device_img_s,
         e2e_img_s, loss, put_img_s, put_mb_s):
    # Decode and transfer BOTH consume the single host core here (the
    # tunnel serializes in-process), so the realistic host-side ceiling
    # is their serial composition; the device overlaps with that.
    host_serial = 1.0 / (1.0 / host_img_s + 1.0 / put_img_s)
    binding = min(host_serial, device_img_s)
    row = {
        "scenario": label,
        "preset": config_name,
        "batch": batch_size,
        "images": n,
        "host_decode_img_s": round(host_img_s, 1),
        "put_img_s": round(put_img_s, 1),
        "put_mb_s": round(put_mb_s, 1),
        "host_serial_img_s": round(host_serial, 1),
        "device_img_s": round(device_img_s, 1),
        "e2e_img_s": round(e2e_img_s, 1),
        "overlap_eff": round(e2e_img_s / binding, 3),
        "bound_by": "host" if host_serial < device_img_s else "device",
        "cores_to_feed": round(device_img_s / host_img_s, 1),
    }
    if loss is not None:
        row["final_loss"] = round(loss, 4)
    return row


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--corpus", default="/tmp/corpus_full")
    parser.add_argument("--annotations", default=DEFAULT_ANNOTATIONS)
    parser.add_argument("--images", type=int, default=512,
                        help="corpus slice per scenario (default 512)")
    parser.add_argument("--scenario", default="all",
                        choices=("all", "train608", "infer640", "serve224",
                                 "sweep-workers"))
    parser.add_argument("--sweep-counts", default="1,2,4,8",
                        help="comma-separated worker counts for "
                             "--scenario sweep-workers")
    parser.add_argument("--sweep-preset", default="reference_608",
                        help="config preset for the worker sweep")
    parser.add_argument("--workers", type=int,
                        default=max(2, (os.cpu_count() or 1)))
    parser.add_argument("--fast-decode", action="store_true",
                        help="DCT-domain reduced-scale JPEG decode "
                             "(cli --fast-decode twin); engages when the "
                             "canvas is much smaller than the sources")
    args = parser.parse_args()
    global FAST_DECODE
    FAST_DECODE = args.fast_decode

    from vision_transformer_detector_tpu.data.annotations import (
        load_annotations_dict)
    from vision_transformer_detector_tpu.data.pipeline import (
        list_image_paths)

    annotations = load_annotations_dict(args.annotations)
    paths = list_image_paths(args.corpus)[: args.images]
    if not paths:
        raise SystemExit(f"no images under {args.corpus!r}; run "
                         "tools/make_corpus.py first")

    rows = []
    if args.scenario == "sweep-workers":
        counts = [int(c) for c in args.sweep_counts.split(",")]
        rows = sweep_workers(paths, annotations, args.sweep_preset,
                             batch_size=8, worker_counts=counts)
        print(json.dumps({"summary": rows, "host_cores": os.cpu_count(),
                          "corpus": args.corpus,
                          "images_per_scenario": args.images,
                          "fast_decode": args.fast_decode}))
        return
    if args.scenario in ("all", "train608"):
        rows.append(bench_train(paths, annotations, "reference_608",
                                batch_size=8, num_workers=args.workers))
        print(json.dumps(rows[-1]), flush=True)
    if args.scenario in ("all", "infer640"):
        rows.append(bench_infer(paths, annotations, "vit_l16_640",
                                batch_size=8, num_workers=args.workers,
                                label="infer640"))
        print(json.dumps(rows[-1]), flush=True)
    if args.scenario in ("all", "serve224"):
        rows.append(bench_infer(paths, annotations, "vit_s16_224",
                                batch_size=32, num_workers=args.workers,
                                label="serve224"))
        print(json.dumps(rows[-1]), flush=True)

    from vision_transformer_detector_tpu.data.pipeline import (
        native_available)
    print(json.dumps({
        "summary": rows,
        "host_cores": os.cpu_count(),
        "corpus": args.corpus,
        "images_per_scenario": args.images,
        "fast_decode": args.fast_decode,
        "decode_core": "native" if native_available() else "pil",
    }))


if __name__ == "__main__":
    main()
