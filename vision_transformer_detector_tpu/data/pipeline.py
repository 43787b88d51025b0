"""Host input pipeline: image decode + letterbox + fixed-slot labels.

TPU-native replacement for the reference's tf.data + tf.py_function pipeline
(vision_transformer_utilities.py:510-615). The reference pins all per-image
work to the Python interpreter via ``tf.py_function`` and does per-box
pandas lookups (the pipeline hot spot, SURVEY.md §3.1); here:

  * decode runs on the host (PIL, releases the GIL) in a small worker pool,
  * the letterbox transform of boxes is a single vectorised NumPy op,
  * normalisation to [-1, 1] is fused into the device program by the
    trainer (the pipeline ships uint8 when asked, saving 4x host->device
    bandwidth — on TPU the HBM transfer is the bottleneck, not the VPU
    divide),
  * batches are prefetched by a background thread into a bounded queue,
  * per-host sharding for multi-host SPMD is a (shard_index, num_shards)
    slice of the file list, matching ``jax.process_index`` semantics.
"""

from __future__ import annotations

import logging
import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import DetectorConfig
from .annotations import AnnotationsDict, labels_from_annotations

try:  # Native JPEG decode + letterbox core (native/pipeline.cc); optional.
    from .._native import _native_pipeline  # type: ignore
except ImportError:  # pragma: no cover - depends on tools/build_native.sh
    _native_pipeline = None


def native_available() -> bool:
    return _native_pipeline is not None


def _pil_bomb_error():
    """PIL's DecompressionBombError class (lazy — PIL imports lazily
    everywhere in this module so non-PIL hosts can still import it)."""
    from PIL import Image

    return Image.DecompressionBombError


class CorruptImageError(ValueError):
    """A file that exists but cannot be decoded as an image (zero-byte,
    truncated past PIL's tolerance, or a non-image with an image
    extension).

    The reference silently trusted ``tf.io.decode_image``
    (vision_transformer_utilities.py:418-449) and died with an opaque
    graph error on the first bad file. Here the single-image API raises
    this typed error with the offending path, and the dataset layer
    offers an explicit skip-vs-fail policy (``on_corrupt``).
    """

    def __init__(self, path: str, reason: Exception):
        super().__init__(f"cannot decode image {path!r}: "
                         f"{type(reason).__name__}: {reason}")
        self.path = path
        self.reason = reason

    def __reduce__(self):
        # Cross-process transport (pool='process' decode): ``reason``
        # may hold an unpicklable third-party exception, and the
        # two-argument __init__ breaks default exception pickling.
        # Transport the already-formatted ``args`` verbatim (no second
        # copy of the message format to drift) with a string-backed
        # stand-in for the reason.
        return (_rebuild_corrupt_error,
                (self.path, str(self.reason), self.args))


def _rebuild_corrupt_error(path: str, reason_str: str,
                           args: tuple) -> "CorruptImageError":
    exc = CorruptImageError(path, ValueError(reason_str))
    exc.args = args
    return exc


def list_image_paths(image_dir: str,
                     images_range: Optional[Tuple[int, Optional[int]]] = None,
                     shuffle: bool = False,
                     seed: Optional[int] = None) -> List[str]:
    """Recursive file listing with optional shuffle and range slice
    (vtu.py:385-415).

    A nonexistent directory raises (os.walk would silently yield
    nothing, and a typo'd --val-images then reported mAP 0.0 as if the
    model were bad); an existing-but-empty directory returns []."""
    if not os.path.isdir(image_dir):
        if os.path.exists(image_dir):
            # A file (e.g. a single image) passed where a directory is
            # expected deserves its real diagnosis, not "does not exist".
            raise NotADirectoryError(
                f"image path exists but is not a directory: {image_dir!r}")
        raise FileNotFoundError(
            f"image directory does not exist: {image_dir!r}")
    paths: List[str] = []
    for root, _, names in os.walk(image_dir):
        for name in sorted(names):
            if name.startswith("."):
                continue  # hidden / AppleDouble ("._x.jpg") junk files
            if name.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                paths.append(os.path.join(root, name))
    if shuffle:
        rng = random.Random(seed)
        rng.shuffle(paths)
    if images_range is not None:
        start, end = images_range
        paths = paths[start:end]
    return paths


def image_id_from_path(path: str) -> str:
    """'000000000139.jpg' -> '139' (vtu.py:297-303).

    Non-COCO-named files ('img_001.jpg') fall back to the raw stem
    instead of raising mid-iteration: they simply miss the annotation
    lookup and get an empty label tensor, like any unannotated image.
    """
    stem = os.path.splitext(os.path.basename(path))[0]
    try:
        return str(int(stem))
    except ValueError:
        return stem


def load_and_letterbox_image(path: str, config: DetectorConfig,
                             normalize: bool = True,
                             use_native: Optional[bool] = None,
                             fast_decode: bool = False
                             ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Decode + aspect-preserving resize + center pad (vtu.py:418-449).

    Returns the image (float32 in [-1,1] when ``normalize`` else uint8) and
    the original (height, width) needed for the label transform. JPEGs go
    through the native C++ core when built (native/pipeline.cc); everything
    else (and fallback) uses PIL.

    ``fast_decode`` enables DCT-domain reduced-scale JPEG decode (libjpeg
    ``scale_num/8`` natively; PIL ``draft()`` in the fallback): the file is
    decoded at the smallest scale that still covers the letterbox resize
    target, skipping most of the IDCT when the canvas is much smaller than
    the source. Letterbox geometry and the returned original dims are
    computed from the FULL header dims, so labels/boxes are unaffected;
    pixel values differ slightly from the exact path (measured max ±3/255
    per channel, tests/test_native_pipeline.py) because the resampling
    chain changes. It is a no-op (bit-identical) when the target is
    within 8/8 of the source, e.g. 608px training on COCO-sized
    (<=640px) images; the win is small-canvas serving/eval (measured on
    the real-size corpus at a 224px canvas: 1.31x native, 1.55x PIL;
    fading to ~1.05x at 384px where Huffman decode dominates —
    PERFORMANCE.md round 4b).
    """
    try:
        with open(path, "rb") as f:
            data = f.read()
        canvas, original_size = letterbox_image_bytes(
            data, config.image_size, fast_decode=fast_decode,
            use_native=use_native,
            is_jpeg=path.lower().endswith((".jpg", ".jpeg")))
    except FileNotFoundError:
        # A missing file is a dataset-listing bug, not a corrupt image;
        # keep the raw error (the skip policy must not paper over it).
        raise
    except _pil_bomb_error() as exc:
        # PIL's DecompressionBombError subclasses Exception directly
        # (not OSError/ValueError), so without this clause an oversized
        # header would crash --on-corrupt skip — the one policy meant
        # to survive exactly such files.
        raise CorruptImageError(path, exc) from exc
    except (OSError, ValueError, SyntaxError) as exc:
        # PIL raises UnidentifiedImageError (an OSError) on zero-byte /
        # non-image files and "image file is truncated" OSErrors mid-
        # decode; normalize them all to the typed policy error.
        raise CorruptImageError(path, exc) from exc
    if not normalize:
        return canvas, original_size
    return normalize_image(canvas), original_size


def letterbox_image_bytes(data: bytes, image_size: Tuple[int, int],
                          fast_decode: bool = False,
                          use_native: Optional[bool] = None,
                          is_jpeg: bool = True
                          ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Encoded image bytes -> (uint8 letterbox canvas, (orig_h, orig_w)).

    The bytes-level core shared by the file pipeline above and the
    serving ingest path (serving.py:letterbox_jpeg). Raises OSError /
    ValueError on undecodable bytes — callers own the policy (the file
    pipeline wraps into CorruptImageError; serving returns HTTP 400).
    """
    mh, mw = image_size
    if use_native is None:
        # Native whenever built: it wins at every measured geometry even
        # single-threaded (round-4 re-measure on the real-size corpus —
        # 224px 448 vs 254 img/s, 608px 272 vs 165, 640px synthetic 193
        # vs 175; PERFORMANCE.md), and it is fully GIL-free so the edge
        # widens with worker threads. (An earlier round measured PIL
        # narrowly ahead on one core; the native resize's row-cache
        # rewrite flipped that.)
        use_native = _native_pipeline is not None
    if use_native and _native_pipeline is not None and is_jpeg:
        try:
            canvas_bytes, oh, ow = _native_pipeline.decode_letterbox(
                data, mh, mw, fast_decode)
        except ValueError:
            # libjpeg cannot color-convert every JPEG flavour PIL can
            # (CMYK/Adobe-YCCK scans exist in real COCO); fall through
            # to the PIL path below rather than killing the run on one
            # exotic file. Truly corrupt bytes raise there too.
            pass
        else:
            canvas = np.frombuffer(canvas_bytes, np.uint8).reshape(
                mh, mw, 3)
            return canvas, (oh, ow)

    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as pil:
        # Full dims BEFORE any draft-mode scaling: letterbox geometry
        # and the returned original size key off the true image size.
        ow, oh = pil.size
        # Uniform decode-bomb cap, the PIL twin of native/pipeline.cc's
        # header check (2^27 px ~ 134M). Without it the native
        # rejection is moot — its ValueError lands in the CMYK
        # fall-through above and PIL (whose own bomb threshold is a
        # higher 179M px) would decode the ~400 MB image anyway.
        if oh * ow > (1 << 27):
            raise ValueError(
                f"image dimensions too large ({ow}x{oh})")
        scale = max(oh / mh, ow / mw)
        rh, rw = max(1, round(oh / scale)), max(1, round(ow / scale))
        if fast_decode:
            # PIL's twin of the native DCT-scaled decode: configures
            # the JPEG reader to the nearest power-of-2 scale whose
            # output still covers (rw, rh). No-op for non-JPEG files.
            pil.draft("RGB", (rw, rh))
        pil = pil.convert("RGB")
        pil = pil.resize((rw, rh), Image.BILINEAR)
        resized = np.asarray(pil, np.uint8)

    top = (mh - rh) // 2
    left = (mw - rw) // 2
    canvas = np.zeros((mh, mw, 3), np.uint8)
    canvas[top:top + rh, left:left + rw] = resized
    return canvas, (oh, ow)


def normalize_image(image_uint8: np.ndarray) -> np.ndarray:
    """[0,255] uint8 -> [-1,1] float32 (vtu.py:442-447)."""
    return image_uint8.astype(np.float32) / 127.5 - 1.0


# --- process-pool decode workers (CocoDetectionDataset pool='process') ----
# Heavy per-worker state (config + the full annotation dict) ships ONCE
# per worker through the executor initializer, not per task: pickling it
# on every submit would cost more than the decode.

_PROC_STATE: dict = {}


def _proc_init(config, annotations, normalize, fast_decode) -> None:
    _PROC_STATE["args"] = (config, annotations, normalize, fast_decode)


def _proc_load(path: str) -> Tuple[np.ndarray, np.ndarray]:
    config, annotations, normalize, fast_decode = _PROC_STATE["args"]
    image, original_size = load_and_letterbox_image(
        path, config, normalize=normalize, fast_decode=fast_decode)
    labels = labels_from_annotations(
        annotations.get(image_id_from_path(path)), original_size, config)
    return image, labels


class CocoDetectionDataset:
    """Batched, prefetched (image, label) stream.

    Equivalent of ``coco_data_vision_transformer`` (vtu.py:556-615):
    batches of ``(images [B,H,W,3] in [-1,1], labels [B,max_objects,6])``
    with ``drop_remainder`` semantics, plus per-host sharding for SPMD.
    """

    def __init__(self,
                 image_paths: Sequence[str],
                 annotations: AnnotationsDict,
                 config: DetectorConfig,
                 batch_size: int = 8,
                 drop_remainder: bool = True,
                 shard_index: int = 0,
                 num_shards: int = 1,
                 num_workers: int = 2,
                 prefetch: int = 2,
                 normalize: bool = True,
                 on_corrupt: str = "raise",
                 fast_decode: bool = False,
                 pool: str = "thread"):
        if on_corrupt not in ("raise", "skip"):
            raise ValueError(
                f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
        if pool not in ("thread", "process"):
            raise ValueError(
                f"pool must be 'thread' or 'process', got {pool!r}")
        self.image_paths = list(image_paths)[shard_index::num_shards]
        self.annotations = annotations
        self.config = config
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.normalize = normalize
        # Corrupt-file policy: 'raise' (default) stops the run with a
        # CorruptImageError naming the file; 'skip' logs a warning, drops
        # the file, and BACKFILLS the batch from subsequent paths so
        # every yielded batch stays full (static shapes for the device).
        # Multi-host caution: 'skip' can give shards different batch
        # counts if corrupt files are unevenly distributed, desyncing
        # train collectives — prefer cleaning the dataset or 'raise'
        # for multi-process training.
        self.on_corrupt = on_corrupt
        # DCT-domain reduced-scale JPEG decode (see
        # load_and_letterbox_image): geometry-exact, pixel-approximate,
        # ~2-3x host decode for canvases much smaller than the sources.
        self.fast_decode = fast_decode
        # Decode worker pool type — see _make_executor.
        self.pool = pool
        self.skipped_paths: List[str] = []

    def __len__(self) -> int:
        """Batch count assuming no skips; with ``on_corrupt='skip'`` this
        is an upper bound (each dropped file removes one image)."""
        n = len(self.image_paths)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    # ------------------------------------------------------------------
    def _load_one(self, path: str) -> Tuple[np.ndarray, np.ndarray]:
        image, original_size = load_and_letterbox_image(
            path, self.config, normalize=self.normalize,
            fast_decode=self.fast_decode)
        image_annotations = self.annotations.get(image_id_from_path(path))
        labels = labels_from_annotations(
            image_annotations, original_size, self.config)
        return image, labels

    def _make_executor(self):
        """(executor, task) for the configured decode pool.

        ``pool='thread'`` (default): the native libjpeg core releases
        the GIL, so threads scale on most hosts with zero start-up or
        pickling cost. ``pool='process'``: full process isolation for
        GIL-hostile hosts (PIL-fallback decode, Python-heavy label
        transforms) — the reference's own stats tool made the same
        thread->process escalation (coco_statistics.py:213-218).
        Workers are started via *forkserver*, never a plain fork: by
        decode time the parent usually owns a live JAX runtime with
        background threads, and forking that can deadlock the child.
        """
        if self.pool == "process":
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            ctx = mp.get_context("forkserver")
            ex = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_proc_init,
                initargs=(self.config, self.annotations, self.normalize,
                          self.fast_decode))
            return ex, _proc_load
        return (ThreadPoolExecutor(max_workers=self.num_workers),
                self._load_one)

    def _batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        paths = self.image_paths
        pool, task = self._make_executor()
        try:
            if self.on_corrupt == "raise":
                for b in range(len(self)):
                    chunk = paths[b * self.batch_size:
                                  (b + 1) * self.batch_size]
                    pairs = list(pool.map(task, chunk))
                    images = np.stack([p[0] for p in pairs])
                    labels = np.stack([p[1] for p in pairs])
                    yield images, labels
                return
            # 'skip': stream decode results in order, dropping failures
            # and backfilling so each batch is full. The final partial
            # batch obeys drop_remainder like the no-skip path. Corrupt
            # files are caught at .result() time, identically for both
            # pool types (CorruptImageError pickles back from a process
            # worker via its __reduce__).
            #
            # Futures are submitted through a BOUNDED sliding window, not
            # one pool.map over the whole path list: Executor.map creates
            # every future eagerly, so decoded images would buffer ahead
            # of the consumer without backpressure (a 608px corpus fills
            # host RAM in seconds when the train step is the slow side),
            # and abandoning the iterator would block in the executor's
            # shutdown until the ENTIRE corpus had been decoded.
            from collections import deque

            window = max(self.batch_size * 2, self.num_workers * 4)
            inflight: "deque" = deque()
            next_idx = 0
            pending: List[Tuple[np.ndarray, np.ndarray]] = []
            while inflight or next_idx < len(paths):
                while len(inflight) < window and next_idx < len(paths):
                    inflight.append((paths[next_idx],
                                     pool.submit(task, paths[next_idx])))
                    next_idx += 1
                path, future = inflight.popleft()
                try:
                    pair = future.result()
                except CorruptImageError as exc:
                    # Dedup across epochs: Trainer.fit re-iterates the
                    # dataset every epoch, so the same corrupt file skips
                    # again each time — the report (and the "(%d so far)"
                    # counter) should list each UNIQUE bad file once.
                    if path not in self.skipped_paths:
                        self.skipped_paths.append(path)
                    logging.getLogger(__name__).warning(
                        "skipping corrupt image (%d unique so far): %s",
                        len(self.skipped_paths), exc)
                    continue
                pending.append(pair)
                if len(pending) == self.batch_size:
                    yield (np.stack([p[0] for p in pending]),
                           np.stack([p[1] for p in pending]))
                    pending = []
            if pending and not self.drop_remainder:
                yield (np.stack([p[0] for p in pending]),
                       np.stack([p[1] for p in pending]))
        finally:
            pool.shutdown(wait=True)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Iterate with a background prefetch thread (bounded queue), the
        host-side half of the host+device prefetch pipeline."""
        return prefetch_iter(self._batches(), self.prefetch)


def prefetch_iter(batches: Iterable, depth: int = 2) -> Iterator:
    """Consume ``batches`` on a background thread through a bounded
    queue of ``depth`` — host work (decode/letterbox) overlaps whatever
    the consumer blocks on (typically the device step's tunnel
    round-trip). The host half of the host+device prefetch pipeline;
    also wraps the standalone protocol-eval loop (round-4 verdict #5:
    the 4,952-image run spent ~65% of wall on un-overlapped tunnel
    latency).

    Abandoning the iterator early (break / exception / zip) must not
    leak the producer: the bounded q.put would block forever with no
    consumer, pinning the thread, its worker pool, and the buffered
    batches (round-3 review finding) — so every put is stoppable and
    the generator's close path signals + drains. Producer exceptions
    re-raise on the consumer side.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    error: List[BaseException] = []

    def stoppable_put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batches:
                if not stoppable_put(batch):
                    return
        except BaseException as exc:  # surfaced on the consumer side
            error.append(exc)
        finally:
            stoppable_put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
        while True:   # unblock a producer mid-put
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)


class ResumableDataset:
    """Deterministic, checkpointable input iterator (grain-style).

    The reference restarts its dataset from scratch on every resume (no
    input-state persistence exists, SURVEY.md §5). Here the iterator state
    is a JSON-serializable ``{"epoch", "batch", "seed"}``: every epoch's
    order is a deterministic permutation seeded by (seed, epoch), and
    ``set_state`` resumes at the exact next batch WITHOUT loading the
    already-consumed images (index arithmetic on the path list).

    Each ``__iter__`` pass yields the REMAINDER of the current epoch and
    then advances to the next epoch, so it drops into ``Trainer.fit``'s
    epoch loop directly (one pass per epoch).
    """

    def __init__(self,
                 image_paths: Sequence[str],
                 annotations: AnnotationsDict,
                 config: DetectorConfig,
                 batch_size: int = 8,
                 shuffle: bool = True,
                 seed: int = 0,
                 **dataset_kwargs):
        if dataset_kwargs.get("on_corrupt", "raise") == "skip":
            raise ValueError(
                "on_corrupt='skip' cannot compose with ResumableDataset: "
                "the resume position is index arithmetic (batch * "
                "batch_size paths consumed per batch), which skip+"
                "backfill breaks — a resumed run would replay or lose "
                "images around each corrupt file. Clean the corrupt "
                "files out of the dataset instead (the skip warning "
                "logs each path)")
        self.image_paths = list(image_paths)
        self.annotations = annotations
        self.config = config
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.dataset_kwargs = dataset_kwargs
        self.epoch = 0
        self.batch = 0

    # -- state -----------------------------------------------------------
    def get_state(self) -> dict:
        return {"epoch": self.epoch, "batch": self.batch, "seed": self.seed}

    def set_state(self, state: dict) -> None:
        if state["seed"] != self.seed:
            raise ValueError(
                f"state seed {state['seed']} != dataset seed {self.seed}; "
                "resuming with a different shuffle seed would change the "
                "data order")
        self.epoch = int(state["epoch"])
        self.batch = int(state["batch"])

    # -- iteration ---------------------------------------------------------
    def _epoch_paths(self, epoch: int) -> List[str]:
        """This host's share of the epoch's deterministic order.

        Sharding (shard_index/num_shards kwargs) is applied to the FULL
        shuffled epoch — never to a resume-sliced remainder, which would
        silently change shard membership after a restart (round-3
        review finding). The per-batch resume slice then indexes into
        this host's stable sequence.
        """
        paths = list(self.image_paths)
        if self.shuffle:
            rng = np.random.default_rng([self.seed, epoch])
            rng.shuffle(paths)
        shard = self.dataset_kwargs.get("shard_index", 0)
        num = self.dataset_kwargs.get("num_shards", 1)
        # Equal shard lengths across hosts: strided shards differ by up
        # to one image, which can give one host one MORE full batch and
        # desync the train collectives. Capping every shard at the floor
        # keeps the counts equal, and under shuffle the dropped
        # remainder rotates per epoch instead of permanently excluding
        # the tail of the listing.
        return paths[shard::num][:len(paths) // num] if num > 1 \
            else paths

    def __len__(self) -> int:
        num = self.dataset_kwargs.get("num_shards", 1)
        per_shard = len(self.image_paths) // num
        return per_shard // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self.batch >= len(self):  # checkpointed exactly at epoch end
            self.epoch += 1
            self.batch = 0
        paths = self._epoch_paths(self.epoch)
        remaining = paths[self.batch * self.batch_size:]
        inner_kwargs = {k: v for k, v in self.dataset_kwargs.items()
                        if k not in ("shard_index", "num_shards")}
        dataset = CocoDetectionDataset(
            remaining, self.annotations, self.config,
            batch_size=self.batch_size, drop_remainder=True,
            **inner_kwargs)
        for batch in dataset:
            # Increment BEFORE yielding: get_state() taken while the
            # consumer holds this batch already counts it as consumed.
            # CAUTION: any prefetch wrapper that pulls ahead of the
            # consumer advances this counter past the consumed batch;
            # checkpoint the state BEFORE wrapping, or account for the
            # wrapper's lookahead (Trainer._device_prefetch pulls ONE
            # ahead).
            self.batch += 1
            yield batch
        self.epoch += 1
        self.batch = 0


def synthetic_batches(config: DetectorConfig, batch_size: int,
                      num_batches: int, seed: int = 0,
                      max_boxes: int = 5
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic synthetic (image, label) batches for tests/benches
    (no COCO files needed)."""
    rng = np.random.default_rng(seed)
    h, w = config.image_size
    for _ in range(num_batches):
        images = rng.uniform(-1, 1, (batch_size, h, w, 3)).astype(np.float32)
        labels = np.full((batch_size, config.max_objects, 6), -8.0,
                         np.float32)
        labels[..., 0] = 0.0
        for i in range(batch_size):
            n = int(rng.integers(1, max_boxes + 1))
            for s in range(min(n, config.max_objects)):
                bh = float(rng.uniform(10, h / 2))
                bw = float(rng.uniform(10, w / 2))
                cx = float(rng.uniform(bw / 2, w - bw / 2))
                cy = float(rng.uniform(bh / 2, h - bh / 2))
                labels[i, s] = (1.0, float(rng.integers(0, config.num_classes)),
                                cx, cy, bh, bw)
        yield images, labels
