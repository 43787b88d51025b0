"""Detection serving: one fused device program behind a minimal HTTP API.

The reference has no serving story (inference is notebook `model.predict`,
~250 ms/image host-decoded — SURVEY.md §0). Here:

  * ``DetectionService`` — forward + decode + NMS + top-k as ONE jitted
    program (3.55 ms batch-1 at 608px bf16 on v5e, PERFORMANCE.md), with
    JPEG ingest through the same letterbox pipeline training uses and box
    coordinates mapped back to original-image pixels,
  * ``BatchingDetectionService`` — micro-batching front: concurrent
    requests share one device call (collection window closes early once
    full), amortising per-call dispatch overhead and the device's
    small-batch inefficiency,
  * ``DetectionServer`` — stdlib ThreadingHTTPServer: POST /predict with a
    JPEG body -> JSON detections; GET /healthz. Direct per-request
    dispatch by default (measured fastest on this host at every load —
    see DetectionServer docstring); ``batching=True`` routes through the
    micro-batcher; request timeouts -> 503; graceful shutdown.
"""

from __future__ import annotations

import collections
import json
import math
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from .config import DetectorConfig
from .data.annotations import letterbox_params
from .data.categories import MODEL_ID_TO_NAME


def _pack_raw(scores, classes, boxes, valid):
    """Pack the (B, k) scores / (B, k) int classes / (B, k, 4) boxes /
    (B, k) bool valid postprocess outputs into ONE (B, k, 7) float32
    tensor inside the jitted program. One tensor = one device->host
    transfer per batch; class ids are exact in float32 (80 << 2^24) and
    valid rides as 0/1."""
    import jax.numpy as jnp

    return jnp.concatenate([
        scores[..., None].astype(jnp.float32),
        classes[..., None].astype(jnp.float32),
        boxes.astype(jnp.float32),
        valid[..., None].astype(jnp.float32)], axis=-1)


class DetectionService:
    """Jitted end-to-end detector: images in, scored boxes out."""

    def __init__(self, config: DetectorConfig, params,
                 k: int = 17, iou_threshold: float = 0.5,
                 score_threshold: float = 0.0,
                 fast_decode: bool = False):
        import jax
        import jax.numpy as jnp

        from .models.vit_detector import forward
        from .ops.decode import transform_predictions
        from .ops.nms import postprocess_detections

        self.config = config
        self.params = params
        # DCT-domain reduced-scale JPEG ingest (data/pipeline.py:
        # letterbox_image_bytes) — a measured ~2x host decode win at
        # small canvases (224px), where serving is host-decode-bound.
        self.fast_decode = fast_decode

        def predict(params, images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 127.5 - 1.0
            logits = forward(params, images, config)
            decoded = transform_predictions(logits, config)
            scores, classes, boxes, valid = postprocess_detections(
                decoded, k=k, iou_threshold=iou_threshold,
                score_threshold=score_threshold)
            return _pack_raw(scores, classes, boxes, valid)

        self._predict = jax.jit(predict)

    def predict_raw(self, images: np.ndarray):
        """Async dispatch: returns a DEVICE array — the packed (B, k, 7)
        detections (see _pack_raw) — without syncing; the pipelined
        batcher overlaps the next batch's dispatch with this one's
        completion, and the single packed tensor means ONE device->host
        fetch per batch instead of four (each fetch is a full ~30 ms
        roundtrip on the tunnel; four serialized fetches per batch made
        the batcher LOSE to direct dispatch under load, measured
        2026-08-18)."""
        return self._predict(self.params, images)

    @staticmethod
    def raw_to_detections(raw) -> List[List[dict]]:
        """Sync + convert predict_raw output to per-image dicts.

        Accepts either the packed (B, k, 7) array (live service) or the
        legacy (scores, classes, boxes, valid) tuple — frozen StableHLO
        artifacts with a baked postprocess return the tuple and cannot
        be re-exported from here."""
        if isinstance(raw, (tuple, list)):
            scores, classes, boxes, valid = (np.asarray(t) for t in raw)
        else:
            packed = np.asarray(raw)     # one transfer
            scores = packed[..., 0]
            classes = packed[..., 1].astype(np.int32)
            boxes = packed[..., 2:6]
            valid = packed[..., 6] > 0.5
        out: List[List[dict]] = []
        for b in range(scores.shape[0]):
            dets = []
            for i in range(scores.shape[1]):
                if not valid[b, i]:
                    continue
                cx, cy, bh, bw = (float(x) for x in boxes[b, i])
                class_id = int(classes[b, i])
                dets.append({
                    "score": float(scores[b, i]),
                    "class_id": class_id,
                    "class_name": MODEL_ID_TO_NAME.get(class_id, "unknown"),
                    "box": {"cx": cx, "cy": cy, "h": bh, "w": bw},
                })
            out.append(dets)
        return out

    def detect_array(self, images: np.ndarray) -> List[List[dict]]:
        """(B, H, W, 3) uint8/[-1,1] float -> per-image detection dicts in
        MODEL-frame pixels."""
        return self.raw_to_detections(self.predict_raw(images))

    def letterbox_jpeg(self, data: bytes):
        """JPEG bytes -> (model-frame uint8 canvas, (orig_h, orig_w)).

        The exact letterbox the training pipeline uses — delegates to
        the shared bytes-level core (data/pipeline.py:
        letterbox_image_bytes: native libjpeg decode when built, PIL
        fallback, centered zero padding). Runs on the calling thread,
        so concurrent HTTP requests decode in parallel while the device
        batches; the native path releases the GIL for real parallelism.

        Undecodable bytes raise CorruptImageError (same normalization
        the file pipeline applies) so the HTTP layer can tell a bad
        payload (-> 400) from a server fault (-> 500).
        """
        from .data.pipeline import (CorruptImageError, _pil_bomb_error,
                                    letterbox_image_bytes)

        try:
            return letterbox_image_bytes(
                data, self.config.image_size, fast_decode=self.fast_decode)
        except CorruptImageError:
            raise
        except _pil_bomb_error() as exc:
            # DecompressionBombError subclasses Exception directly.
            raise CorruptImageError("<request body>", exc) from exc
        except (OSError, ValueError, SyntaxError) as exc:
            # Same decoder-failure set the file pipeline normalizes
            # (data/pipeline.py load_and_letterbox_image): PIL raises
            # UnidentifiedImageError (an OSError) on non-image bytes and
            # truncation OSErrors mid-decode.
            raise CorruptImageError("<request body>", exc) from exc

    def map_to_source(self, detections: List[dict],
                      original_size) -> dict:
        """Model-frame detections -> ORIGINAL-image pixels (inverse of
        letterbox_boxes, data/annotations.py)."""
        oh, ow = original_size
        lb_scale, blank_h, blank_w = letterbox_params(
            (oh, ow), self.config.image_size)
        for det in detections:
            box = det["box"]
            box["cx"] = (box["cx"] - blank_w) * lb_scale
            box["cy"] = (box["cy"] - blank_h) * lb_scale
            box["h"] = box["h"] * lb_scale
            box["w"] = box["w"] * lb_scale
        return {"detections": detections,
                "image_size": {"height": oh, "width": ow}}

    def detect_jpeg(self, data: bytes) -> dict:
        """JPEG bytes -> detections with boxes in ORIGINAL-image pixels."""
        canvas, original_size = self.letterbox_jpeg(data)
        return self.map_to_source(self.detect_array(canvas[None])[0],
                                  original_size)


class ExportedDetectionService(DetectionService):
    """DetectionService backed by a StableHLO export artifact.

    The exported graph (export.py: forward + decode, pinned shapes/
    dtypes) replaces the live-model jit; the NMS/top-k postprocess runs
    in its own small jit on the decoded output — unless the artifact was
    exported with a baked postprocess (`cli export --bake-postprocess`),
    in which case the frozen graph already ends in NMS/top-k and the
    spec recorded at export time is authoritative. Serving a frozen
    artifact pins the model graph against code drift — the deployment
    story: `cli export` on the training host, `cli serve --from-export`
    on the serving host, which never imports the model-building code.

    Request batches route through the artifact's exported batch sizes
    (ExportedDetector pads to the smallest fitting graph), so use with a
    multi-batch bundle (`cli export --batch-sizes 1 2 4 8`) for the
    micro-batcher.
    """

    def __init__(self, directory: str, k: int = 17,
                 iou_threshold: float = 0.5,
                 score_threshold: float = 0.0,
                 fast_decode: bool = False):
        import jax

        from .export import load_exported
        from .ops.nms import postprocess_detections

        self._exported = load_exported(directory)
        self.config = self._exported.config
        self.params = None   # the artifact owns the weights
        self.fast_decode = fast_decode

        baked = self._exported.postprocess
        if baked is not None:
            # The artifact carries its own NMS/top-k inside the frozen
            # graph (cli export --bake-postprocess); the spec recorded
            # at export time is authoritative — warn if the serve-time
            # knobs disagree rather than silently ignoring them.
            asked = {"k": k, "iou_threshold": iou_threshold,
                     "score_threshold": score_threshold}
            diffs = {key: (asked[key], baked[key]) for key in asked
                     if asked[key] != baked[key]}
            if diffs:
                import warnings
                warnings.warn(
                    "artifact has baked postprocess; ignoring serve-time "
                    f"settings that differ from the baked spec: {diffs}")

            # uint8 canvases pass straight through: ExportedDetector
            # normalizes uint8 ON DEVICE (export.py __call__), so
            # converting here with numpy would both burn host CPU in the
            # serialized dispatcher and quadruple the host->device bytes
            # (1 -> 4 per pixel) on the link the batcher's own comments
            # identify as the bottleneck.
            def predict(images):
                return self._exported(images)
        else:
            postprocess = jax.jit(lambda decoded: _pack_raw(
                *postprocess_detections(
                    decoded, k=k, iou_threshold=iou_threshold,
                    score_threshold=score_threshold)))

            def predict(images):
                return postprocess(self._exported(images))

        self._predict_exported = predict

    def predict_raw(self, images: np.ndarray):
        return self._predict_exported(images)

    @property
    def max_batch_size(self) -> int:
        return self._exported.batch_size


class BatchingDetectionService:
    """Micro-batching front for a DetectionService.

    Concurrent single-image requests are collected by a worker thread and
    run as one device call, amortising the measured ~31-35 ms per-call
    dispatch overhead (PERFORMANCE.md round-2 sync-vs-pipelined table) and
    the small-batch device inefficiency (4.4 ms/img at b1-8 vs 1.9 at
    b128). Batches are padded to power-of-two buckets so only a handful of
    jit specialisations exist.

    Usage: ``batching.submit(canvas)`` from any thread -> per-image
    detection list (blocks until the batch containing it completes).
    """

    def __init__(self, service: DetectionService, max_batch: int = 8,
                 max_wait_ms: float = 5.0, pipeline_depth: int = 4,
                 completer_threads: int = 4,
                 bucket_mode: str = "pow2"):
        if bucket_mode not in ("pow2", "exact"):
            raise ValueError(f"unknown bucket_mode {bucket_mode!r}")
        self.service = service
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        # "pow2": pad to power-of-two buckets (few jit specialisations).
        # "exact": one graph per size 1..max_batch — no padded transfer
        # bytes, for ingest-bandwidth-bound links; warmup() compiles all
        # sizes up front.
        self.bucket_mode = bucket_mode
        self._queue: "queue.Queue" = queue.Queue()
        # Observability: recent batch sizes (bounded — a long-running
        # server must not grow a per-batch list forever) + monotonic
        # totals. The completer appends; stats() snapshots from handler
        # threads — iterating a deque while another thread appends raises
        # RuntimeError, so both sides take this (uncontended) lock.
        self._stats_lock = threading.Lock()
        self.batch_sizes: "collections.deque" = collections.deque(
            maxlen=4096)
        self.batches_served = 0
        self.images_served = 0
        # Two-stage pipeline: the dispatcher enqueues device work without
        # syncing; a POOL of completers syncs + fulfils. Depth > 1 keeps
        # the device busy during a batch's host round-trip — the measured
        # sync-vs-pipelined gap is ~2x at batch 8 (PERFORMANCE.md
        # dispatch table). The pool matters on high-latency links: each
        # batch's result fetch is a full tunnel roundtrip (~30 ms here),
        # and ONE completer serializes them — measured 2026-08-18, the
        # single-completer batcher lost 2.4x to direct dispatch purely on
        # fetch serialization (direct mode's 8 handler threads overlap
        # their fetches). Batches complete independently (each fulfils
        # only its own slots), so out-of-order completion is safe.
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._completers = [
            threading.Thread(target=self._complete_loop, daemon=True)
            for _ in range(max(1, completer_threads))]
        self._running = True
        self._dispatcher.start()
        for t in self._completers:
            t.start()

    def submit(self, image: np.ndarray,
               timeout: Optional[float] = None) -> List[dict]:
        """One (H, W, 3) model-frame image -> its detections.

        ``timeout`` (seconds) bounds the wait; on expiry the slot is
        cancelled (a worker that has not picked it up yet will skip it)
        and TimeoutError raised.
        """
        if not self._running:
            raise RuntimeError("BatchingDetectionService is stopped")
        done = threading.Event()
        slot = {"image": image, "event": done, "result": None,
                "error": None, "cancelled": False}
        self._queue.put(slot)
        # Re-check AFTER the put: a stop() that raced between the check
        # and the put has already drained the queue, and nothing would
        # ever complete this slot.
        if not self._running and not done.is_set():
            slot["cancelled"] = True
            raise RuntimeError("BatchingDetectionService is stopped")
        if not done.wait(timeout):
            slot["cancelled"] = True
            raise TimeoutError(
                f"detection did not complete within {timeout} s")
        if slot["error"] is not None:
            raise slot["error"]
        return slot["result"]

    def _bucket(self, n: int) -> int:
        if self.bucket_mode == "exact":
            return min(n, self.max_batch)
        size = 1
        while size < n:
            size *= 2
        return min(size, self.max_batch)

    def warmup(self) -> None:
        """Compile every power-of-two bucket up front so the first
        requests never burn their timeout on jit compilation (on a cold
        CPU host one compile can exceed the default request timeout)."""
        h, w = self.service.config.image_size
        sizes = sorted({self._bucket(n)
                        for n in range(1, self.max_batch + 1)})
        for size in sizes:
            self.service.raw_to_detections(self.service.predict_raw(
                np.zeros((size, h, w, 3), np.uint8)))

    def _dispatch_loop(self) -> None:
        stopping = False
        while not stopping:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                if not self._running:
                    break
                continue
            if first is None:
                break
            batch = [first] if not first["cancelled"] else []
            # Collection window: wake as requests arrive and close EARLY
            # the moment the batch is full — the window is an upper bound
            # on added latency, never a mandatory sleep (VERDICT round 2:
            # the old code slept the full window even with max_batch
            # requests already queued).
            deadline = time.monotonic() + self.max_wait
            while batch and len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    stopping = True
                    break
                if not item["cancelled"]:
                    batch.append(item)
            if not batch:
                continue

            try:
                bucket = self._bucket(len(batch))
                images = np.stack(
                    [s["image"] for s in batch]
                    + [batch[0]["image"]] * (bucket - len(batch)))
                raw = self.service.predict_raw(images)   # async dispatch
            except Exception as exc:
                for slot in batch:
                    slot["error"] = exc
                    slot["event"].set()
                continue
            # Blocks when pipeline_depth batches are in flight
            # (backpressure on the device queue).
            self._inflight.put((batch, raw))
        self._inflight.put(None)

    def _complete_loop(self) -> None:
        while True:
            entry = self._inflight.get()
            if entry is None:
                # Re-post the sentinel so every pool member sees it.
                self._inflight.put(None)
                return
            batch, raw = entry
            try:
                results = self.service.raw_to_detections(raw)  # syncs
                with self._stats_lock:
                    self.batch_sizes.append(len(batch))
                    self.batches_served += 1
                    self.images_served += len(batch)
                for slot, dets in zip(batch, results):
                    slot["result"] = dets
            except Exception as exc:
                for slot in batch:
                    slot["error"] = exc
            finally:
                for slot in batch:
                    slot["event"].set()

    def stats(self) -> dict:
        """Batching observability snapshot (served by GET /stats)."""
        with self._stats_lock:
            sizes = list(self.batch_sizes)
            batches_served = self.batches_served
            images_served = self.images_served
        hist: dict = {}
        for s in sizes:
            hist[str(s)] = hist.get(str(s), 0) + 1
        return {
            "batches_served": batches_served,
            "images_served": images_served,
            "mean_batch_recent": (sum(sizes) / len(sizes)) if sizes else 0.0,
            "batch_size_histogram_recent": hist,
            "queue_depth": self._queue.qsize(),
            "max_batch": self.max_batch,
            "bucket_mode": self.bucket_mode,
        }

    def stop(self) -> None:
        """Graceful shutdown: in-flight batches complete; queued requests
        submitted before stop() are still served (the sentinel drains
        after them); new submits are rejected."""
        if not self._running:
            return
        # Close the accept window BEFORE posting the sentinel: submits
        # that arrive during the (up to ~20 s) joins below would
        # otherwise pass both _running checks, land behind the sentinel,
        # and block until the drain errors them out.
        self._running = False
        self._queue.put(None)
        self._dispatcher.join(timeout=10)
        for t in self._completers:
            t.join(timeout=10)
        # Fail any request that raced past the sentinel rather than
        # leaving its submitter blocked forever.
        while True:
            try:
                slot = self._queue.get_nowait()
            except queue.Empty:
                break
            if slot is None:
                continue
            slot["error"] = RuntimeError(
                "BatchingDetectionService stopped")
            slot["event"].set()


class DetectionServer:
    """Threaded HTTP wrapper around a DetectionService.

    Concurrent POST /predict requests decode their JPEGs on their own
    handler threads, then either dispatch directly (default) or ride the
    shared micro-batcher (``batching=True``) — one device call serves up
    to ``max_batch`` requests. The default is DIRECT because it measured
    faster at every load level on this host (PERFORMANCE.md round-3
    serving tables: 44 vs 36 req/s at 8 threads, 38 vs 16 at 32): with
    one CPU core and a ~30 ms-latency tunneled chip, the batcher's
    serialized stages (one dispatcher thread doing multi-MB host->device
    transfers) lose to N handler threads overlapping theirs. Enable
    batching on multi-core hosts with locally-attached chips, where
    per-call dispatch overhead dominates and the device-side batch
    amortization (4.4 -> 1.9 ms/img from b1 to b128, PERFORMANCE.md) can
    actually be banked. ``request_timeout`` bounds the queue wait ->
    HTTP 503.
    """

    def __init__(self, service: DetectionService, host: str = "127.0.0.1",
                 port: int = 8000, batching: bool = False,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 request_timeout: float = 30.0, warmup: bool = True,
                 bucket_mode: str = "pow2",
                 max_body_bytes: int = 32 * 1024 * 1024,
                 max_inflight: int = 64):
        self.service = service
        # Production guards: a Content-Length read without a cap lets one
        # request allocate arbitrary host memory (-> 413), and
        # ThreadingHTTPServer spawns a thread per connection, each holding
        # a decoded canvas — bound concurrent predictions (-> 429).
        self.max_body_bytes = max_body_bytes
        self._inflight_sem = threading.BoundedSemaphore(max_inflight)
        # An export bundle's largest graph bounds the feasible batch
        # (ExportedDetectionService.max_batch_size); a bucket above it
        # would fail every batched request.
        max_batch = min(max_batch,
                        getattr(service, "max_batch_size", max_batch))
        self.batcher: Optional[BatchingDetectionService] = (
            BatchingDetectionService(service, max_batch=max_batch,
                                     max_wait_ms=max_wait_ms,
                                     bucket_mode=bucket_mode)
            if batching else None)
        if warmup:
            if self.batcher is not None:
                self.batcher.warmup()
            else:
                # Direct mode dispatches per-request batch-1 calls;
                # compile that graph now so the FIRST live request does
                # not burn its client timeout on jit compilation (the
                # batcher path always warmed up; the default direct path
                # silently accepted-and-ignored warmup=True).
                h, w = service.config.image_size
                service.raw_to_detections(service.predict_raw(
                    np.zeros((1, h, w, 3), np.uint8)))
        self.request_timeout = request_timeout
        # Request observability for GET /stats: monotonic outcome counters
        # plus a bounded window of recent end-to-end latencies (decode +
        # queue + device + response build). One lock; handler threads only
        # touch it for a few appends per request.
        self._stats_lock = threading.Lock()
        self._started = time.monotonic()
        self._outcomes = {"ok": 0, "bad_request": 0, "timeout": 0,
                          "not_found": 0, "server_error": 0}
        self._latencies_ms: "collections.deque" = collections.deque(
            maxlen=2048)
        server = self

        class Handler(BaseHTTPRequestHandler):
            # Socket timeout for reads: without it a client that sends
            # headers and then stalls the body holds its handler thread
            # (and formerly an in-flight slot) forever. On expiry the
            # read raises and the connection is dropped.
            timeout = max(30.0, request_timeout)

            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True})
                elif self.path == "/stats":
                    self._send(200, server.stats())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/predict":
                    server._record("not_found", None)
                    self._send(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    server._record("bad_request", None)
                    self._send(400, {"error": "malformed Content-Length"})
                    return
                if length < 0:
                    server._record("bad_request", None)
                    self._send(400, {"error": "malformed Content-Length"})
                    return
                if length > server.max_body_bytes:
                    server._record("too_large", None)
                    self._send(413, {
                        "error": f"body {length} bytes exceeds the "
                                 f"{server.max_body_bytes}-byte limit"})
                    return
                # Read the body BEFORE taking an in-flight slot: a slow
                # or stalled upload must cost only its own handler
                # thread (bounded by the socket timeout above), never a
                # prediction slot — 64 trickling uploads used to pin
                # every slot and 429 all legitimate traffic.
                data = self.rfile.read(length)
                if not server._inflight_sem.acquire(blocking=False):
                    server._record("overloaded", None)
                    self._send(429, {"error": "too many in-flight "
                                              "requests; retry later"})
                    return
                try:
                    self._predict(data)
                finally:
                    server._inflight_sem.release()

            def _predict(self, data: bytes):
                from .data.pipeline import CorruptImageError

                tic = time.monotonic()
                try:
                    if server.batcher is not None:
                        canvas, original = server.service.letterbox_jpeg(
                            data)
                        detections = server.batcher.submit(
                            canvas, timeout=server.request_timeout)
                        result = server.service.map_to_source(
                            detections, original)
                    else:
                        result = server.service.detect_jpeg(data)
                except TimeoutError as exc:
                    server._record("timeout", time.monotonic() - tic)
                    self._send(503, {"error": str(exc)})
                    return
                except CorruptImageError as exc:
                    # The one genuinely-client fault: an undecodable
                    # payload (data/pipeline.py normalizes every decoder
                    # failure to this type).
                    server._record("bad_request", time.monotonic() - tic)
                    self._send(400, {"error": str(exc)})
                    return
                except Exception as exc:
                    # Everything else is OUR fault (device/runtime/tunnel
                    # faults, service bugs). Returning these as 400 told
                    # clients and load balancers a server outage was
                    # their malformed traffic — 4xx is never retried, and
                    # /stats blamed bad_request for the whole outage.
                    server._record("server_error", time.monotonic() - tic)
                    self._send(500, {"error": str(exc)})
                    return
                server._record("ok", time.monotonic() - tic)
                self._send(200, result)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None
        self._serving = False

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def _record(self, outcome: str, latency_s: Optional[float]) -> None:
        with self._stats_lock:
            self._outcomes[outcome] = self._outcomes.get(outcome, 0) + 1
            # Only successful predictions feed the latency window: error
            # paths return in microseconds and would drag the percentiles
            # into meaninglessness.
            if outcome == "ok" and latency_s is not None:
                self._latencies_ms.append(latency_s * 1e3)

    def stats(self) -> dict:
        """Operational snapshot: outcome counters, latency percentiles
        over the recent window, and the micro-batcher's batch shape."""
        with self._stats_lock:
            outcomes = dict(self._outcomes)
            lat = sorted(self._latencies_ms)
        from .data.pipeline import native_available
        out = {
            "uptime_s": round(time.monotonic() - self._started, 3),
            "requests": {**outcomes, "total": sum(outcomes.values())},
            # Which JPEG decode core handles payloads — a silent PIL
            # fallback is otherwise invisible from the outside.
            "decode_core": "native" if native_available() else "pil",
            "batching": (self.batcher.stats()
                         if self.batcher is not None else None),
        }
        if lat:
            def pct(p: float) -> float:
                # Nearest-rank percentile: ceil(p/100 * n)-th smallest.
                # int(p/100 * n) as an index sat one rank high (with 2
                # samples "p50" returned the max — round-3 review
                # finding).
                rank = math.ceil(p / 100.0 * len(lat))
                return round(lat[max(0, rank - 1)], 3)
            out["latency_ms_recent"] = {
                "count": len(lat),
                "mean": round(sum(lat) / len(lat), 3),
                "p50": pct(50), "p90": pct(90), "p99": pct(99),
                "max": round(lat[-1], 3),
            }
        return out

    def start(self) -> None:
        self._serving = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self._serving = True
        self._httpd.serve_forever()

    def stop(self) -> None:
        """Graceful shutdown: stop accepting, finish in-flight handler
        threads (they hold the batcher until served), then stop the
        batcher. Safe to call on a never-started server
        (HTTPServer.shutdown() would block forever waiting for a
        serve_forever loop that never ran)."""
        if self._serving:
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self.batcher is not None:
            self.batcher.stop()
