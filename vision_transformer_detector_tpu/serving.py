"""Detection serving: one fused device program behind a minimal HTTP API.

The reference has no serving story (inference is notebook `model.predict`,
~250 ms/image host-decoded — SURVEY.md §0). Here:

  * ``DetectionService`` — forward + decode + NMS + top-k as ONE jitted
    program (3.55 ms batch-1 at 608px bf16 on v5e, PERFORMANCE.md), with
    JPEG ingest through the same letterbox pipeline training uses and box
    coordinates mapped back to original-image pixels,
  * ``DetectionServer`` — stdlib ThreadingHTTPServer: POST /predict with a
    JPEG body -> JSON detections; GET /healthz. No framework dependencies.

Keep the request queue >=2 deep for peak throughput: per-call dispatch is
the small-batch bottleneck, not the chip (PERFORMANCE.md round-2 sync vs
pipelined measurement).
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from .config import DetectorConfig
from .data.annotations import letterbox_params
from .data.categories import MODEL_ID_TO_NAME


class DetectionService:
    """Jitted end-to-end detector: images in, scored boxes out."""

    def __init__(self, config: DetectorConfig, params,
                 k: int = 17, iou_threshold: float = 0.5,
                 score_threshold: float = 0.0):
        import jax
        import jax.numpy as jnp

        from .models.vit_detector import forward
        from .ops.decode import transform_predictions
        from .ops.nms import postprocess_detections

        self.config = config
        self.params = params

        def predict(params, images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 127.5 - 1.0
            logits = forward(params, images, config)
            decoded = transform_predictions(logits, config)
            return postprocess_detections(
                decoded, k=k, iou_threshold=iou_threshold,
                score_threshold=score_threshold)

        self._predict = jax.jit(predict)

    def detect_array(self, images: np.ndarray) -> List[List[dict]]:
        """(B, H, W, 3) uint8/[-1,1] float -> per-image detection dicts in
        MODEL-frame pixels."""
        scores, classes, boxes, valid = (
            np.asarray(t) for t in self._predict(self.params, images))
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

    def detect_jpeg(self, data: bytes) -> dict:
        """JPEG bytes -> detections with boxes in ORIGINAL-image pixels."""
        from PIL import Image

        with Image.open(io.BytesIO(data)) as pil:
            pil = pil.convert("RGB")
            ow, oh = pil.size
            # Same letterbox as the training pipeline
            # (data/pipeline.py:load_and_letterbox_image): bilinear resize,
            # centered zero padding.
            mh, mw = self.config.image_size
            scale = max(oh / mh, ow / mw)
            rh, rw = max(1, round(oh / scale)), max(1, round(ow / scale))
            resized = np.asarray(
                pil.resize((rw, rh), Image.BILINEAR), np.uint8)
        canvas = np.zeros((mh, mw, 3), np.uint8)
        top, left = (mh - rh) // 2, (mw - rw) // 2
        canvas[top:top + rh, left:left + rw] = resized

        detections = self.detect_array(canvas[None])[0]
        # Map model-frame boxes back to source pixels (inverse of
        # letterbox_boxes, data/annotations.py).
        lb_scale, blank_h, blank_w = letterbox_params((oh, ow), (mh, mw))
        for det in detections:
            box = det["box"]
            box["cx"] = (box["cx"] - blank_w) * lb_scale
            box["cy"] = (box["cy"] - blank_h) * lb_scale
            box["h"] = box["h"] * lb_scale
            box["w"] = box["w"] * lb_scale
        return {"detections": detections,
                "image_size": {"height": oh, "width": ow}}


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
                 max_wait_ms: float = 5.0):
        self.service = service
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._running = True
        self._thread.start()

    def submit(self, image: np.ndarray) -> List[dict]:
        """One (H, W, 3) model-frame image -> its detections."""
        done = threading.Event()
        slot = {"image": image, "event": done, "result": None,
                "error": None}
        self._queue.put(slot)
        done.wait()
        if slot["error"] is not None:
            raise slot["error"]
        return slot["result"]

    def _bucket(self, n: int) -> int:
        size = 1
        while size < n:
            size *= 2
        return min(size, self.max_batch)

    def _worker(self) -> None:
        while self._running:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                return
            batch = [first]
            deadline = threading.Event()
            deadline.wait(self.max_wait)  # collection window
            while len(batch) < self.max_batch:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item is None:
                    self._running = False
                    break
                batch.append(item)

            try:
                bucket = self._bucket(len(batch))
                images = np.stack(
                    [s["image"] for s in batch]
                    + [batch[0]["image"]] * (bucket - len(batch)))
                results = self.service.detect_array(images)
                for slot, dets in zip(batch, results):
                    slot["result"] = dets
            except Exception as exc:
                for slot in batch:
                    slot["error"] = exc
            finally:
                for slot in batch:
                    slot["event"].set()

    def stop(self) -> None:
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=5)


class DetectionServer:
    """Threaded HTTP wrapper around a DetectionService."""

    def __init__(self, service: DetectionService, host: str = "127.0.0.1",
                 port: int = 8000):
        self.service = service
        server = self

        class Handler(BaseHTTPRequestHandler):
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
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/predict":
                    self._send(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                try:
                    result = server.service.detect_jpeg(data)
                except Exception as exc:  # bad image, wrong payload...
                    self._send(400, {"error": str(exc)})
                    return
                self._send(200, result)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
