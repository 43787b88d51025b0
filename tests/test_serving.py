"""Serving endpoint tests: the fused predict program and the HTTP API."""

import io
import json
import os
import urllib.request

import jax
import numpy as np
import pytest

from vision_transformer_detector_tpu.config import DetectorConfig
from vision_transformer_detector_tpu.models.vit_detector import init_params
from vision_transformer_detector_tpu.serving import (
    DetectionServer, DetectionService)

CFG = DetectorConfig(
    image_size=(64, 64), patch_size=16, embedding_dim=16, num_heads=2,
    key_dim=8, encoder_blocks=2, encoder_mlp_layers=3, head_last_units=16,
    head_layers=2)


@pytest.fixture(scope="module")
def service():
    params = init_params(jax.random.PRNGKey(0), CFG)
    return DetectionService(CFG, params, score_threshold=-1.0)


def test_detect_array_shapes(service):
    images = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), np.uint8)
    results = service.detect_array(images)
    assert len(results) == 2
    for dets in results:
        for det in dets:
            assert set(det) == {"score", "class_id", "class_name", "box"}
            assert 0 <= det["class_id"] < CFG.num_classes
            assert set(det["box"]) == {"cx", "cy", "h", "w"}


def test_packed_raw_roundtrip_is_exact(service):
    """predict_raw packs (scores, classes, boxes, valid) into one
    (B, k, 7) tensor (one device->host fetch per call, PERFORMANCE.md
    round-3d); unpacking must lose nothing vs the tuple path that the
    baked-postprocess export artifacts still use."""
    images = np.random.default_rng(7).integers(
        0, 255, (3, 64, 64, 3), np.uint8)
    packed = np.asarray(service.predict_raw(images))
    assert packed.shape == (3, 17, 7) and packed.dtype == np.float32
    via_packed = service.raw_to_detections(service.predict_raw(images))
    # The tuple path, reconstructed from the same packed columns.
    via_tuple = service.raw_to_detections(
        (packed[..., 0], packed[..., 1].astype(np.int32),
         packed[..., 2:6], packed[..., 6] > 0.5))
    assert via_packed == via_tuple
    # Class ids are exact integers after the float32 ride.
    for dets in via_packed:
        for det in dets:
            assert det["class_id"] == int(det["class_id"])
            assert 0 <= det["class_id"] < CFG.num_classes


def test_detect_jpeg_maps_to_original_pixels(service):
    from PIL import Image

    # Non-square source: letterbox geometry is non-trivial.
    arr = np.random.default_rng(1).integers(0, 255, (48, 96, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    result = service.detect_jpeg(buf.getvalue())
    assert result["image_size"] == {"height": 48, "width": 96}
    # The inverse-letterbox range: model frame [0, 64] maps to
    # (coord - blank) * scale in source pixels (an untrained model may
    # put boxes in the padded blanks, i.e. slightly outside the source).
    from vision_transformer_detector_tpu.data.annotations import (
        letterbox_params)
    scale, blank_h, blank_w = letterbox_params((48, 96), CFG.image_size)
    lo_x, hi_x = (0 - blank_w) * scale, (64 - blank_w) * scale
    lo_y, hi_y = (0 - blank_h) * scale, (64 - blank_h) * scale
    assert result["detections"], "score_threshold=-1 keeps all slots"
    for det in result["detections"]:
        assert lo_x - 1 <= det["box"]["cx"] <= hi_x + 1
        assert lo_y - 1 <= det["box"]["cy"] <= hi_y + 1


def test_http_server_roundtrip(service):
    from PIL import Image

    server = DetectionServer(service, port=0)  # ephemeral port
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}

        arr = np.zeros((32, 32, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=60) as r:
            result = json.loads(r.read())
        assert "detections" in result
        assert result["image_size"] == {"height": 32, "width": 32}

        # Bad payload -> 400, not a crash.
        req = urllib.request.Request(f"{base}/predict", data=b"not a jpeg")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.stop()


def test_batching_service_concurrent_submit(service):
    """Concurrent submits collapse into micro-batches; every caller gets
    its own image's detections (checked via image-dependent output)."""
    import threading

    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    batching = BatchingDetectionService(service, max_batch=4,
                                        max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(2)
        images = [rng.integers(0, 255, (64, 64, 3), np.uint8)
                  for _ in range(6)]
        # Ground truth: each image run alone.
        solo = [service.detect_array(img[None])[0] for img in images]

        results = [None] * len(images)
        def run(i):
            results[i] = batching.submit(images[i])
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, (got, want) in enumerate(zip(results, solo)):
            assert got is not None, i
            assert len(got) == len(want), i
            for g, w in zip(got, want):
                assert g["class_id"] == w["class_id"]
                # batch-1 vs batch-4 XLA programs reassociate fp32 slightly
                assert g["score"] == pytest.approx(w["score"], abs=1e-3)
    finally:
        batching.stop()


def test_batching_service_propagates_errors(service):
    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    batching = BatchingDetectionService(service, max_wait_ms=1.0)
    try:
        with pytest.raises(Exception):
            batching.submit(np.zeros((3, 3), np.uint8))  # bad rank
    finally:
        batching.stop()


def test_http_server_batches_concurrent_requests(service):
    """Concurrent HTTP requests ride the micro-batcher (VERDICT r2: the
    server used to bypass it): all succeed, and at least one device call
    served more than one request."""
    import threading

    from PIL import Image

    server = DetectionServer(service, port=0, batching=True, max_batch=4,
                             max_wait_ms=50.0)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        rng = np.random.default_rng(3)
        payloads = []
        for _ in range(8):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (40, 40, 3),
                                         np.uint8)).save(buf, format="JPEG")
            payloads.append(buf.getvalue())
        # Warm the jit cache so the batch window isn't dwarfed by compile.
        service.detect_array(np.zeros((4, 64, 64, 3), np.uint8))

        results = [None] * len(payloads)

        def run(i):
            req = urllib.request.Request(
                f"{base}/predict", data=payloads[i],
                headers={"Content-Type": "image/jpeg"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None and "detections" in r for r in results)
        assert server.batcher is not None
        assert max(server.batcher.batch_sizes) > 1, (
            f"no batching happened: {server.batcher.batch_sizes}")
    finally:
        server.stop()


def test_batch_window_closes_early_when_full(service):
    """A full batch must dispatch immediately, not sleep out the window
    (VERDICT r2 weak #2): 4 requests with a 5-second window complete in
    well under a second."""
    import threading
    import time as _time

    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    service.detect_array(np.zeros((4, 64, 64, 3), np.uint8))  # warm jit
    batching = BatchingDetectionService(service, max_batch=4,
                                        max_wait_ms=5000.0)
    try:
        images = [np.zeros((64, 64, 3), np.uint8)] * 4
        start = _time.monotonic()
        threads = [threading.Thread(
            target=lambda im=i: batching.submit(im)) for i in images]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        elapsed = _time.monotonic() - start
        assert elapsed < 2.0, f"window was not closed early: {elapsed:.1f}s"
        assert batching.batch_sizes and max(batching.batch_sizes) == 4
    finally:
        batching.stop()


def test_stats_concurrent_with_completer(service):
    """stats() snapshots while the completer appends — iterating a deque
    that another thread mutates raises RuntimeError, so the snapshot and
    the counter updates must share a lock (serving.py _stats_lock)."""
    import threading

    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    batching = BatchingDetectionService(service, max_batch=2,
                                        max_wait_ms=1.0)
    stats_errors = []
    stop = threading.Event()

    def hammer_stats():
        while not stop.is_set():
            try:
                st = batching.stats()
                assert st["images_served"] >= 0
            except Exception as exc:  # RuntimeError pre-fix
                stats_errors.append(exc)
                return

    try:
        readers = [threading.Thread(target=hammer_stats) for _ in range(3)]
        for r in readers:
            r.start()
        img = np.zeros((64, 64, 3), np.uint8)
        results = [None] * 16
        def run(i):
            results[i] = batching.submit(img)
        writers = [threading.Thread(target=run, args=(i,))
                   for i in range(len(results))]
        for t in writers:
            t.start()
        for t in writers:
            t.join(timeout=120)
        stop.set()
        for r in readers:
            r.join(timeout=30)
        assert not stats_errors, stats_errors
        assert all(r is not None for r in results)
        st = batching.stats()
        assert st["images_served"] == 16
        assert st["batches_served"] == sum(
            st["batch_size_histogram_recent"].values())
    finally:
        stop.set()
        batching.stop()


def test_submit_timeout_raises(service):
    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    batching = BatchingDetectionService(service, max_batch=8,
                                        max_wait_ms=10_000.0)
    try:
        with pytest.raises(TimeoutError):
            batching.submit(np.zeros((64, 64, 3), np.uint8), timeout=0.2)
    finally:
        batching.stop()


def test_stopped_batcher_rejects_submits(service):
    from vision_transformer_detector_tpu.serving import (
        BatchingDetectionService)

    batching = BatchingDetectionService(service)
    batching.stop()
    with pytest.raises(RuntimeError):
        batching.submit(np.zeros((64, 64, 3), np.uint8))


def test_http_request_timeout_returns_503(service):
    from PIL import Image

    server = DetectionServer(service, port=0, batching=True, max_batch=8,
                             max_wait_ms=10_000.0, request_timeout=0.2)
    server.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=buf.getvalue())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 503
    finally:
        server.stop()


def test_exported_detection_service_matches_live(tmp_path, service):
    """Serving a StableHLO artifact (cli serve --from-export): same
    detections as the live-model service, through the full HTTP path."""
    from PIL import Image

    from vision_transformer_detector_tpu.export import save_exported
    from vision_transformer_detector_tpu.models.vit_detector import (
        init_params)
    from vision_transformer_detector_tpu.serving import (
        ExportedDetectionService)

    params = init_params(jax.random.PRNGKey(0), CFG)
    artifact = str(tmp_path / "artifact")
    save_exported(artifact, params, CFG, batch_size=[1, 2])

    exported = ExportedDetectionService(artifact, score_threshold=-1.0)
    assert exported.config == CFG
    assert exported.max_batch_size == 2

    images = np.random.default_rng(5).integers(
        0, 255, (2, 64, 64, 3), np.uint8)
    live = service.detect_array(images)
    frozen = exported.detect_array(images)
    assert len(frozen) == len(live) == 2
    for a, b in zip(frozen, live):
        assert len(a) == len(b)
        for da, db in zip(a, b):
            assert da["class_id"] == db["class_id"]
            assert da["score"] == pytest.approx(db["score"], abs=1e-3)

    server = DetectionServer(exported, port=0, batching=True, max_batch=2,
                             max_wait_ms=20.0)
    server.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(np.zeros((48, 40, 3), np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=120) as r:
            result = json.loads(r.read())
        assert "detections" in result
        assert result["image_size"] == {"height": 48, "width": 40}
    finally:
        server.stop()


@pytest.mark.slow
def test_cli_serve_graceful_sigterm(tmp_path):
    """cli serve end-to-end in a subprocess: answers requests, then
    SIGTERM triggers a graceful stop (drain + exit 0)."""
    import signal
    import subprocess
    import sys
    import time

    from PIL import Image

    # Force the CPU platform: this environment's sitecustomize registers
    # the tunneled 'axon' TPU as the default (and overrides jax_platforms
    # itself, so JAX_PLATFORMS=cpu alone is not enough) — without the
    # override the subprocess serves from the real chip: slow, and an
    # unbounded HANG (blocked readline below) whenever the tunnel is
    # down. Dropping PALLAS_AXON_POOL_IPS disables the registration.
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vision_transformer_detector_tpu.cli",
         "serve", "--preset", "tiny_96", "--port", "0",
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--max-batch", "2", "--batch-window-ms", "5"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo", env=env)
    try:
        line = proc.stdout.readline()           # blocks until ready
        port = int(json.loads(line)["serving"].rsplit(":", 1)[1])
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=60) as r:
            assert json.loads(r.read()) == {"ok": True}
        buf = io.BytesIO()
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(f"{base}/predict",
                                     data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            assert "detections" in json.loads(r.read())

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0
        assert '"stopping": true' in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_server_clamps_max_batch_to_export_bundle(tmp_path):
    """A bundle whose largest graph is smaller than --max-batch must not
    break warm-up or batched requests (code-review round-3 finding):
    the server clamps the batcher to the bundle's capacity."""
    from vision_transformer_detector_tpu.export import save_exported
    from vision_transformer_detector_tpu.models.vit_detector import (
        init_params)
    from vision_transformer_detector_tpu.serving import (
        ExportedDetectionService)

    params = init_params(jax.random.PRNGKey(0), CFG)
    artifact = str(tmp_path / "small_bundle")
    save_exported(artifact, params, CFG, batch_size=[1, 2])
    service = ExportedDetectionService(artifact, score_threshold=-1.0)

    server = DetectionServer(service, port=0, batching=True, max_batch=8,
                             max_wait_ms=5.0)   # warmup would raise unclamped
    try:
        assert server.batcher.max_batch == 2
        images = np.zeros((3, 64, 64, 3), np.uint8)
        # 3 concurrent submits -> batches of <=2, all served.
        import threading
        results = [None] * 3

        def run(i):
            results[i] = server.batcher.submit(images[i])
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results)
    finally:
        server.stop()

def test_exported_service_with_baked_postprocess(tmp_path, service):
    """An artifact exported with --bake-postprocess carries NMS/top-k in
    the frozen graph: ExportedDetectionService uses the baked spec (and
    warns when serve-time knobs disagree) and still matches the live
    service's detections."""
    from vision_transformer_detector_tpu.export import save_exported
    from vision_transformer_detector_tpu.models.vit_detector import (
        init_params)
    from vision_transformer_detector_tpu.serving import (
        ExportedDetectionService)

    params = init_params(jax.random.PRNGKey(0), CFG)
    artifact = str(tmp_path / "baked_artifact")
    save_exported(artifact, params, CFG, batch_size=[1, 2],
                  postprocess={"score_threshold": -1.0})

    exported = ExportedDetectionService(artifact, score_threshold=-1.0)
    images = np.random.default_rng(5).integers(
        0, 255, (2, 64, 64, 3), np.uint8)
    live = service.detect_array(images)
    frozen = exported.detect_array(images)
    assert len(frozen) == len(live) == 2
    for a, b in zip(frozen, live):
        assert len(a) == len(b)
        for da, db in zip(a, b):
            assert da["class_id"] == db["class_id"]
            assert da["score"] == pytest.approx(db["score"], abs=1e-3)

    # Odd request size exercises the tuple-leaf padding slice.
    one = exported.detect_array(images[:1])
    assert len(one) == 1 and len(one[0]) == len(live[0])

    # Conflicting serve-time knobs: baked spec wins, with a warning.
    import warnings
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ExportedDetectionService(artifact, k=3, score_threshold=0.5)
    assert any("baked postprocess" in str(w.message) for w in caught)


def test_stats_endpoint(service):
    """GET /stats: outcome counters, latency percentiles, batcher shape."""
    from PIL import Image

    server = DetectionServer(service, port=0, batching=True, max_batch=4,
                             warmup=False)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        arr = np.zeros((32, 32, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        for _ in range(3):
            req = urllib.request.Request(f"{base}/predict",
                                         data=buf.getvalue())
            with urllib.request.urlopen(req, timeout=60):
                pass
        # One bad payload -> counted, excluded from latency window.
        req = urllib.request.Request(f"{base}/predict", data=b"junk")
        try:
            urllib.request.urlopen(req, timeout=30)
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"]["ok"] == 3
        assert stats["requests"]["bad_request"] == 1
        assert stats["requests"]["total"] == 4
        assert stats["uptime_s"] > 0
        lat = stats["latency_ms_recent"]
        assert lat["count"] == 3
        assert lat["p50"] <= lat["p99"] <= lat["max"]
        batching = stats["batching"]
        assert batching["images_served"] == 3
        assert batching["batches_served"] >= 1
        assert sum(batching["batch_size_histogram_recent"].values()) \
            == batching["batches_served"]
    finally:
        server.stop()


def test_stats_without_batching(service):
    server = DetectionServer(service, port=0, batching=False)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["batching"] is None
        assert stats["requests"]["total"] == 0
    finally:
        server.stop()


def test_body_size_limit_and_inflight_cap(service):
    import http.client

    server = DetectionServer(service, port=0, warmup=False,
                             max_body_bytes=1024, max_inflight=0)
    server.start()
    try:
        # Oversized Content-Length is rejected before the body is read.
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        conn.request("POST", "/predict", body=b"x" * 2048,
                     headers={"Content-Type": "image/jpeg"})
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
        conn.close()

        # max_inflight=0: every prediction is shed with 429.
        req = urllib.request.Request(f"http://127.0.0.1:{server.port}"
                                     "/predict", data=b"tiny")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 429"
        except urllib.error.HTTPError as e:
            assert e.code == 429

        # Malformed Content-Length is a 400, not an unhandled handler
        # exception (which would drop the connection with no response).
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()

        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"]["too_large"] == 1
        assert stats["requests"]["overloaded"] == 1
        assert stats["requests"]["bad_request"] == 1
    finally:
        server.stop()


def test_letterbox_jpeg_delegates_to_shared_core(service):
    """serving ingest and the training pipeline must produce the SAME
    canvas for the same bytes (serving.letterbox_jpeg delegates to
    data/pipeline.py:letterbox_image_bytes), and fast_decode must keep
    geometry/original dims exact."""
    from PIL import Image

    from vision_transformer_detector_tpu.data.pipeline import (
        letterbox_image_bytes)

    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([yy * 255 // h, xx * 255 // w,
                    ((yy + xx) * 255) // (h + w)], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    data = buf.getvalue()

    canvas, original = service.letterbox_jpeg(data)
    ref_canvas, ref_original = letterbox_image_bytes(data, CFG.image_size)
    assert original == ref_original == (480, 640)
    assert np.array_equal(canvas, ref_canvas)

    service.fast_decode = True
    try:
        fast_canvas, fast_original = service.letterbox_jpeg(data)
    finally:
        service.fast_decode = False
    assert fast_original == (480, 640)
    assert fast_canvas.shape == canvas.shape
    assert np.abs(fast_canvas.astype(int) - canvas.astype(int)).max() <= 24


def test_server_fault_returns_500_not_400(service):
    """Device/runtime faults are 5xx; only undecodable payloads are 400
    (round-4 review: a tunnel flap used to 400 every request, so clients
    never retried and /stats blamed the outage on bad client traffic)."""
    from PIL import Image

    class _Broken:
        def __getattr__(self, name):
            return getattr(service, name)

        def detect_jpeg(self, data):
            raise RuntimeError("device unavailable")

    server = DetectionServer(_Broken(), port=0, warmup=False)
    server.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict", data=buf.getvalue())
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert json.loads(e.read())["error"] == "device unavailable"
        stats = server.stats()["requests"]
        assert stats["server_error"] == 1
        assert stats["bad_request"] == 0
    finally:
        server.stop()


def test_direct_mode_warmup_compiles_batch_one(service):
    """warmup=True must warm the DIRECT (default) path too: it was
    accepted and silently ignored unless batching was on, so the first
    live request paid the full jit compile."""
    calls = []

    class _Spy:
        def __getattr__(self, name):
            return getattr(service, name)

        def predict_raw(self, images):
            calls.append((images.shape, images.dtype))
            return service.predict_raw(images)

    server = DetectionServer(_Spy(), port=0, warmup=True)
    try:
        assert calls == [((1, 64, 64, 3), np.dtype(np.uint8))]
    finally:
        server.stop()


def test_exported_service_sends_uint8_to_artifact(tmp_path):
    """The exported-artifact service must NOT normalize uint8 on the
    host: ExportedDetector converts on device (export.py __call__), and
    the old numpy float32 conversion quadrupled the host->device bytes
    on the exact link serving identifies as its bottleneck."""
    from vision_transformer_detector_tpu.export import save_exported
    from vision_transformer_detector_tpu.models.vit_detector import (
        init_params)
    from vision_transformer_detector_tpu.serving import (
        ExportedDetectionService)

    params = init_params(jax.random.PRNGKey(0), CFG)
    artifact = str(tmp_path / "artifact")
    save_exported(artifact, params, CFG, batch_size=1)
    exported = ExportedDetectionService(artifact, score_threshold=-1.0)

    inner = exported._exported
    seen = []

    class _Recorder:
        def __call__(self, images):
            seen.append(np.asarray(images).dtype)
            return inner(images)

        def __getattr__(self, name):
            return getattr(inner, name)

    exported._exported = _Recorder()
    results = exported.detect_array(np.zeros((1, 64, 64, 3), np.uint8))
    assert seen == [np.dtype(np.uint8)]
    assert len(results) == 1
