"""Serving endpoint tests: the fused predict program and the HTTP API."""

import io
import json
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
