"""Headless prediction/label visualisation.

File-output renderer replacing the reference's interactive cv2 windows
(vision_transformer_detector.py:2187-2456): draws thresholded detections
(box + class name + optional confidence) onto the denormalised images with
PIL and writes PNGs. Threshold semantics match visualize_predictions
(vtd.py:2257-2340): objectness AND class confidence both above threshold.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..config import DetectorConfig
from ..data.categories import MODEL_ID_TO_NAME
from ..metrics.mean_average_precision import _class_confidence, _decode_np

_PALETTE = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 212), (0, 128, 128), (220, 190, 255),
]


def denormalize_image(image: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8 (vtd.py:2224-2230)."""
    if image.dtype == np.uint8:
        return image
    return np.clip((image + 1.0) * 127.5, 0, 255).astype(np.uint8)


def draw_detections(image: np.ndarray,
                    detections: np.ndarray,
                    objectness_threshold: float = 0.5,
                    classification_threshold: float = 0.5,
                    show_confidence: bool = True,
                    decoded: bool = True,
                    config: DetectorConfig = DetectorConfig()) -> np.ndarray:
    """Draw one image's detections. ``detections`` is ``(max_objects, 6)``
    decoded (or raw when ``decoded=False``)."""
    from PIL import Image, ImageDraw

    if not decoded:
        detections = _decode_np(detections[None], config)[0]

    pil = Image.fromarray(denormalize_image(image))
    draw = ImageDraw.Draw(pil)
    for row in np.asarray(detections, np.float32):
        objectness, classification = row[0], row[1]
        confidence = float(_class_confidence(np.float32(classification)))
        if objectness <= objectness_threshold:
            continue
        if confidence <= classification_threshold:
            continue
        class_id = int(round(float(classification)))
        cx, cy, h, w = row[2], row[3], row[4], row[5]
        box = (cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2)
        color = _PALETTE[class_id % len(_PALETTE)]
        draw.rectangle(box, outline=color, width=2)
        name = MODEL_ID_TO_NAME.get(class_id, str(class_id))
        text = f"{name} {confidence:.2f}" if show_confidence else name
        draw.text((box[0] + 2, max(0.0, box[1] - 12)), text, fill=color)
    return np.asarray(pil)


def draw_labels(image: np.ndarray, labels: np.ndarray,
                config: DetectorConfig = DetectorConfig()) -> np.ndarray:
    """Label-mode rendering (vtd.py:2363-2456 dataset-input path): draw the
    ground-truth boxes (objectness==1 slots)."""
    rows = np.asarray(labels, np.float32).copy()
    # Make labels look like decoded predictions with full confidence.
    rows = rows[np.isclose(rows[:, 0], 1.0)]
    return draw_detections(image, rows, objectness_threshold=0.0,
                           classification_threshold=0.0,
                           show_confidence=False, config=config)


def visualize_predictions(images: np.ndarray,
                          predictions: np.ndarray,
                          output_dir: str,
                          objectness_threshold: float = 0.5,
                          classification_threshold: float = 0.5,
                          show_confidence: bool = True,
                          decoded: bool = False,
                          config: DetectorConfig = DetectorConfig(),
                          prefix: str = "prediction",
                          start_index: int = 0) -> Sequence[str]:
    """Batch renderer -> PNG files; returns the written paths.

    ``predictions`` raw (default, like model.predict feeding
    visualize_predictions at vtd.py:2447) or already decoded.
    """
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    if not decoded:
        predictions = _decode_np(np.asarray(predictions), config)
    paths = []
    for i, (image, dets) in enumerate(zip(np.asarray(images), predictions)):
        rendered = draw_detections(
            image, dets, objectness_threshold, classification_threshold,
            show_confidence, decoded=True, config=config)
        path = os.path.join(output_dir,
                            f"{prefix}_{start_index + i:04d}.png")
        Image.fromarray(rendered).save(path)
        paths.append(path)
    return paths
