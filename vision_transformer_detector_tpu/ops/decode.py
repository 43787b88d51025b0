"""Prediction decoding: raw head logits -> (confidence, class, box) tuples.

Mirrors ``transform_predictions`` (vision_transformer_detector.py:586-647).
The reference deliberately keeps the sigmoid OUTSIDE the model
(vision_transformer_detector.py:618-619): the loss and metric both receive
raw logits and decode internally, gated by a ``use_transform_predictions``
seam that the unit tests rely on (testcases:13-17). We keep that seam.

Everything here is pure jnp and fuses into the surrounding jit region, so
decode runs on-device with no host round-trip (BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import (CLASSIFICATION_CONFIDENCE_THRESHOLD, DetectorConfig,
                      OBJECTNESS_THRESHOLD)


def transform_predictions(inputs: jnp.ndarray,
                          config: DetectorConfig) -> jnp.ndarray:
    """Decode raw ``(B, max_objects, 6)`` logits into real-size predictions.

    Output layout (vtd.py:606-615):
      [0] objectness in [0, 1],
      [1] classification in [0, num_classes - 1],
      [2] center_x in [0, W], [3] center_y in [0, H],
      [4] height in [0, H],   [5] width in [0, W].
    """
    inputs = jax.nn.sigmoid(jnp.asarray(inputs, jnp.float32))

    # The clip is a belt-and-braces guard in the reference (vtd.py:621-625);
    # after a sigmoid it is a no-op but kept for exactness.
    ratio = jnp.clip(inputs[..., 2:], 0.0, 1.0)

    height, width = config.image_size
    confidence = inputs[..., 0:1]
    classification = inputs[..., 1:2] * (config.num_classes - 1)
    center_x = ratio[..., 0:1] * width
    center_y = ratio[..., 1:2] * height
    bbox_height = ratio[..., 2:3] * height
    bbox_width = ratio[..., 3:4] * width

    return jnp.concatenate(
        [confidence, classification, center_x, center_y,
         bbox_height, bbox_width], axis=-1)


def classification_confidence(classification: jnp.ndarray) -> jnp.ndarray:
    """Class confidence ``(0.5 - |v - round(v)|) / 0.5`` (vtd.py:1369-1376).

    The detector regresses a single float in [0, num_classes - 1]; the
    nearest integer is the predicted class and the distance to it measures
    confidence. A prediction more than 0.5 away would round to a different
    class, hence the 0.5 normalisation.
    """
    classification = jnp.asarray(classification, jnp.float32)
    error = jnp.abs(classification - jnp.round(classification))
    return (0.5 - error) / 0.5


def select_detections(
        decoded: jnp.ndarray,
        objectness_threshold: float = OBJECTNESS_THRESHOLD,
        confidence_threshold: float = CLASSIFICATION_CONFIDENCE_THRESHOLD):
    """On-device threshold filter with the METRIC's positivity semantics.

    Returns ``(keep_mask, class_id, class_confidence)`` for the decoded
    predictions; static shapes (a boolean mask, not a gather) so the whole
    postprocess stays inside one XLA program. Threshold semantics match the
    metric's positivity test (vtd.py:1378-1384): strictly greater than.
    The serving path instead ranks by combined score + NMS (ops/nms.py);
    use this when a result must agree with what the mAP metric counts as
    a positive prediction.
    """
    objectness = decoded[..., 0]
    classification = decoded[..., 1]
    confidence = classification_confidence(classification)
    keep = (objectness > objectness_threshold) & (
        confidence > confidence_threshold)
    class_id = jnp.round(classification).astype(jnp.int32)
    return keep, class_id, confidence
