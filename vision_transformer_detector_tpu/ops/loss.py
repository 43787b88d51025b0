"""Composite detection loss: focal-BCE objectness + exponential
classification regression + CIoU box loss.

Reimplements ``my_custom_loss`` (vision_transformer_detector.py:1122-1265)
with XLA-friendly static shapes: the reference boolean-masks the positive
slots (vtd.py:1198-1240), which produces dynamic shapes; here every term is
a masked reduction over the full ``(B, max_objects)`` grid with identical
semantics, including the zero-positives guard (vtd.py:1249-1251).

All reductions are float32 (fp16/bf16 hazards documented at vtd.py:53-55).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DetectorConfig, LossConfig
from .decode import transform_predictions
from .geometry import ciou

# Keras clips probabilities to [eps, 1-eps] with backend epsilon 1e-7 before
# the log; we reproduce that so loss values are bit-comparable.
_KERAS_EPSILON = 1e-7


def binary_focal_crossentropy(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                              gamma: float = 2.0) -> jnp.ndarray:
    """Per-element focal BCE matching keras.losses.BinaryFocalCrossentropy
    (from_logits=False, label_smoothing=0; used at vtd.py:1168-1173).

    ``loss = (1 - p_t)^gamma * BCE`` with ``p_t = y*p + (1-y)*(1-p)``.
    """
    p = jnp.clip(jnp.asarray(y_pred, jnp.float32),
                 _KERAS_EPSILON, 1.0 - _KERAS_EPSILON)
    y = jnp.asarray(y_true, jnp.float32)
    bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))
    p_t = y * p + (1.0 - y) * (1.0 - p)
    return jnp.power(1.0 - p_t, gamma) * bce


def binary_crossentropy(y_true: jnp.ndarray,
                        y_pred: jnp.ndarray) -> jnp.ndarray:
    """Plain per-element BCE (keras.losses.BinaryCrossentropy path,
    vtd.py:1175-1178)."""
    p = jnp.clip(jnp.asarray(y_pred, jnp.float32),
                 _KERAS_EPSILON, 1.0 - _KERAS_EPSILON)
    y = jnp.asarray(y_true, jnp.float32)
    return -(y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p))


def detection_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                   config: DetectorConfig,
                   loss_config: LossConfig = LossConfig(),
                   use_transform_predictions: bool = True) -> jnp.ndarray:
    """Total loss for a batch (scalar), matching vtd.py:1122-1265.

    Args:
      y_true: ``(B, max_objects, 6)`` labels; slot layout documented at
        vtd.py:1136-1146 (objectness, class id or -8, cx, cy, h, w or -8).
      y_pred: ``(B, max_objects, 6)`` raw logits (decoded internally when
        ``use_transform_predictions``) or already-decoded predictions (the
        test seam, vtd.py:1155-1156).
    """
    y_true = jnp.asarray(y_true, jnp.float32)
    if use_transform_predictions:
        y_pred = transform_predictions(y_pred, config)
    else:
        y_pred = jnp.asarray(y_pred, jnp.float32)

    # --- objectness term over every slot (vtd.py:1180-1192) ---------------
    if loss_config.focal_binary_loss:
        loss_objectness = binary_focal_crossentropy(
            y_true[..., 0], y_pred[..., 0], gamma=loss_config.focal_gamma)
    else:
        loss_objectness = binary_crossentropy(y_true[..., 0], y_pred[..., 0])
    loss_objectness_mean = jnp.mean(loss_objectness)

    # --- positive-slot mask (vtd.py:1194-1205) -----------------------------
    # isclose(y_true[..., 0], 1.0): default numpy tolerances.
    object_mask = jnp.isclose(y_true[..., 0], 1.0).astype(jnp.float32)
    positives = jnp.sum(object_mask)
    safe_count = jnp.maximum(positives, 1.0)

    # --- classification term over positives (vtd.py:1209-1228) -------------
    # Masked lanes are substituted with a SAFE base (1.0) before the power
    # and zeroed after: power at 1.0 has a finite gradient for EVERY
    # exponent, and jnp.where's gradient only flows through the selected
    # branch. (Folding the mask inside the power instead made the backward
    # NaN for exponent < 1: d/dx x^e at x=0 is inf, and inf * the 0 chain
    # coefficient is NaN — round-3 review finding.)
    classification_error = jnp.abs(y_pred[..., 1] - y_true[..., 1])
    safe_base = jnp.where(object_mask > 0,
                          loss_config.coefficient * classification_error,
                          1.0)
    loss_classification = jnp.power(
        safe_base, loss_config.exponent) * object_mask
    loss_classification_mean = jnp.sum(loss_classification) / safe_count

    # --- CIoU term over positives (vtd.py:1230-1247) -----------------------
    # Negative slots carry -8 fill values (y_true) and arbitrary decoded
    # boxes (y_pred); substituting a fixed unit box for both BEFORE the CIoU
    # keeps every masked-out lane finite in forward AND backward (a NaN/inf
    # cotangent multiplied by a 0 mask would still poison the gradient).
    mask4 = object_mask[..., None]
    dummy = jnp.asarray([10.0, 10.0, 5.0, 5.0], jnp.float32)
    label_boxes = jnp.where(mask4 > 0, y_true[..., -4:], dummy)
    pred_boxes = jnp.where(mask4 > 0, y_pred[..., -4:], dummy)
    loss_ciou = ciou(label_boxes, pred_boxes)
    loss_ciou_mean = jnp.sum(loss_ciou * object_mask) / safe_count

    # Zero-positives guard (vtd.py:1249-1251).
    has_positives = positives > 0
    loss_classification_mean = jnp.where(
        has_positives, loss_classification_mean, 0.0)
    loss_ciou_mean = jnp.where(has_positives, loss_ciou_mean, 0.0)

    return (loss_objectness_mean
            + loss_classification_mean * loss_config.weight_classification
            + loss_ciou_mean * loss_config.weight_ciou)
