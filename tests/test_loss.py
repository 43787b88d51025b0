"""Loss oracles from the reference test suite
(testcases_vision_transformer_detector.py:738-926) plus masked-shape
regression checks that the reference cannot express (zero positives under
jit, gradient finiteness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformer_detector_tpu.config import DetectorConfig, LossConfig
from vision_transformer_detector_tpu.ops.loss import detection_loss

CONFIG = DetectorConfig()
SHAPE = (10, 6)


def make_labels() -> np.ndarray:
    """Two images, one positive box (testcases:766-781)."""
    y_true = np.ones((2, *SHAPE), np.float32) * -8.0
    y_true[..., 0] = 0.0
    y_true[0, 0] = (1, 79, 9, 9, 10, 10)
    return y_true


def loss_value(y_true, y_pred) -> float:
    return float(detection_loss(
        jnp.asarray(y_true), jnp.asarray(y_pred), CONFIG,
        use_transform_predictions=False))


def test_zero_loss():
    """Identical label/prediction -> loss 0 (testcases:760-797)."""
    y_true = make_labels()
    assert loss_value(y_true, y_true.copy()) == pytest.approx(0.0, abs=1e-5)


def test_objectness_loss():
    """Perturbed objectness -> loss > 0 (testcases:799-840)."""
    y_true = make_labels()
    y_pred = y_true.copy()
    y_pred[0, 0, 0] = 0.98
    assert loss_value(y_true, y_pred) > 0.0


def test_classification_loss():
    """Perturbed class float -> loss > 0 (testcases:842-883)."""
    y_true = make_labels()
    y_pred = y_true.copy()
    y_pred[0, 0, 1] = 79.2
    assert loss_value(y_true, y_pred) > 0.0


def test_ciou_loss():
    """Perturbed box -> loss > 0 (testcases:885-926)."""
    y_true = make_labels()
    y_pred = y_true.copy()
    y_pred[0, 0, -4:] = (9, 9, 9.8, 9.8)
    assert loss_value(y_true, y_pred) > 0.0


def test_zero_positives_no_nan():
    """With no positive slots the class/CIoU terms must be exactly 0
    (vtd.py:1249-1251) and the loss finite, even under jit."""
    y_true = np.ones((2, *SHAPE), np.float32) * -8.0
    y_true[..., 0] = 0.0
    y_pred = np.zeros((2, *SHAPE), np.float32)  # raw logits
    loss = jax.jit(
        lambda t, p: detection_loss(t, p, CONFIG)
    )(jnp.asarray(y_true), jnp.asarray(y_pred))
    assert np.isfinite(float(loss))


def test_gradients_finite():
    """Gradients through decode + masked terms stay finite."""
    y_true = jnp.asarray(make_labels())
    y_pred = jnp.zeros((2, *SHAPE), jnp.float32)

    grads = jax.grad(
        lambda p: detection_loss(y_true, p, CONFIG))(y_pred)
    assert bool(jnp.all(jnp.isfinite(grads)))


def test_loss_weights_scale_terms():
    """Class and CIoU weights scale their terms linearly."""
    y_true = make_labels()
    y_pred = y_true.copy()
    y_pred[0, 0, 1] = 79.2

    base = LossConfig(weight_classification=1.0, weight_ciou=0.0)
    double = LossConfig(weight_classification=2.0, weight_ciou=0.0)
    l1 = float(detection_loss(y_true, y_pred, CONFIG, base,
                              use_transform_predictions=False))
    l2 = float(detection_loss(y_true, y_pred, CONFIG, double,
                              use_transform_predictions=False))
    assert l2 == pytest.approx(2 * l1, rel=1e-6)


def test_classification_grad_finite_for_fractional_exponent():
    """exponent < 1 (a public LossConfig knob): masked lanes must not
    produce NaN gradients (round-3 review: the mask folded inside the
    power gave d/dx x^0.5 = inf at the masked zeros)."""
    import dataclasses

    import jax

    cfg = DetectorConfig(image_size=(34, 34), embedding_dim=8,
                         num_heads=2, key_dim=4, encoder_blocks=1,
                         encoder_mlp_layers=2, head_last_units=8,
                         head_layers=1)
    loss_cfg = dataclasses.replace(LossConfig(), exponent=0.5)
    y_true = np.full((2, cfg.max_objects, 6), -8.0, np.float32)
    y_true[..., 0] = 0.0
    y_true[0, 0] = (1, 5, 17.0, 17.0, 8.0, 8.0)   # one positive, many negative
    y_pred = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, y_true.shape), jnp.float32)

    grads = jax.grad(lambda p: detection_loss(
        jnp.asarray(y_true), p, cfg, loss_cfg))(y_pred)
    assert np.all(np.isfinite(np.asarray(grads)))
