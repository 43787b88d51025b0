"""Optimiser stack: Adam + gradient value clipping + step LR decay +
post-update weight constraint.

Reproduces the reference's training dynamics, which are load-bearing for
its NaN-free convergence (SURVEY.md §7 hard parts):
  * ``Adam(learning_rate, clipvalue=10)`` (ipynb cell 7) ->
    ``optax.chain(optax.clip(v), optax.adam(schedule))``,
  * ``learning_rate_step_decay`` (vision_transformer_detector.py:696-728):
    up to 3 step decays at cumulative epoch boundaries ->
    ``optax.piecewise_constant_schedule``,
  * ``ClipWeight`` constraint on every kernel/bias
    (vision_transformer_detector.py:209-236): NaN weights replaced with 1.0
    then clipped to ±max_weight, applied after each update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


def make_lr_schedule(config: TrainConfig,
                     steps_per_epoch: int = 1) -> optax.Schedule:
    """Piecewise-constant schedule with the reference's cumulative
    boundaries (vtd.py:716-719), honouring allowed_decay_times
    (vtd.py:690-693)."""
    epochs = [config.epochs_first_lr_decay]
    epochs.append(epochs[-1] + config.epochs_second_lr_decay)
    epochs.append(epochs[-1] + config.epochs_third_lr_decay)
    epochs = epochs[: max(0, config.allowed_decay_times)]
    boundaries = {e * steps_per_epoch: config.rate_lr_decay for e in epochs}
    return optax.piecewise_constant_schedule(
        init_value=config.learning_rate,
        boundaries_and_scales=boundaries)


def make_optimizer(config: TrainConfig,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Gradient clip-by-value then Adam, like keras Adam(clipvalue)."""
    schedule = make_lr_schedule(config, steps_per_epoch)
    optimizer = optax.chain(
        optax.clip(config.clip_gradient_value),
        # keras Adam default epsilon is 1e-7 (optax's is 1e-8); matched so
        # the reference's training dynamics carry over for loss-curve
        # overlays.
        optax.adam(schedule, eps=1e-7),
    )
    if config.accumulate_steps > 1:
        # Average grads over k micro-batches per real update; the inner
        # optimizer (and its LR schedule) steps once per accumulated
        # update, so k micro-steps == one big-batch step exactly.
        optimizer = optax.MultiSteps(
            optimizer, every_k_schedule=config.accumulate_steps)
    return optimizer


def clip_weights(params, max_weight: float):
    """ClipWeight applied to the whole parameter pytree (vtd.py:221-229):
    NaN -> 1.0, then clip to [-max_weight, max_weight]."""
    def _clip(w):
        w = jnp.where(jnp.isnan(w), jnp.ones_like(w), w)
        return jnp.clip(w, -max_weight, max_weight)
    return jax.tree_util.tree_map(_clip, params)
