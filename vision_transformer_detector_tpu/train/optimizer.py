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


def scale_by_adam_compact(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-7,
                          mu_dtype=jnp.bfloat16,
                          nu_dtype=jnp.bfloat16
                          ) -> optax.GradientTransformation:
    """Adam whose moment STATE is stored in reduced precision.

    All arithmetic runs in fp32 (moments are upcast on read, rounded on
    write), so only the round-to-storage differs from optax.adam — the
    state reads/writes that dominate the optimizer's HBM traffic are
    halved. Master params remain fp32 in the update chain.
    """
    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=mu_dtype), params),
            nu=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=nu_dtype), params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def _mu(m, g):
            g32 = g.astype(jnp.float32)
            return b1 * m.astype(jnp.float32) + (1.0 - b1) * g32

        def _nu(v, g):
            g32 = g.astype(jnp.float32)
            return b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32

        mu32 = jax.tree_util.tree_map(_mu, state.mu, grads)
        nu32 = jax.tree_util.tree_map(_nu, state.nu, grads)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(
                lambda m: m.astype(mu_dtype), mu32),
            nu=jax.tree_util.tree_map(
                lambda v: v.astype(nu_dtype), nu32))
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: TrainConfig,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Gradient clip-by-value then Adam, like keras Adam(clipvalue)."""
    schedule = make_lr_schedule(config, steps_per_epoch)
    mu_dtype = (jnp.dtype(config.adam_mu_dtype)
                if config.adam_mu_dtype else None)
    nu_dtype = (jnp.dtype(config.adam_nu_dtype)
                if config.adam_nu_dtype else None)
    if nu_dtype is not None:
        adam = optax.chain(
            scale_by_adam_compact(eps=1e-7,
                                  mu_dtype=mu_dtype or jnp.float32,
                                  nu_dtype=nu_dtype),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        # keras Adam default epsilon is 1e-7 (optax's is 1e-8); matched so
        # the reference's training dynamics carry over for loss-curve
        # overlays.
        adam = optax.adam(schedule, eps=1e-7, mu_dtype=mu_dtype)
    optimizer = optax.chain(
        optax.clip(config.clip_gradient_value),
        adam,
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
