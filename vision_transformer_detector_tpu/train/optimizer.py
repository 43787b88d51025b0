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
                     steps_per_epoch: int = 1,
                     every_k: int = 1) -> optax.Schedule:
    """Piecewise-constant schedule with the reference's cumulative
    boundaries (vtd.py:716-719), honouring allowed_decay_times
    (vtd.py:690-693).

    ``every_k``: micro-batches per optimizer step (gradient
    accumulation). optax.MultiSteps advances the inner schedule's count
    once per k micro-batches, so epoch boundaries must be expressed in
    OPTIMIZER steps — without the division the decays fired k× too many
    epochs late.

    Zero-length decay intervals follow the reference exactly
    (vtd.py:716-721 is one `or` over the three cumulative sums, with
    the budget decremented once per MATCHING EPOCH): coincident
    boundaries decay once at that epoch, and the unconsumed budget
    unit carries to the next DISTINCT boundary. Hence dedup first,
    then truncate to allowed_decay_times. Two distinct epochs that
    quantize onto the same optimizer step (tiny steps_per_epoch,
    large every_k) do compound — they are separate reference decays."""
    epochs = [config.epochs_first_lr_decay]
    epochs.append(epochs[-1] + config.epochs_second_lr_decay)
    epochs.append(epochs[-1] + config.epochs_third_lr_decay)
    epochs = sorted(set(epochs))[: max(0, config.allowed_decay_times)]
    boundaries: dict = {}
    for e in epochs:
        step = (e * steps_per_epoch) // max(1, every_k)
        boundaries[step] = boundaries.get(step, 1.0) * config.rate_lr_decay
    return optax.piecewise_constant_schedule(
        init_value=config.learning_rate,
        boundaries_and_scales=boundaries)


def _mix_u32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer (same mixer as the dropout mask hash)."""
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def _stochastic_round_bf16(x32: jnp.ndarray,
                           bits: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> bf16 stochastic rounding: add random low-16 mantissa bits,
    truncate. Unbiased, so sub-ulp updates accumulate in expectation
    instead of being absorbed by round-to-nearest."""
    u = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    u = u + (bits & jnp.uint32(0xFFFF))
    u = u & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(
        jnp.bfloat16)


def scale_by_adam_compact(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-7,
                          mu_dtype=jnp.bfloat16,
                          nu_dtype=jnp.bfloat16,
                          stochastic_rounding: bool = True
                          ) -> optax.GradientTransformation:
    """Adam whose moment STATE is stored in reduced precision.

    All arithmetic runs in fp32 (moments are upcast on read, rounded on
    write), so only the round-to-storage differs from optax.adam — the
    state reads/writes that dominate the optimizer's HBM traffic are
    halved. Master params remain fp32 in the update chain.

    The second moment needs more than plain rounding: its per-step
    change is ``(1-b2) = 0.1%``, below bf16's ~0.4% ulp, so
    round-to-nearest ABSORBS the update and nu freezes at a stale value
    whenever the gradient scale shifts by less than ~4x per step. bf16
    nu writes therefore use counter-based stochastic rounding (unbiased;
    deterministic given the step count, so replays/restores agree). The
    first moment's per-step change is ``(1-b1) = 10%`` — far above ulp —
    and keeps low-variance round-to-nearest.
    """
    sr_nu = (stochastic_rounding
             and jnp.dtype(nu_dtype) == jnp.dtype(jnp.bfloat16))

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

        if sr_nu:
            count_u = count.astype(jnp.uint32)
            flat, treedef = jax.tree_util.tree_flatten(nu32)
            rounded = []
            for i, leaf in enumerate(flat):
                idx = jnp.arange(leaf.size, dtype=jnp.uint32).reshape(
                    leaf.shape)
                bits = _mix_u32(count_u * jnp.uint32(0x9E3779B1)
                                + jnp.uint32((i * 0x85EBCA6B)
                                             & 0xFFFFFFFF)
                                + idx * jnp.uint32(0xC2B2AE35))
                rounded.append(_stochastic_round_bf16(leaf, bits))
            nu_state = jax.tree_util.tree_unflatten(treedef, rounded)
        else:
            nu_state = jax.tree_util.tree_map(
                lambda v: v.astype(nu_dtype), nu32)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(
                lambda m: m.astype(mu_dtype), mu32),
            nu=nu_state)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: TrainConfig,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Gradient clip-by-value then Adam, like keras Adam(clipvalue)."""
    schedule = make_lr_schedule(config, steps_per_epoch,
                                every_k=config.accumulate_steps)
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
