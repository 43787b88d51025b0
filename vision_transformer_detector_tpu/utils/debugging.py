"""Numeric sanitizers and parameter watchdogs.

JAX-native equivalents of the reference's NaN tooling family
(SURVEY.md §5 race-detection/sanitizers):
  * ``check_inf_nan`` (vision_transformer_detector.py:46-116) ->
    host-side tensor scan + jit-safe ``jax.debug`` variant,
  * ``CheckModelWeight`` / ``check_weights`` (vtd.py:650-758) ->
    ``param_extrema`` / ``check_params`` over the parameter pytree.

For hard NaN debugging JAX also offers ``jax.config.update('jax_debug_nans',
True)`` and ``jax.experimental.checkify``; these helpers cover the cheap
always-on monitoring path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RED_LINE_WEIGHT = 500.0  # check_weights alert threshold (vtd.py:735)


def check_inf_nan(inputs, name: str, max_value: float = 50_000.0,
                  replace_nan=None):
    """Host-side inf/NaN scan with optional NaN replacement (vtd.py:46-116).

    Returns possibly-replaced inputs. Works on arrays or tuples of arrays.
    """
    if isinstance(inputs, tuple):
        return tuple(
            check_inf_nan(x, f"{name}_{i}", max_value, replace_nan)
            for i, x in enumerate(inputs))
    if isinstance(inputs, (int, float)):
        return inputs
    x = np.asarray(inputs)
    if np.isinf(x).any():
        print(f"\nInf! Found in {name}, its shape: {x.shape}")
    nan_mask = np.isnan(x)
    if nan_mask.any():
        print(f"\nNaN! Found in {name}, its shape: {x.shape}")
        if replace_nan is not None:
            x = np.where(nan_mask, replace_nan, x)
            inputs = x
    finite = x[np.isfinite(x)]
    if finite.size and finite.max() > max_value:
        print(f"\nIn {name}, its shape: {x.shape}")
        print(f"max_value: {finite.max()}")
    return inputs


def debug_check(x: jnp.ndarray, name: str) -> jnp.ndarray:
    """Jit-safe inf/NaN reporter: prints from inside compiled code via
    jax.debug.print ONLY when something non-finite shows up (an
    unconditional print would spam every train step)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print("non-finite values in " + name),
        lambda: None)
    return x


def param_extrema(params: Any) -> Tuple[float, float]:
    """(min, max) over the whole parameter pytree (CheckModelWeight core,
    vtd.py:670-687)."""
    leaves = jax.tree_util.tree_leaves(params)
    maxima = max(float(jnp.max(leaf)) for leaf in leaves)
    minima = min(float(jnp.min(leaf)) for leaf in leaves)
    return minima, maxima


def check_params(params: Any,
                 red_line: float = RED_LINE_WEIGHT) -> Dict[str, float]:
    """Post-training weight check (check_weights, vtd.py:731-758)."""
    minima, maxima = param_extrema(params)
    report = {"min_weight": minima, "max_weight": maxima}
    if maxima > red_line:
        print(f"\nAlert! max_weight is: {maxima:.1f}\n"
              "Very high weight could lead to a big model output value, "
              "then cause the NaN loss. Please consider:\n"
              "1. use a smaller learning_rate;\n2. reduce the loss value.\n")
    return report


def param_norms(params: Any) -> Dict[str, float]:
    """Per-leaf L2 norms keyed by path — the metrics-hook form of the
    watchdog (SURVEY.md §2.1 M18)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    norms = {}
    for key_path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        norms[name] = float(jnp.linalg.norm(leaf.astype(jnp.float32)))
    return norms
