"""Checkpointing: orbax-backed save/restore of the full train state.

Replaces the reference's Keras model.save dance (SaveModelHighestAP,
vision_transformer_detector.py:2142-2180), which could only persist weights
(the extract_patches layer breaks full-model save, vtd.py:180-183) and
never persisted optimizer state. Here the checkpoint is the whole pytree
{params, opt_state, step, best_ap}, so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _orbax():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree checkpoint at ``path`` (directory)."""
    path = os.path.abspath(path)
    ocp = _orbax()
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(path, tree, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint, shaped like ``template`` (an example
    pytree with the right structure/shapes/dtypes/shardings)."""
    path = os.path.abspath(path)
    ocp = _orbax()
    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(path, template)


class AsyncCheckpointManager:
    """Non-blocking checkpoint writes for long training runs.

    ``orbax.StandardCheckpointer`` is an AsyncCheckpointer: ``save``
    snapshots the device arrays and serialises them in a background
    thread, so the train loop only pays the host-copy cost instead of the
    full filesystem write (SURVEY.md §5 checkpoint/resume; the reference
    blocks training for every model.save, vtd.py:2145-2180). Call
    ``wait()`` (or close/exit the context) to join outstanding writes;
    a save to a path with a pending write waits for that write first.
    """

    def __init__(self):
        self._checkpointer = _orbax().StandardCheckpointer()

    def save(self, path: str, tree: Any) -> None:
        self._checkpointer.save(os.path.abspath(path), tree, force=True)

    def wait(self) -> None:
        self._checkpointer.wait_until_finished()

    def restore(self, path: str, template: Any) -> Any:
        self.wait()
        return self._checkpointer.restore(os.path.abspath(path), template)

    def close(self) -> None:
        self._checkpointer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Rolling step-stamped checkpoints + garbage collection (keep-last-k)
# ---------------------------------------------------------------------------
# Long runs save on a cadence; without GC the checkpoint dir grows without
# bound (each full train state is params + 2 Adam moments). The reference
# sidesteps this by overwriting a single "ongoing" file (vtd.py:2145-2146)
# at the price of keeping no history; here "ongoing"/"highest_ap" keep
# their reference semantics and step-stamped siblings provide bounded
# history.

_STEP_PREFIX = "step_"


def step_checkpoint_name(step: int) -> str:
    """Directory name for a step-stamped checkpoint (sortable)."""
    return f"{_STEP_PREFIX}{int(step):010d}"


def list_step_checkpoints(directory: str):
    """[(step, path)] of step-stamped checkpoints, ascending by step."""
    if not os.path.isdir(directory):
        return []
    out = []
    for entry in os.listdir(directory):
        if not entry.startswith(_STEP_PREFIX):
            continue
        try:
            step = int(entry[len(_STEP_PREFIX):])
        except ValueError:
            continue
        out.append((step, os.path.join(directory, entry)))
    return sorted(out)


def latest_checkpoint(directory: str):
    """Path of the newest step-stamped checkpoint, or None."""
    entries = list_step_checkpoints(directory)
    return entries[-1][1] if entries else None


def prune_checkpoints(directory: str, keep: int, pending_step=None):
    """Delete all but the newest ``keep`` step-stamped checkpoints.

    Only ``step_*`` directories are touched — named checkpoints
    (``highest_ap``, ``ongoing``) and ``config.json`` are never pruned.
    Returns the removed paths.

    ``pending_step``: a step whose checkpoint write is still in flight
    (async saves land via an atomic rename, so the directory is not
    listed yet). It counts toward the ``keep`` window — without this,
    every async save_rolling pruned against a list missing its own
    newest entry and retained keep+1 checkpoints.
    """
    import shutil

    if keep < 0:
        raise ValueError(f"keep must be >= 0, got {keep}")
    entries = list_step_checkpoints(directory)
    if pending_step is not None:
        pending = int(pending_step)
        listed = {step for step, _ in entries}
        if pending not in listed and keep and sorted(
                listed | {pending})[-keep:].count(pending):
            # The pending write occupies one of the keep slots; one
            # fewer materialized checkpoint survives.
            keep -= 1
    doomed = entries[:-keep] if keep else entries
    removed = []
    for _, path in doomed:
        shutil.rmtree(path, ignore_errors=True)
        # Input-position sidecar (Trainer._save_dataset_state) goes with
        # its checkpoint; orphaned sidecars would accumulate forever.
        sidecar = path + ".dataset.json"
        if os.path.exists(sidecar):
            os.remove(sidecar)
        removed.append(path)
    return removed


def save_params_npz(path: str, params: Any) -> None:
    """Portable flat .npz export of the parameter pytree (for the TF->JAX
    weight carry-over tooling and quick inspection)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for key_path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params_npz(path: str, template: Any) -> Any:
    """Inverse of save_params_npz against a template pytree."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        arr = np.asarray(data[name])
        assert arr.shape == leaf.shape, (
            f"{name}: checkpoint shape {arr.shape} != template {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
