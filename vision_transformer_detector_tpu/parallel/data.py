"""Multi-host SPMD data feeding.

Each host loads its shard of the input files (data.pipeline
CocoDetectionDataset with shard_index=jax.process_index()) and assembles
its process-local batch; these helpers lift local batches into global
jax.Arrays laid out over the mesh so the jitted train step sees one global
batch (SURVEY.md §5 distributed-communication row).

Single-host is the degenerate case (process_count == 1): the helpers then
reduce to a plain device_put, which is what the tests exercise.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import jax
import numpy as np

from .mesh import batch_sharding


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> None:
    """Multi-host bring-up: jax.distributed.initialize with explicit args
    or TPU-pod auto-detection. Call once per process before device use."""
    if coordinator_address is None and (num_processes is not None
                                        or process_id is not None):
        raise ValueError(
            "num_processes/process_id were given without "
            "coordinator_address; partial explicit configuration would "
            "be silently ignored and auto-detection could pick a "
            "different topology")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_batch_from_local(mesh, local_batch: np.ndarray) -> jax.Array:
    """Assemble a global array from this process's local batch shard.

    The global batch size is ``local * process_count``; the leading axis is
    sharded over the 'data' mesh axis. On one process this is just a
    sharded device_put.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def global_batches(mesh, local_iterator: Iterable
                   ) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Wrap a per-host (images, labels) iterator into global arrays."""
    for images, labels in local_iterator:
        yield (global_batch_from_local(mesh, np.asarray(images)),
               global_batch_from_local(mesh, np.asarray(labels)))
