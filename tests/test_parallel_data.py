"""Multi-host data feeding helpers (single-process degenerate case)."""

import numpy as np

from vision_transformer_detector_tpu.parallel.data import (
    global_batch_from_local, global_batches)
from vision_transformer_detector_tpu.parallel.mesh import (
    DATA_AXIS, create_mesh)


def test_global_batch_from_local():
    mesh = create_mesh(data=8, model=1)
    local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = global_batch_from_local(mesh, local)
    assert arr.shape == (8, 4)
    assert arr.sharding.spec[0] == DATA_AXIS
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_global_batches_iterator():
    mesh = create_mesh(data=4, model=2)
    stream = [(np.zeros((8, 2, 2, 3), np.float32),
               np.zeros((8, 17, 6), np.float32))] * 2
    batches = list(global_batches(mesh, stream))
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.sharding.spec[0] == DATA_AXIS
    assert labels.shape == (8, 17, 6)
