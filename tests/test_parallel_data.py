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


def test_make_array_from_process_local_data_real_call():
    """Drive the actual multi-host assembly API with our batch sharding
    (single-process degenerate call: local data IS the global batch)."""
    import jax

    from vision_transformer_detector_tpu.parallel.mesh import batch_sharding

    mesh = create_mesh(data=8, model=1)
    local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = jax.make_array_from_process_local_data(batch_sharding(mesh), local)
    assert arr.shape == (8, 4)
    assert arr.sharding.spec[0] == DATA_AXIS
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_multi_host_branch_routing(monkeypatch):
    """With process_count > 1 global_batch_from_local must route through
    jax.make_array_from_process_local_data (round-1: this branch never
    executed in CI)."""
    import jax

    mesh = create_mesh(data=8, model=1)
    local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)

    real = jax.make_array_from_process_local_data
    calls = []

    def spy(sharding, local_data, **kw):
        calls.append(local_data.shape)
        # jax's internal process bookkeeping is untouched by the
        # monkeypatch below, so the real call still assembles correctly.
        return real(sharding, local_data, **kw)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    arr = global_batch_from_local(mesh, local)
    assert calls == [(8, 4)]
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_global_batch_feeds_train_step():
    """A multi-host-assembled batch drives one jitted train step on the
    (data x model) mesh end-to-end."""
    import jax
    import jax.numpy as jnp

    from vision_transformer_detector_tpu.config import (
        DetectorConfig, LossConfig, TrainConfig)
    from vision_transformer_detector_tpu.parallel.mesh import batch_sharding
    from vision_transformer_detector_tpu.train.trainer import Trainer

    mesh = create_mesh(data=4, model=2)
    cfg = DetectorConfig(
        image_size=(32, 32), patch_size=16, embedding_dim=8, num_heads=2,
        key_dim=4, encoder_blocks=1, encoder_mlp_layers=2,
        head_last_units=8, head_layers=1)
    trainer = Trainer(cfg, LossConfig(), TrainConfig(learning_rate=1e-3),
                      mesh=mesh)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    images = jax.make_array_from_process_local_data(
        batch_sharding(mesh),
        rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels_np = np.full((8, cfg.max_objects, 6), -8.0, np.float32)
    labels_np[..., 0] = 0.0
    labels_np[:, 0] = (1, 3, 16.0, 16.0, 10.0, 10.0)
    labels = jax.make_array_from_process_local_data(
        batch_sharding(mesh), labels_np)

    with mesh:
        state, loss = trainer.train_step(
            state, images, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_process_batch_indices_single_process():
    """One process owns every shard: the full range, on both pure-DP and
    DP x TP meshes (model columns replicate, data rows partition)."""
    from vision_transformer_detector_tpu.parallel.data import (
        process_batch_indices)
    from vision_transformer_detector_tpu.parallel.mesh import create_mesh

    assert process_batch_indices(create_mesh(data=8, model=1), 16) \
        == range(0, 16)
    assert process_batch_indices(create_mesh(data=4, model=2), 8) \
        == range(0, 8)
    assert process_batch_indices(create_mesh(data=1, model=8), 4) \
        == range(0, 4)


def test_synced_eval_batches_pads_ragged_tail():
    """Single-process degenerate case of the multi-process lockstep eval
    rounds: a ragged final batch is padded up to the data-axis device
    count with inert rows (zero images, EMPTY_SLOT labels) and the valid
    mask marks the real rows."""
    from vision_transformer_detector_tpu.config import (
        EMPTY_SLOT_VALUE, DetectorConfig)
    from vision_transformer_detector_tpu.parallel.data import (
        synced_global_eval_batches)

    cfg = DetectorConfig(image_size=(8, 8), max_objects=3)
    mesh = create_mesh(data=4, model=2)
    stream = [
        (np.ones((4, 8, 8, 3), np.float32), np.ones((4, 3, 6), np.float32)),
        (np.ones((2, 8, 8, 3), np.float32), np.ones((2, 3, 6), np.float32)),
    ]
    rounds = list(synced_global_eval_batches(mesh, stream))
    assert len(rounds) == 2
    images, labels, valid = rounds[1]
    assert images.shape == (4, 8, 8, 3)
    assert images.sharding.spec[0] == DATA_AXIS
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False,
                                                      False])
    np.testing.assert_array_equal(np.asarray(images[2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(labels[2:]), EMPTY_SLOT_VALUE)
    np.testing.assert_array_equal(np.asarray(labels[:2]), 1.0)
    # Full rounds pass through untouched.
    _, _, valid0 = rounds[0]
    assert np.asarray(valid0).all()
    # An empty iterator yields nothing (and does not raise).
    assert list(synced_global_eval_batches(mesh, [])) == []


def test_process_shard_spec_single_process():
    from vision_transformer_detector_tpu.parallel.data import (
        process_shard_spec)

    mesh = create_mesh(data=4, model=2)
    shard_index, num_shards, local = process_shard_spec(mesh, 8)
    # One process: it holds the whole batch.
    assert (shard_index, num_shards, local) == (0, 1, 8)
    # Non-divisible global batch fails loudly, not with a bogus spec.
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        process_shard_spec(mesh, 5)


def test_synced_eval_batches_zero_row_batch_is_not_exhaustion():
    """A yielded zero-row batch mid-stream must be skipped, not treated
    as end-of-data (round-4 review: it terminated the rounds early and
    the eval silently scored a truncated dataset)."""
    from vision_transformer_detector_tpu.parallel.data import (
        synced_global_eval_batches)

    mesh = create_mesh(data=4, model=2)
    stream = [
        (np.ones((4, 8, 8, 3), np.float32), np.ones((4, 3, 6), np.float32)),
        (np.ones((0, 8, 8, 3), np.float32), np.ones((0, 3, 6), np.float32)),
        (np.ones((3, 8, 8, 3), np.float32), np.ones((3, 3, 6), np.float32)),
    ]
    rounds = list(synced_global_eval_batches(mesh, stream))
    assert len(rounds) == 2, "the batches AROUND the empty one both score"
    _, _, valid = rounds[1]
    np.testing.assert_array_equal(np.asarray(valid),
                                  [True, True, True, False])


def test_process_shard_spec_rejects_unaligned_rows(monkeypatch):
    """Unaligned/unequal per-process rows cannot be expressed as a
    strided image_paths[i::n] shard; the old floor division handed a
    process with rows [4,16) of 16 the ENTIRE dataset (shard 0 of 1)
    while its peer loaded a quarter — now it refuses loudly."""
    import pytest

    from vision_transformer_detector_tpu.parallel import data as pdata

    mesh = create_mesh(data=4, model=2)
    monkeypatch.setattr(pdata, "process_batch_indices",
                        lambda m, g: range(4, 16))
    with pytest.raises(NotImplementedError, match="aligned"):
        pdata.process_shard_spec(mesh, 16)


def test_create_mesh_validates_sizes():
    """Mesh-shape validation must survive `python -O` (these were
    asserts) and fail with a clear message, not a numpy reshape error."""
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        create_mesh(model=3)          # 8 virtual devices
    with pytest.raises(ValueError, match="available devices"):
        create_mesh(data=3, model=2)
