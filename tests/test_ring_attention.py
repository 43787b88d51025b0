"""Ring attention (context parallelism) vs full-attention oracle on the
virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from vision_transformer_detector_tpu.kernels.flash_attention import (
    reference_attention)
from vision_transformer_detector_tpu.kernels.ring_attention import (
    ring_attention)
from vision_transformer_detector_tpu.parallel.mesh import create_mesh


def _qkv(b, n, h, k, seed=0):
    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.random.normal(rngs[0], (b, n, h, k)),
            jax.random.normal(rngs[1], (b, n, h, k)),
            jax.random.normal(rngs[2], (b, n, h, k)))


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_matches_full_attention(ring):
    mesh = create_mesh(data=8 // ring, model=ring)
    q, k, v = _qkv(2, 64, 2, 16)
    out = ring_attention(q, k, v, mesh)
    expected = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


def test_ring_single_device_axis():
    """Degenerate ring of 1: no rotation."""
    mesh = create_mesh(data=8, model=1)
    q, k, v = _qkv(1, 32, 2, 8, seed=1)
    out = ring_attention(q, k, v, mesh)
    expected = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


def test_ring_rejects_indivisible_tokens():
    mesh = create_mesh(data=2, model=4)
    q, k, v = _qkv(1, 30, 2, 8)
    with pytest.raises(AssertionError):
        ring_attention(q, k, v, mesh)


def test_model_with_ring_attention_matches_plain():
    """forward() with config.ring_attention over the mesh == plain forward."""
    from vision_transformer_detector_tpu.config import DetectorConfig
    from vision_transformer_detector_tpu.models.vit_detector import (
        forward, init_params)
    from vision_transformer_detector_tpu.parallel.mesh import (
        batch_sharding, replicated)

    base = DetectorConfig(
        image_size=(64, 64), patch_size=16, embedding_dim=16, num_heads=2,
        key_dim=8, encoder_blocks=2, encoder_mlp_layers=2,
        head_last_units=16, head_layers=1)
    ring_cfg = base.replace(ring_attention=True)
    mesh = create_mesh(data=2, model=4)  # grid 4x4=16 tokens / ring of 4

    params = init_params(jax.random.PRNGKey(0), base)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3),
                                minval=-1, maxval=1)
    out_plain = forward(params, images, base)

    params_s = jax.device_put(params, replicated(mesh))
    images_s = jax.device_put(images, batch_sharding(mesh))
    out_ring = jax.jit(
        lambda p, x: forward(p, x, ring_cfg, mesh=mesh))(params_s, images_s)

    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_ring),
                               atol=3e-5, rtol=3e-5)


def test_trainer_with_ring_attention():
    """Full train step with CP attention through the Trainer."""
    from vision_transformer_detector_tpu.config import (
        DetectorConfig, LossConfig, TrainConfig)
    from vision_transformer_detector_tpu.train.trainer import Trainer

    cfg = DetectorConfig(
        image_size=(64, 64), patch_size=16, embedding_dim=16, num_heads=2,
        key_dim=8, encoder_blocks=1, encoder_mlp_layers=2,
        head_last_units=16, head_layers=1, ring_attention=True)
    mesh = create_mesh(data=2, model=4)
    trainer = Trainer(cfg, LossConfig(), TrainConfig(learning_rate=1e-3),
                      mesh=mesh)
    state = trainer.init_state()
    images = np.random.default_rng(0).uniform(
        -1, 1, (4, 64, 64, 3)).astype(np.float32)
    labels = np.full((4, cfg.max_objects, 6), -8.0, np.float32)
    labels[..., 0] = 0.0
    labels[:, 0] = (1, 3, 32.0, 32.0, 20.0, 20.0)
    images_j, labels_j = trainer._put_batch(images, labels)
    with mesh:
        _, loss = trainer.train_step(state, images_j, labels_j,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_highres_ring_preset_trains_on_mesh():
    """A miniaturised highres_1024_ring trains one step over a 4x2 mesh:
    the ring preset's full config surface (ring_attention + remat +
    multi-scale head) compiles and runs under SPMD."""
    import numpy as np

    from vision_transformer_detector_tpu.config import (
        LossConfig, TrainConfig, get_config)
    from vision_transformer_detector_tpu.train.trainer import Trainer

    config = get_config("highres_1024_ring").replace(
        image_size=(64, 64), embedding_dim=8, num_heads=2, key_dim=4,
        encoder_blocks=2, head_last_units=8, head_layers=2,
        compute_dtype="float32", head_scales=(1, 2))
    mesh = create_mesh(data=4, model=2)
    trainer = Trainer(config, LossConfig(), TrainConfig(learning_rate=1e-3),
                      mesh=mesh)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    labels = np.full((8, config.max_objects, 6), -8.0, np.float32)
    labels[..., 0] = 0.0
    labels[:, 0] = (1, 3, 32.0, 32.0, 16.0, 16.0)
    images, labels = trainer._put_batch(images, labels)
    with mesh:
        state, loss = trainer.train_step(state, images, labels,
                                         jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
