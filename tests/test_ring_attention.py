"""Ring attention (context parallelism) vs full-attention oracle on the
virtual 8-device mesh."""

import jax
import jax.numpy as jnp
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
