"""Pallas TPU fused dense + bias + mish kernel.

The encoder/head "pyramids" are chains of Dense->Mish layers
(vision_transformer_detector.py:388-399, 468-486). XLA usually fuses the
elementwise epilogue into the matmul; this kernel makes the fusion explicit
and guarantees a single VMEM round-trip: tiles of X and W are matmul'd on
the MXU with fp32 accumulation in scratch, and the bias + mish epilogue is
applied in-register on the final K step before the only write to the output
tile.

Oracle: ``mish(x @ w + b)`` in plain jnp; tests/test_kernels.py compares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def _ffn_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, apply_mish: bool):
    k_step = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k_step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(k_step == num_k - 1)
    def _():
        out = acc_ref[...] + b_ref[...].astype(jnp.float32)
        if apply_mish:
            out = _mish_f32(out)
        o_ref[...] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("apply_mish", "block_m", "block_n", "block_k",
                     "interpret"))
def fused_dense_mish(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     apply_mish: bool = True,
                     block_m: int = 256, block_n: int = 256,
                     block_k: int = 512,
                     interpret: bool | None = None) -> jnp.ndarray:
    """``mish(x @ w + b)`` with x (..., K), w (K, N), b (N,).

    Leading axes of x are flattened into the row dimension; padding to tile
    multiples is applied and sliced away (zero rows/cols are exact).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    *lead, k_dim = x.shape
    n_dim = w.shape[1]
    m_dim = 1
    for d in lead:
        m_dim *= d
    x2 = x.reshape(m_dim, k_dim)

    bm = min(block_m, _round_up(m_dim, 8))
    bn = min(block_n, _round_up(n_dim, 128))
    bk = min(block_k, _round_up(k_dim, 128))
    m_pad = _round_up(m_dim, bm)
    n_pad = _round_up(n_dim, bn)
    k_pad = _round_up(k_dim, bk)

    x2 = jnp.pad(x2, ((0, m_pad - m_dim), (0, k_pad - k_dim)))
    wp = jnp.pad(w, ((0, k_pad - k_dim), (0, n_pad - n_dim)))
    bp = jnp.pad(b, (0, n_pad - n_dim)).reshape(1, n_pad)

    grid = (m_pad // bm, n_pad // bn, k_pad // bk)
    kernel = functools.partial(_ffn_kernel, apply_mish=apply_mish)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, s: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_dim * n_dim * k_dim,
            bytes_accessed=(m_dim * k_dim + k_dim * n_dim + m_dim * n_dim)
            * x.dtype.itemsize,
            transcendentals=m_dim * n_dim if apply_mish else 0,
        ),
        interpret=interpret,
    )(x2, wp, bp)

    return out[:m_dim, :n_dim].reshape(*lead, n_dim)
