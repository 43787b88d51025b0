"""Pallas TPU fused dense + bias + mish kernel.

The encoder/head "pyramids" are chains of Dense->Mish layers
(vision_transformer_detector.py:388-399, 468-486). XLA usually fuses the
elementwise epilogue into the matmul; this kernel makes the fusion explicit
and guarantees a single VMEM round-trip: a full-K weight tile sits RESIDENT
in VMEM while the activation tiles stream past it, the matmul accumulates
in fp32 on the MXU, and the bias + mish epilogue is applied in-register
before the only write of the output tile.

Schedule: grid = (N tiles OUTER, M tiles inner) with a full-K block — the
weight/bias index maps are constant over the inner axis so Pallas keeps
them in VMEM across all M tiles. An earlier (m, n, k) grid streamed the
whole weight matrix once per M tile: at batch 128 on the ViT pyramids that
was gigabytes of redundant HBM reads per layer call (the same pathology
quantization.py's fused kernel records fixing).

Gradients: a recompute-based custom VJP (plain-jnp backward: XLA fuses the
mish derivative into the two backward matmuls). Without it the pallas_call
failed Pallas AD lowering, so ``--fused-ffn`` crashed the first train step.

Oracle: ``mish(x @ w + b)`` in plain jnp; tests/test_kernels.py compares
values AND gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import round_up


def _mish_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def _ffn_kernel(x_ref, w_ref, b_ref, o_ref, *, apply_mish: bool):
    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.float32)
    out = acc + b_ref[...].astype(jnp.float32)
    if apply_mish:
        out = _mish_f32(out)
    o_ref[...] = out.astype(o_ref.dtype)


def _fused_forward(x, w, b, apply_mish, block_m, block_n, interpret):
    *lead, k_dim = x.shape
    n_dim = w.shape[1]
    m_dim = 1
    for d in lead:
        m_dim *= d
    x2 = x.reshape(m_dim, k_dim)

    itemsize = x.dtype.itemsize
    k_pad = round_up(k_dim, 128)
    # VMEM budget: the resident weight tile (k_pad x bn) is capped at
    # ~4 MB; wide contractions also shrink the M tile so the streaming
    # activation block (bm x k_pad) stays a few MB.
    if k_pad * itemsize > 2048 * 2:
        block_m = min(block_m, 128)
    budget_n = max(128, ((4 << 20) // max(k_pad * itemsize, 1))
                   // 128 * 128)
    bn = min(round_up(n_dim, 128), min(2048, budget_n), block_n)
    bm = min(block_m, round_up(m_dim, 8))
    m_pad = round_up(m_dim, bm)
    n_pad = round_up(n_dim, bn)

    x2 = jnp.pad(x2, ((0, m_pad - m_dim), (0, k_pad - k_dim)))
    wp = jnp.pad(w, ((0, k_pad - k_dim), (0, n_pad - n_dim)))
    bp = jnp.pad(b, (0, n_pad - n_dim)).reshape(1, n_pad)

    kernel = functools.partial(_ffn_kernel, apply_mish=apply_mish)

    out = pl.pallas_call(
        kernel,
        # N OUTER, M inner: W/bias blocks are constant over the inner
        # axis -> VMEM-resident while x tiles stream.
        grid=(n_pad // bn, m_pad // bm),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_dim * n_dim * k_dim,
            bytes_accessed=(m_dim * k_dim + k_dim * n_dim + m_dim * n_dim)
            * itemsize,
            transcendentals=m_dim * n_dim if apply_mish else 0,
        ),
        interpret=interpret,
    )(x2, wp, bp)

    return out[:m_dim, :n_dim].reshape(*lead, n_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_dense_mish(x, w, b, apply_mish, block_m, block_n, interpret):
    return _fused_forward(x, w, b, apply_mish, block_m, block_n, interpret)


def _fused_fwd(x, w, b, apply_mish, block_m, block_n, interpret):
    out = _fused_forward(x, w, b, apply_mish, block_m, block_n, interpret)
    return out, (x, w, b)


def _fused_bwd(apply_mish, block_m, block_n, interpret, residuals, g):
    """Recompute backward in plain jnp (fp32 accumulation): dz is the
    cotangent through the mish epilogue, then two matmuls. XLA fuses the
    derivative chain into the matmuls; the forward's Pallas win (one
    VMEM round-trip for the epilogue) has no backward counterpart worth
    a hand-written kernel at these shapes."""
    x, w, b = residuals
    *lead, k_dim = x.shape
    n_dim = w.shape[1]
    x2 = x.reshape(-1, k_dim)
    g2 = g.reshape(-1, n_dim).astype(jnp.float32)
    if apply_mish:
        z = (jnp.dot(x2, w, preferred_element_type=jnp.float32)
             + b.astype(jnp.float32))
        sp = jax.nn.softplus(z)
        t = jnp.tanh(sp)
        # d/dz [z * tanh(softplus(z))]
        dz = g2 * (t + z * (1.0 - t * t) * jax.nn.sigmoid(z))
    else:
        dz = g2
    dx = jnp.dot(dz, w.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    dw = jnp.dot(x2.T.astype(jnp.float32), dz,
                 preferred_element_type=jnp.float32)
    db = dz.sum(axis=0)
    return (dx.reshape(x.shape).astype(x.dtype),
            dw.astype(w.dtype), db.astype(b.dtype))


_fused_dense_mish.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("apply_mish", "block_m", "block_n", "block_k",
                     "interpret"))
def fused_dense_mish(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     apply_mish: bool = True,
                     block_m: int = 256, block_n: int = 512,
                     block_k: int = 512,
                     interpret: bool | None = None) -> jnp.ndarray:
    """``mish(x @ w + b)`` with x (..., K), w (K, N), b (N,).

    Leading axes of x are flattened into the row dimension; padding to
    tile multiples is applied and sliced away (zero rows/cols are exact).
    Differentiable (recompute VJP). ``block_k`` is accepted for
    backward-compat but unused: the schedule is full-K with a resident
    weight tile.
    """
    del block_k
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_dense_mish(x, w, b, apply_mish, block_m, block_n,
                             interpret)
