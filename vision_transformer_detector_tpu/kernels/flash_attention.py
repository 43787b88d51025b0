"""Pallas TPU flash attention (forward).

Replaces the reference's ``keras.layers.MultiHeadAttention`` O(N^2)
materialised-scores attention (vision_transformer_detector.py:364-369) with
a blockwise streaming-softmax kernel: scores never leave VMEM, statistics
(running max / normaliser) are carried in fp32, and the P@V accumulation
uses the MXU with fp32 accumulation. Sequence lengths in this framework are
196 (224px/p16) .. 4096 (1024px/p16) tokens — K and V for one (batch, head)
fit comfortably in VMEM, so the kernel streams K/V blocks from a
VMEM-resident copy rather than DMA-pipelining from HBM.

Numerics contract: inputs are (B, N, H, K) with any scaling (1/sqrt(K))
already applied by the caller; output matches
``softmax(q k^T) v`` computed in fp32 to ~1e-2 in bf16 / ~1e-5 in fp32.

The plain-JAX oracle lives in models/vit_detector.py (_attention's einsum
path); tests/test_kernels.py checks the kernel against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *,
                  block_kv: int, seq_len: int):
    """One (batch*head, q-block) program: stream KV blocks, keep running
    softmax statistics in fp32."""
    q = q_ref[0].astype(jnp.float32)            # (block_q, K)
    block_q = q.shape[0]
    kv_total = k_ref.shape[1]
    num_kv = kv_total // block_kv

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]

        s = jnp.dot(q, k.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)  # (bq, bkv)

        # Mask out KV padding beyond the real sequence length.
        kv_pos = (i * block_kv
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_kv), 1))
        s = jnp.where(kv_pos < seq_len, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc_new = acc_prev * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 256, block_kv: int = 256,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Blockwise attention over (B, N, H, K) tensors -> (B, N, H, K).

    Pads N to the block size and K to the MXU-friendly 64 minimum; zero
    head-dim padding is exact (contributes nothing to q.k or p@v), KV
    padding is masked in-kernel. Differentiable: the backward pass
    recomputes attention per (batch, head) group with fp32 statistics
    (see _flash_bwd), so training composes with jax.grad/checkpoint.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_attention_vjp(q, k, v, block_q, block_kv, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_vjp(q, k, v, block_q, block_kv, interpret):
    return _flash_forward(q, k, v, block_q, block_kv, interpret)


def _flash_fwd(q, k, v, block_q, block_kv, interpret):
    out = _flash_forward(q, k, v, block_q, block_kv, interpret)
    return out, (q, k, v)


def _flash_bwd(block_q, block_kv, interpret, residuals, g):
    """Attention backward, recomputed per (batch*head) chunk.

    Standard softmax-attention gradients with fp32 softmax statistics:
      p  = softmax(q k^T)          ds = p * (dp - rowsum(dp * p))
      dv = p^T g                   dq = ds k,  dk = ds^T q
    Memory is bounded by chunking the fused batch*head axis through
    lax.map (one N x N score block per head at a time). A dedicated Pallas
    backward kernel can replace this without touching callers.
    """
    q, k, v = residuals
    b, n, h, kdim = q.shape

    def to_bh(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, kdim)

    qf, kf, vf, gf = (to_bh(t) for t in (q, k, v, g))

    def one_head(args):
        qi, ki, vi, gi = args
        s = jnp.dot(qi.astype(jnp.float32), ki.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        dv = jnp.dot(p.T.astype(gi.dtype), gi,
                     preferred_element_type=jnp.float32)
        dp = jnp.dot(gi.astype(jnp.float32), vi.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds.astype(qi.dtype), ki,
                     preferred_element_type=jnp.float32)
        dk = jnp.dot(ds.T.astype(qi.dtype), qi,
                     preferred_element_type=jnp.float32)
        return (dq.astype(qi.dtype), dk.astype(ki.dtype),
                dv.astype(vi.dtype))

    dqf, dkf, dvf = jax.lax.map(one_head, (qf, kf, vf, gf))

    def from_bh(t):
        return t.reshape(b, h, n, kdim).transpose(0, 2, 1, 3)

    return from_bh(dqf), from_bh(dkf), from_bh(dvf)


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def _flash_forward(q, k, v, block_q, block_kv, interpret):
    b, n, h, kdim = q.shape
    block_q = min(block_q, _round_up(n, 128))
    block_kv = min(block_kv, _round_up(n, 128))
    n_pad = _round_up(n, max(block_q, block_kv))
    k_pad_dim = max(64, _round_up(kdim, 64))

    def prep(t):
        t = t.transpose(0, 2, 1, 3).reshape(b * h, n, kdim)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, k_pad_dim - kdim)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    grid = (b * h, n_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, block_kv=block_kv, seq_len=n)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, k_pad_dim), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, k_pad_dim), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, k_pad_dim), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, k_pad_dim), lambda bh, i: (bh, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, k_pad_dim), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * kdim,
            bytes_accessed=3 * b * h * n * kdim * q.dtype.itemsize
            + b * h * n * kdim * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :n, :kdim].reshape(b, h, n, kdim)
    return out.transpose(0, 2, 1, 3)


def reference_attention(q: jnp.ndarray, k: jnp.ndarray,
                        v: jnp.ndarray) -> jnp.ndarray:
    """Materialised-softmax oracle (the einsum path the kernel replaces)."""
    scores = jnp.einsum("bnhk,bmhk->bhnm", q.astype(jnp.float32),
                        k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bmhk->bnhk", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
