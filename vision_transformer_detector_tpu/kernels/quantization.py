"""Int8 weight quantization for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate; the
detector's FLOPs are overwhelmingly dense matmuls (encoder pyramid + head,
SURVEY.md §3.2 hot loop), so post-training int8 is the biggest serving
lever after batching. This module is OPT-IN and serving-only:

  * ``quantize_params(params)`` — walk the parameter pytree and replace
    every dense kernel with symmetric per-output-channel int8
    (``kernel_q`` int8 (in, out_flat) + ``scale`` fp32 (out_flat,); the
    bias array's shape encodes the static output block shape); biases,
    layer norms and the positional embedding stay fp32. Works on any
    param pytree from
    ``models.vit_detector.init_params`` (incl. MHA projection kernels,
    which are flattened to 2-D).
  * ``int8_dense(x, layer)`` — dynamic symmetric per-row activation
    quantization, int8 MXU matmul with int32 accumulation, fp32 rescale
    (+bias). The model's ``_dense``/attention projections dispatch here
    whenever a layer carries ``kernel_q`` (models/vit_detector.py), so the
    quantized pytree is a drop-in for ``forward``.

No reference counterpart (the reference has no serving or quantization
story); accuracy is guarded by tests/test_quantization.py: decode
agreement on random weights and AP retention on an overfit-trained model.

MEASURED RESULT (PERFORMANCE.md round 2): on this v5e via XLA
dot_general the int8 path is SLOWER end-to-end than bf16 (515 vs 241 ms
at 640px batch 128) — the dynamic per-row activation quantization
(fp32 amax/round/clip/cast over every big activation) costs more
bandwidth than the int8 MXU saves, and XLA does not fuse it into the
matmul producers. The path stays opt-in (accuracy-proven, drop-in) as
the substrate for a future fused Pallas int8 kernel (quantize-in-kernel,
no materialised int8 copies); do not enable it for speed on this chip.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_kernel(kernel: np.ndarray):
    """(in..., out...) kernel -> 2-D int8 + per-output-channel scales."""
    arr = np.asarray(kernel, np.float32)
    if arr.ndim == 3:        # MHA projection (D, H, K) or (H, K, D)
        # Flatten so the CONTRACTED side is first: q/k/v kernels contract
        # dim 0 (D); the output projection contracts (H, K) = dims 0-1.
        # Both flatten to (in_flat, out_flat) with row-major reshape when
        # the contracted dims lead; callers pass kernels contracted-first.
        in_dim = arr.shape[0]
        arr2 = arr.reshape(in_dim, -1)
        out_shape = arr.shape[1:]
    elif arr.ndim == 2:
        arr2 = arr
        out_shape = (arr.shape[1],)
    else:
        raise ValueError(f"cannot quantize kernel of rank {arr.ndim}")
    amax = np.max(np.abs(arr2), axis=0)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(arr2 / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32), out_shape


def _quantize_mha_out_kernel(kernel: np.ndarray):
    """Output projection (H, K, D): contracted dims are (H, K)."""
    arr = np.asarray(kernel, np.float32)
    h, k, d = arr.shape
    q, scale, _ = _quantize_kernel(arr.reshape(h * k, d))
    return q, scale, (d,)


def _quantize_dense_layer(layer: dict, mha_out: bool = False) -> dict:
    kernel = np.asarray(layer["kernel"])
    if mha_out:
        q, scale, out_shape = _quantize_mha_out_kernel(kernel)
    else:
        q, scale, out_shape = _quantize_kernel(kernel)
    bias = np.asarray(layer["bias"], np.float32)
    assert bias.shape == out_shape, (bias.shape, out_shape)
    # The output shape is NOT stored separately: it must stay jit-static,
    # and the bias array's shape already encodes it.
    return {
        "kernel_q": jnp.asarray(q),
        "scale": jnp.asarray(scale),
        "bias": jnp.asarray(bias),
    }


def quantize_params(params: Any) -> Any:
    """Parameter pytree -> drop-in quantized pytree for forward()."""
    out = {}
    out["linear_projection"] = _quantize_dense_layer(
        params["linear_projection"])
    out["position_embedding"] = params["position_embedding"]

    out["encoder"] = []
    for block in params["encoder"]:
        qblock = {
            "ln1": block["ln1"],
            "ln2": block["ln2"],
            "mha": {
                "query": _quantize_dense_layer(block["mha"]["query"]),
                "key": _quantize_dense_layer(block["mha"]["key"]),
                "value": _quantize_dense_layer(block["mha"]["value"]),
                "out": _quantize_dense_layer(block["mha"]["out"],
                                             mha_out=True),
            },
            "mlp": [_quantize_dense_layer(l) for l in block["mlp"]],
        }
        out["encoder"].append(qblock)

    if isinstance(params["head_token_dense"], list):
        out["head_token_dense"] = [
            _quantize_dense_layer(l) for l in params["head_token_dense"]]
    else:
        out["head_token_dense"] = _quantize_dense_layer(
            params["head_token_dense"])
    out["head_mlp"] = [_quantize_dense_layer(l) for l in params["head_mlp"]]
    out["head_output"] = _quantize_dense_layer(params["head_output"])
    return out


def int8_dense(x: jnp.ndarray, layer: dict) -> jnp.ndarray:
    """x @ kernel with dynamic per-row int8 activation quantization.

    Returns fp32 ``(..., *bias.shape)`` with bias added — the bias array's
    (static) shape defines the output block shape, e.g. (H, K) for MHA
    projections.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, layer["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)            # (..., out_flat)
    y = acc.astype(jnp.float32) * x_scale * layer["scale"]
    y = y + layer["bias"].reshape(-1)
    return y.reshape(x.shape[:-1] + layer["bias"].shape)


def is_quantized(layer: Any) -> bool:
    return isinstance(layer, dict) and "kernel_q" in layer


# ---------------------------------------------------------------------------
# Fused Pallas int8 dense (+mish): quantize-in-kernel
# ---------------------------------------------------------------------------

from .tiling import round_up as _round_up  # shared (round-4 dedup)


def _fused_int8_kernel(x_ref, w_ref, wscale_ref, bias_ref, o_ref, *,
                       apply_mish: bool):
    """One (M-tile, N-tile) program: dynamic per-row activation
    quantization IN VMEM (no HBM int8/fp32 copies), int8 MXU dot with
    int32 accumulation, fp32 rescale + bias (+ mish), cast out.

    The quantization is recomputed per N tile — its cost is
    ~3 elementwise ops per (row, k) vs 2*bn MACs, i.e. noise."""
    x = x_ref[...].astype(jnp.float32)            # (bm, K)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)         # (bm, bn)
    y = acc.astype(jnp.float32) * x_scale * wscale_ref[0][None, :]
    y = y + bias_ref[0][None, :]
    if apply_mish:
        y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[...] = y.astype(o_ref.dtype)


def fused_int8_dense(x: jnp.ndarray, layer: dict,
                     apply_mish: bool = False,
                     block_m: int = 256, block_n: int = 512,
                     interpret: bool | None = None) -> jnp.ndarray:
    """``(..., K) -> (..., N)`` through the fused quantize+int8-matmul
    kernel. Serving-only (no VJP). Requires a 2-D weight (plain dense
    layers; MHA projections keep the jnp path — they are a small FLOPs
    fraction)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    out_shape = layer["bias"].shape
    assert len(out_shape) == 1, "fused path handles 2-D weights only"
    n = out_shape[0]
    k = x.shape[-1]
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    # VMEM budget per program ~16 MB covers: x in bf16 + fp32 cast + int8
    # copy (~3.5 bytes/elem over bm x k_pad), the resident int8 weight
    # tile (k_pad x bn), and the int32 acc + fp32 y + bf16 out
    # (~10 bytes/elem over bm x bn). Shrink the M tile for wide
    # contractions and cap the weight tile at ~4 MB.
    k_pad = _round_up(k, 128)
    if k_pad > 2048:
        block_m = min(block_m, 128)
    m_pad = _round_up(max(m, 8), block_m)
    # The weight tile is the RESIDENT operand (outer grid axis): most
    # layers load W once while x tiles stream past it (an earlier version
    # streamed W per M tile — gigabytes of re-reads at batch 128).
    budget_n = max(128, ((4 << 20) // max(k_pad, 1)) // 128 * 128)
    # Honor the caller's block_n as a CAP on the auto-computed tile
    # (it was silently overwritten — review finding).
    block_n = min(_round_up(n, 128), min(2048, budget_n), block_n)
    n_pad = _round_up(n, block_n)

    xf = jnp.pad(x.reshape(m, k).astype(jnp.bfloat16),
                 ((0, m_pad - m), (0, k_pad - k)))
    wq = jnp.pad(layer["kernel_q"], ((0, k_pad - k), (0, n_pad - n)))
    # 8-sublane replication for the small per-channel rows (Mosaic tiles).
    wscale = jnp.broadcast_to(
        jnp.pad(layer["scale"], (0, n_pad - n))[None, :], (8, n_pad))
    bias = jnp.broadcast_to(
        jnp.pad(layer["bias"].astype(jnp.float32),
                (0, n_pad - n))[None, :], (8, n_pad))

    # Grid: N tiles OUTER, M tiles inner — the weight/scale/bias blocks'
    # index maps are constant over the inner axis, so Pallas keeps them
    # VMEM-resident while the x tiles stream.
    out = pl.pallas_call(
        functools.partial(_fused_int8_kernel, apply_mish=apply_mish),
        grid=(n_pad // block_n, m_pad // block_m),
        in_specs=[
            pl.BlockSpec((block_m, k_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.bfloat16),
        interpret=interpret,
    )(xf, wq, wscale, bias)

    return out[:m, :n].reshape(lead + (n,))
