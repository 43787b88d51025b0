"""Pallas TPU fused LayerNorm: one VMEM round-trip per activation.

XLA lowers ``_layer_norm`` (models/vit_detector.py) into a convert+
reduce pass (mean/var) plus a normalize pass — the activation streams
from HBM at least twice. The round-5 trace attribution put these
convert+reduce fusions at ~22% of flagship inference device time
(PERFORMANCE.md round-5 MFU note), making LN the largest non-matmul
consumer. This kernel keeps a ``(rows, D)`` tile RESIDENT in VMEM:
the stats reduction and the normalize epilogue run on the same tile,
so each activation element is read from HBM once and written once.

Numerics: all math in fp32, identical formulas to the XLA path (keras
LayerNormalization parity — eps 1e-3 default, two-pass variance); only
the reduction association can differ, bounded by the usual ~1-2 ulp.

Routing contract (models/vit_detector._layer_norm):
  * opt-in via ``DetectorConfig.use_fused_layer_norm`` (default off),
  * inference only (``train=False``) — no VJP is defined here; the
    training path keeps XLA's differentiable LN,
  * the normalized axis D must be a multiple of the 128-lane MXU width
    (768/1024 flagships qualify; the reference's D=28 would waste ~4.5x
    on padding and stays on XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiling import round_up


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (normed * g_ref[...].astype(jnp.float32)
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_rows", "interpret"))
def fused_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray,
                     beta: jnp.ndarray, eps: float = 1e-3,
                     block_rows: int = 256,
                     interpret: bool | None = None) -> jnp.ndarray:
    """LayerNorm over the last axis of ``x`` (..., D), D % 128 == 0.

    Leading axes flatten into the row dimension; rows pad to the tile
    multiple and are sliced away (padded zero rows normalize to
    ``beta`` under the eps guard — finite, then discarded). Output
    dtype follows ``x`` like the XLA path.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    *lead, d = x.shape
    if d % 128 != 0:
        raise ValueError(
            f"fused_layer_norm needs the normalized axis to be a "
            f"multiple of 128 lanes, got D={d} — route this shape "
            "through the XLA layer norm instead")
    rows = 1
    for dim in lead:
        rows *= dim
    if rows == 0:
        return x  # empty batch: nothing to normalize (XLA-path parity)
    x2 = x.reshape(rows, d)
    # Block rows: multiple of the 8-sublane fp32 tile (Mosaic rejects
    # smaller second-minor dims on real hardware), then equalized over
    # the block count so a near-empty last block doesn't waste up to
    # bm-1 rows of compute (e.g. 1600 rows at bm=256 would pad to 1792;
    # equalizing gives 7 x 232 = 1624).
    bm = round_up(min(block_rows, round_up(rows, 8)), 8)
    n_blocks = -(-rows // bm)
    bm = round_up(-(-rows // n_blocks), 8)
    rows_pad = n_blocks * bm
    x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    g2 = gamma.reshape(1, d)
    b2 = beta.reshape(1, d)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * d,  # two reduces + normalize chain
            bytes_accessed=2 * rows * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, g2, b2)
    return out[:rows].reshape(*lead, d)
