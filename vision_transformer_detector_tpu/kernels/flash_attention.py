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

# dot_general dimension numbers (avoid explicit transposes in-kernel).
_CONTRACT_LAST = (((1,), (1,)), ((), ()))    # (a, K) x (b, K)  -> (a, b)
_CONTRACT_FIRST = (((0,), (0,)), ((), ()))   # (m, a) x (m, b)  -> (a, b)


def _keep_threshold(rate: float) -> int:
    """Static uint32 threshold: hash < threshold <=> keep."""
    return min(2 ** 32 - 1, int(round((1.0 - rate) * 4294967296.0)))


def dropout_keep_mask(seed, bh_idx, q_idx, k_idx, threshold: int):
    """Counter-based dropout mask: keep iff hash(seed, bh, qi, kj) < t.

    A murmur3-finalizer hash over the GLOBAL (batch*head, query, key)
    coordinates, so the mask is a pure function of position — the Pallas
    forward generates it per score block and the chunked jnp backward
    regenerates the IDENTICAL mask during recomputation (an in-kernel
    stateful PRNG could not be replayed outside the kernel). All
    arithmetic is uint32 with logical shifts, available in both Mosaic
    and XLA.
    """
    x = (jnp.asarray(seed).astype(jnp.uint32)
         + bh_idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         + q_idx.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
         + k_idx.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x < jnp.uint32(threshold)


def _flash_kernel(*refs, block_kv: int, seq_len: int,
                  dropout: tuple | None = None, with_lse: bool = False):
    """One (batch*head, q-block) program: stream KV blocks, keep running
    softmax statistics in fp32.

    MXU dots run on the INPUT dtype with fp32 accumulation: for bf16
    inputs this is bit-identical to casting bf16->fp32 first (bf16 is a
    subset of fp32) but uses the fast bf16 MXU path instead of the
    multi-pass fp32 matmul (measured ~2x kernel speedup on v5e).

    ``dropout=(threshold, inv_keep)`` enables keras-MHA probability
    dropout (vtd.py:364-369 semantics) fused in-kernel: the softmax
    normaliser accumulates the UNdropped probabilities (dropout applies
    to the normalised distribution: out = sum(mask*p~*v)/keep / sum(p~)),
    and the counter-based mask (dropout_keep_mask) keys off the global
    (batch*head, query, key) position so the chunked backward replays it
    exactly. A seed scalar arrives as an extra leading SMEM ref.
    """
    if dropout is not None:
        seed_ref, q_ref, k_ref, v_ref, *out_refs = refs
        threshold, inv_keep = dropout
    else:
        q_ref, k_ref, v_ref, *out_refs = refs
    if with_lse:
        o_ref, lse_ref = out_refs
    else:
        (o_ref,) = out_refs
    q = q_ref[0]                                # (block_q, K), input dtype
    block_q = q.shape[0]
    kv_total = k_ref.shape[1]
    num_kv = kv_total // block_kv
    if dropout is not None:
        # program_id must be read OUTSIDE the fori_loop body: the
        # interpret-mode grid emulator does not rewrite it inside nested
        # jaxprs.
        bh_idx = jnp.uint32(pl.program_id(0))
        q_base = pl.program_id(1) * block_q

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :]

        s = jax.lax.dot_general(
            q, k, _CONTRACT_LAST,
            preferred_element_type=jnp.float32)  # (bq, bkv) fp32

        # Mask out KV padding beyond the real sequence length.
        kv_pos = (i * block_kv
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (block_q, block_kv), 1))
        s = jnp.where(kv_pos < seq_len, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        if dropout is not None:
            q_pos = (q_base
                     + jax.lax.broadcasted_iota(
                         jnp.int32, (block_q, block_kv), 0))
            keep = dropout_keep_mask(
                seed_ref[0], bh_idx, q_pos, kv_pos, threshold)
            # Multiply (not jnp.where): a where with a weak-typed scalar
            # branch trips an MLIR cache bug in interpret-mode lowering
            # on the virtual multi-device CPU platform.
            p = p * (keep.astype(jnp.float32) * inv_keep)
        acc_new = acc_prev * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[-1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)
    if with_lse:
        # The normaliser l accumulates UNdropped probabilities (see the
        # dropout note above), so m + log(l) is the true logsumexp —
        # the residual the Pallas backward needs — regardless of the
        # dropout switch. Stored 8-sublane-replicated: Mosaic requires
        # block sublane dims divisible by 8.
        lse = m + jnp.log(l)
        lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _fused_bwd_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, *,
                      block_q: int, seq_len: int):
    """Single-pass flash backward: one (batch*head, kv-tile) program emits
    this tile's dk/dv AND accumulates every query block's dq contribution.

    Compared to round 1's separate dq + dkv kernels this computes the
    score block once per (q, kv) tile pair instead of twice (5 matmuls vs
    7) and reads q/g/k/v/lse/delta once instead of twice. dq is a
    full-length fp32 output block whose index map ignores the kv grid
    axis, so Pallas keeps it VMEM-resident across the sequential kv steps
    (init at the first step, accumulate in place, flush when the
    batch*head row changes).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    k = k_ref[0]                       # (bkv, K), input dtype
    v = v_ref[0]
    in_dtype = k.dtype
    block_kv = k.shape[0]
    q_total = q_ref.shape[1]
    num_q = q_total // block_q

    kv_base = j * block_kv
    kv_pos = kv_base + jax.lax.broadcasted_iota(
        jnp.int32, (block_kv, block_q), 0)
    valid = kv_pos < seq_len

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        g = g_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]

        # All 5 MXU dots take input-dtype operands with fp32 accumulation;
        # p/ds are cast back to the input dtype before their dots (the
        # standard flash-v2 backward recipe — same cast the chunked
        # recomputation applies).
        s_t = jax.lax.dot_general(
            k, q, _CONTRACT_LAST, preferred_element_type=jnp.float32)
        s_t = jnp.where(valid, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse[None, :])          # (bkv, bq) fp32
        dv_acc = dv_acc + jnp.dot(
            p_t.astype(in_dtype), g,
            preferred_element_type=jnp.float32)     # (bkv, K)
        dp_t = jax.lax.dot_general(
            v, g, _CONTRACT_LAST, preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - delta[None, :])        # (bkv, bq) fp32
        ds_c = ds_t.astype(in_dtype)
        dk_acc = dk_acc + jnp.dot(
            ds_c, q, preferred_element_type=jnp.float32)    # (bkv, K)
        dq_blk = jax.lax.dot_general(
            ds_c, k, _CONTRACT_FIRST,
            preferred_element_type=jnp.float32)     # (bq, K)
        dq_ref[0, pl.ds(i * block_q, block_q), :] += dq_blk
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_kv, k.shape[-1]), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (zeros, zeros))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


from .tiling import round_up as _round_up  # shared (round-4 dedup)


def _auto_blocks(n: int) -> tuple[int, int]:
    """Default (block_q, block_kv) for sequence length n.

    Measured on v5e (tools/bench_attention_bwd.py / PERFORMANCE.md round
    2): the kv fori_loop and a fine q grid cost more than they save at
    the sequence lengths this framework sees (196..4k tokens), so prefer
    ONE kv block and the largest q block whose fp32 score tile fits a
    ~12 MB VMEM budget without padding the query axis by more than 25%
    (4.04 -> 1.65 ms at the ViT-L/16 640px shape).

    Unpadded whole-row schedule (round 3b): when n is already
    sublane-aligned (multiple of 16 covers both fp32 and bf16 tiles) and
    one (n, n) fp32 score tile fits the VMEM budget, run a single
    n-sized block with ZERO padding — Mosaic masks the partial lane
    vregs natively, which beats materialising padded q/k/v copies in
    HBM every call: 2.27 -> 1.39 ms at N=576 (ViT-B/16 b64) and
    1.55 -> 1.35 ms at N=1600 (ViT-L/16 b8), tools/ ad-hoc sweep +
    kernel gates.
    """
    if n >= 128 and n % 16 == 0 and 4 * n * n <= 12 * 1024 * 1024:
        return n, n
    n128 = _round_up(n, 128)
    block_kv = min(n128, 2048)
    if n128 > 2048:
        # Guard the KV axis against padding waste too (the q axis always
        # had this guard): n=2304 with block_kv=2048 padded K/V to 4096 —
        # 78% masked work. Largest candidate whose padding stays small.
        for cand in (2048, 1024, 512, 256, 128):
            if _round_up(n, cand) <= 1.125 * n128:
                block_kv = cand
                break
    budget_rows = (12 * 1024 * 1024) // (4 * block_kv) // 128 * 128
    for cand in (n128, 2048, 1024, 512, 256):
        if cand <= min(budget_rows, n128) and _round_up(n, cand) <= 1.25 * n128:
            return cand, block_kv
    return min(256, n128), block_kv


# Backward implementation selector: the fused Pallas backward (logsumexp
# residuals, one kernel emitting dq/dk/dv) vs the per-head chunked jnp
# recomputation. Both are numerics-tested; the default is chosen by TPU
# measurement (PERFORMANCE.md kernel-selection notes). The flag is
# resolved to a STATIC argument at call time — round-1's global-only read
# was invisible to jit caches, so flipping it mid-process silently reused
# the previously traced backward.
USE_PALLAS_BACKWARD = False


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int | None = None, block_kv: int | None = None,
                    interpret: bool | None = None,
                    use_pallas_backward: bool | None = None,
                    layout: str = "bnhk",
                    dropout_rate: float | None = None,
                    dropout_seed=None,
                    bwd_variant: str = "fp32") -> jnp.ndarray:
    """Blockwise attention; in/out layout per ``layout``.

    ``layout="bnhk"``: (B, N, H, K) tensors (the historical contract —
    requires an internal transpose to the kernel's (B*H, N, K) shape).
    ``layout="bhnk"``: (B, H, N, K) tensors — heads-major, so folding to
    the kernel shape is a FREE reshape; callers that can produce
    heads-major projections avoid 4 transposes per attention call
    (models/vit_detector.py does).

    Pads the query axis to a multiple of block_q, the KV axis to a
    multiple of block_kv (independently) and K to the MXU-friendly 64
    minimum; zero head-dim padding is exact (contributes nothing to q.k
    or p@v), KV padding is masked in-kernel. Block sizes default to the
    measured-best policy for the sequence length (_auto_blocks).
    Differentiable: the backward pass either recomputes attention per
    (batch, head) group with fp32 statistics (chunked) or runs the fused
    Pallas backward (see _flash_bwd), so training composes with
    jax.grad/checkpoint.

    ``dropout_rate``/``dropout_seed`` enable in-kernel probability
    dropout (training path; keras-MHA semantics). The mask is a pure
    function of (seed, batch*head, query, key) position
    (dropout_keep_mask), so the chunked backward — forced when dropout
    is on; the Pallas backward has no dropout schedule — replays it
    exactly during recomputation.

    ``bwd_variant`` selects the chunked backward's bandwidth shape
    (ignored by the Pallas backward):
      * ``"fp32"`` (default) — fp32 score/probability intermediates,
        softmax-gradient rowsum computed as rowsum(dp * p).
      * ``"delta"`` — flash-v2 delta trick: recompute o = pd @ v and
        use rowsum(g * o) for the softmax-gradient correction, trading
        an N x N fp32 elementwise+reduce for an N x K matmul.
      * ``"bf16_delta"`` — delta trick plus bf16 probability streaming:
        p/dp round through bf16 after fp32 accumulation, halving the
        N x N traffic the fusion pipeline moves (the delta rowsum stays
        fp32 via the N x K path, so no long bf16 reductions).
    """
    if layout not in ("bnhk", "bhnk"):
        raise ValueError(f"unknown layout {layout!r}")
    n = q.shape[1] if layout == "bnhk" else q.shape[2]
    if block_q is None or block_kv is None:
        auto_q, auto_kv = _auto_blocks(n)
        block_q = auto_q if block_q is None else block_q
        block_kv = auto_kv if block_kv is None else block_kv
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if use_pallas_backward is None:
        use_pallas_backward = USE_PALLAS_BACKWARD
    if dropout_rate in (None, 0.0):
        seed = jnp.zeros((1,), jnp.uint32)
        rate = None
    else:
        rate = float(dropout_rate)
        if not 0.0 < rate < 1.0:
            raise ValueError(
                f"dropout_rate must be in (0, 1), got {rate} (1.0 would "
                "drop everything; larger values wrap the keep threshold)")
        if dropout_seed is None:
            raise ValueError("dropout_rate needs a dropout_seed")
        seed = jnp.asarray(dropout_seed).astype(jnp.uint32).reshape((1,))
        use_pallas_backward = False
    if bwd_variant not in ("fp32", "delta", "bf16_delta"):
        raise ValueError(f"unknown bwd_variant {bwd_variant!r}")
    return _flash_attention_vjp(q, k, v, seed, block_q, block_kv,
                                interpret, bool(use_pallas_backward),
                                layout, rate, bwd_variant)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _flash_attention_vjp(q, k, v, seed, block_q, block_kv, interpret,
                         use_pallas_backward, layout, rate, bwd_variant):
    return _flash_forward(q, k, v, block_q, block_kv, interpret,
                          layout=layout, rate=rate, seed=seed)


def _flash_fwd(q, k, v, seed, block_q, block_kv, interpret,
               use_pallas_backward, layout, rate, bwd_variant):
    if use_pallas_backward:
        out, lse = _flash_forward(q, k, v, block_q, block_kv, interpret,
                                  with_lse=True, layout=layout)
        return out, (q, k, v, seed, out, lse)
    out = _flash_forward(q, k, v, block_q, block_kv, interpret,
                         layout=layout, rate=rate, seed=seed)
    return out, (q, k, v, seed, None, None)


def _flash_bwd(block_q, block_kv, interpret, use_pallas_backward, layout,
               rate, bwd_variant, residuals, g):
    import numpy as np

    q, k, v, seed, out, lse = residuals
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    if use_pallas_backward:
        dq, dk, dv = _flash_bwd_pallas(q, k, v, out, lse, g,
                                       block_q, block_kv, interpret,
                                       layout)
        return dq, dk, dv, seed_ct
    dq, dk, dv = _flash_bwd_chunked((q, k, v), g, layout, rate=rate,
                                    seed=seed, variant=bwd_variant)
    return dq, dk, dv, seed_ct


def _flash_bwd_pallas(q, k, v, out, lse, g, block_q, block_kv, interpret,
                      layout: str = "bnhk"):
    """Fused single-kernel flash backward with saved logsumexp.

    delta = rowsum(g * out) (the softmax-jacobian correction) is cheap
    elementwise jnp; one kernel over (batch*head, kv-tile) emits dk/dv per
    tile and grid-accumulates dq in a VMEM-resident fp32 output block
    (round-1's separate dq/dkv kernels recomputed every score block twice
    and streamed the operands twice). All statistics fp32.
    """
    heads_major = layout == "bhnk"
    if heads_major:
        b, h, n, kdim = q.shape
    else:
        b, n, h, kdim = q.shape
    bh = b * h
    block_q = min(block_q, _round_up(n, 128))
    block_kv = min(block_kv, _round_up(n, 128))
    n_pad_q = _round_up(n, block_q)
    n_pad_kv = _round_up(n, block_kv)
    k_pad = max(64, _round_up(kdim, 64))

    def prep(t, n_pad):
        if not heads_major:
            t = t.transpose(0, 2, 1, 3)
        t = t.reshape(bh, n, kdim)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, k_pad - kdim)))

    qf, gf = prep(q, n_pad_q), prep(g, n_pad_q)
    kf, vf = prep(k, n_pad_kv), prep(v, n_pad_kv)
    # delta per query row; zero on padded rows since g is zero there.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if not heads_major:
        delta = delta.transpose(0, 2, 1)
    delta = delta.reshape(bh, n)
    delta = jnp.pad(delta, ((0, 0), (0, n_pad_q - n)))
    # 8-sublane replication (Mosaic tile constraints; see _flash_kernel's lse path)
    delta = jnp.broadcast_to(delta[:, None, :], (bh, 8, n_pad_q))
    # lse is padded to the FORWARD call's query padding; re-pad to this
    # call's (the paddings may differ when block sizes do).
    lse_p = lse[:, :, :n]
    lse_p = jnp.pad(lse_p, ((0, 0), (0, 0), (0, n_pad_q - n)))

    full_row_spec = pl.BlockSpec((1, 8, n_pad_q),
                                 lambda bh_, j: (bh_, 0, 0),
                                 memory_space=pltpu.VMEM)
    tile_kv = pl.BlockSpec((1, block_kv, k_pad), lambda bh_, j: (bh_, j, 0),
                           memory_space=pltpu.VMEM)
    full_q = pl.BlockSpec((1, n_pad_q, k_pad), lambda bh_, j: (bh_, 0, 0),
                          memory_space=pltpu.VMEM)

    # Large (e.g. whole-row) score tiles overflow Mosaic's default 16 MB
    # scoped-vmem stack; raise the per-kernel limit when the fp32 score
    # tile alone nears it (measured: full 1664x1664 blocks need ~17 MB
    # total — Mosaic reuses buffers, so 4x the score tile is generous).
    params = None
    if not interpret:
        score_bytes = 4 * block_q * block_kv
        if 4 * score_bytes > 12 * 1024 * 1024:
            params = pltpu.CompilerParams(
                vmem_limit_bytes=min(100 * 1024 * 1024,
                                     max(32 * 1024 * 1024, 4 * score_bytes)))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, block_q=block_q, seq_len=n),
        grid=(bh, n_pad_kv // block_kv),
        in_specs=[full_q, tile_kv, tile_kv, full_q, full_row_spec,
                  full_row_spec],
        # dq's index map ignores the kv axis: the block stays VMEM-resident
        # and accumulates across the sequential kv steps.
        out_specs=(full_q, tile_kv, tile_kv),
        out_shape=(jax.ShapeDtypeStruct((bh, n_pad_q, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((bh, n_pad_kv, k_pad), k.dtype),
                   jax.ShapeDtypeStruct((bh, n_pad_kv, k_pad), v.dtype)),
        interpret=interpret,
        compiler_params=params,
    )(qf, kf, vf, gf, lse_p, delta)

    def unprep(t, dtype):
        t = t[:, :n, :kdim].reshape(b, h, n, kdim)
        if not heads_major:
            t = t.transpose(0, 2, 1, 3)
        return t.astype(dtype)

    return (unprep(dq, q.dtype), unprep(dk, k.dtype), unprep(dv, v.dtype))


# Per-iteration fp32 score memory budget for the chunked backward. Swept
# on v5e at the ViT-L/16 640px shape (tools/bench_attention_bwd.py):
# groups 1/2/4 are within noise (2.77-2.83 ms), 8+ falls off a cliff
# (8.5 ms — the grouped N x N fp32 blocks spill); so ~3 x 4 x N^2 x group
# must stay under ~100 MB. At small N (windowed attention: 256-token
# windows fold to a huge batch*head axis) a group of 1 instead drowns in
# lax.map iteration overhead — 2048 sequential 256x256 backwards traced
# at 192 ms/step on the 1024px preset.
_CHUNK_BUDGET_BYTES = 96 * 1024 * 1024
# Group only as much as needed to keep the lax.map iteration count at or
# below this — grouping beyond that adds reshape overhead for nothing
# (measured: ViT-S/16 (bh=48) trains 5.15 ms ungrouped vs 6.47 ms at
# group 24; the 1024px windowed preset (bh=2048) needs grouping or its
# backward is 192 ms of loop overhead).
_CHUNK_MAX_ITERATIONS = 128


def _chunk_group(bh: int, n: int, score_buffers: int = 3) -> int:
    budget = max(1, _CHUNK_BUDGET_BYTES // (score_buffers * 4 * n * n))
    target = -(-bh // _CHUNK_MAX_ITERATIONS)
    group = max(1, min(target, budget, bh))
    while bh % group:
        group -= 1
    return group


def _flash_bwd_chunked(residuals, g, layout: str = "bnhk",
                       rate: float | None = None, seed=None,
                       variant: str = "fp32"):
    """Attention backward, recomputed per (batch*head) chunk.

    Standard softmax-attention gradients with fp32 softmax statistics:
      p  = softmax(q k^T)          ds = p * (dp - rowsum(dp * p))
      dv = p^T g                   dq = ds k,  dk = ds^T q
    Memory is bounded by chunking the fused batch*head axis through
    lax.map (_chunk_group heads' N x N score blocks at a time).

    ``variant`` (see flash_attention's ``bwd_variant``): "delta" swaps
    the rowsum(dp * p) correction for the flash-v2 delta
    rowsum(g * (pd @ v)) — an N x K matmul instead of an N x N fp32
    elementwise+reduce; "bf16_delta" additionally streams p/dp through
    bf16 after their fp32 accumulations, halving the N x N bytes the
    fusion pipeline moves (safe because the only long reduction, the
    delta, runs over the K axis in fp32).

    With in-kernel dropout (``rate``/``seed``), the forward's mask is
    replayed from the global coordinates (dropout_keep_mask is a pure
    function of position) and the gradient chain becomes, with
    Pd = mask * p / keep:
      dv = Pd^T g
      dpm = mask/keep * (g v^T)
      ds = p * (dpm - rowsum(p * dpm))
    which is exactly autodiff through dropout-after-softmax.
    """
    q, k, v = residuals
    heads_major = layout == "bhnk"
    if heads_major:
        b, h, n, kdim = q.shape
    else:
        b, n, h, kdim = q.shape
    bh = b * h
    # The dropout replay adds a keep-mask + scale array per score block
    # (~2 more N x N buffers live at once) — shrink the group to keep the
    # same HBM budget.
    group = _chunk_group(bh, n, score_buffers=5 if rate is not None else 3)

    def to_bh(t):
        if not heads_major:
            t = t.transpose(0, 2, 1, 3)
        t = t.reshape(bh, n, kdim)
        return t.reshape(bh // group, group, n, kdim)

    qf, kf, vf, gf = (to_bh(t) for t in (q, k, v, g))
    bh_idx = jnp.arange(bh, dtype=jnp.uint32).reshape(bh // group, group)

    batch_last = (((2,), (2,)), ((0,), (0,)))   # (g,n,K)x(g,m,K)->(g,n,m)
    batch_mid = (((1,), (1,)), ((0,), (0,)))    # (g,n,m)x(g,n,K)->(g,m,K)
    batch_lm = (((2,), (1,)), ((0,), (0,)))     # (g,n,m)x(g,m,K)->(g,n,K)

    if rate is not None:
        threshold = _keep_threshold(rate)
        inv_keep = 1.0 / (1.0 - rate)
        pos = jnp.arange(n, dtype=jnp.uint32)

    use_delta = variant in ("delta", "bf16_delta")
    score_dtype = jnp.bfloat16 if variant == "bf16_delta" else jnp.float32

    def heads(args):
        qi, ki, vi, gi, bhi = args
        # Input-dtype operands + fp32 accumulation (fast MXU path for
        # bf16; identical numerics to the former bf16->fp32 upcast).
        s = jax.lax.dot_general(qi, ki, batch_last,
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(score_dtype)
        dp = jax.lax.dot_general(gi, vi, batch_last,
                                 preferred_element_type=jnp.float32
                                 ).astype(score_dtype)
        if rate is not None:
            keep = dropout_keep_mask(
                seed[0], bhi[:, None, None], pos[None, :, None],
                pos[None, None, :], threshold)
            scale = jnp.where(keep, inv_keep, 0.0).astype(score_dtype)
            dp = dp * scale
            pd = p * scale
        else:
            pd = p
        dv = jax.lax.dot_general(pd.astype(gi.dtype), gi, batch_mid,
                                 preferred_element_type=jnp.float32)
        if use_delta:
            # Flash-v2 delta: rowsum(p * dp) == rowsum(g * (pd @ v)),
            # including the dropout-scaled case (both sides reduce
            # pd * (g v^T)). The N x K matmul and fp32 K-axis rowsum
            # replace an N x N fp32 elementwise+reduce.
            o = jax.lax.dot_general(pd.astype(vi.dtype), vi, batch_lm,
                                    preferred_element_type=jnp.float32)
            delta = jnp.sum(gi.astype(jnp.float32) * o, axis=-1,
                            keepdims=True)
            ds = p * (dp - delta.astype(score_dtype))
        else:
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(qi.dtype)
        dq = jax.lax.dot_general(dsc, ki, batch_lm,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc, qi, batch_mid,
                                 preferred_element_type=jnp.float32)
        return (dq.astype(qi.dtype), dk.astype(ki.dtype),
                dv.astype(vi.dtype))

    dqf, dkf, dvf = jax.lax.map(heads, (qf, kf, vf, gf, bh_idx))

    def from_bh(t):
        t = t.reshape(b, h, n, kdim)
        return t if heads_major else t.transpose(0, 2, 1, 3)

    return from_bh(dqf), from_bh(dkf), from_bh(dvf)


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def _flash_forward(q, k, v, block_q, block_kv, interpret,
                   with_lse: bool = False, layout: str = "bnhk",
                   rate: float | None = None, seed=None):
    heads_major = layout == "bhnk"
    if heads_major:
        b, h, n, kdim = q.shape
    else:
        b, n, h, kdim = q.shape
    # Query and KV paddings are independent: q/o pad to a multiple of
    # block_q, k/v to a multiple of block_kv. (A shared padding forced
    # n_pad // block_q to under-cover queries whenever block_kv > block_q.)
    block_q = min(block_q, _round_up(n, 128))
    block_kv = min(block_kv, _round_up(n, 128))
    n_pad_q = _round_up(n, block_q)
    n_pad_kv = _round_up(n, block_kv)
    k_pad_dim = max(64, _round_up(kdim, 64))

    def prep(t, n_pad):
        if not heads_major:
            t = t.transpose(0, 2, 1, 3)
        t = t.reshape(b * h, n, kdim)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, k_pad_dim - kdim)))

    qp = prep(q, n_pad_q)
    kp, vp = prep(k, n_pad_kv), prep(v, n_pad_kv)

    grid = (b * h, n_pad_q // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, k_pad_dim), lambda bh, i: (bh, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad_kv, k_pad_dim), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad_kv, k_pad_dim), lambda bh, i: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_tile = pl.BlockSpec(
        (1, block_q, k_pad_dim), lambda bh, i: (bh, i, 0),
        memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * b * h * n * n * kdim,
        bytes_accessed=3 * b * h * n * kdim * q.dtype.itemsize
        + b * h * n * kdim * q.dtype.itemsize,
        transcendentals=b * h * n * n,
    )

    if with_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel, block_kv=block_kv,
                              seq_len=n, with_lse=True),
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_tile,
                       pl.BlockSpec((1, 8, block_q),
                                    lambda bh, i: (bh, 0, i),
                                    memory_space=pltpu.VMEM)),
            out_shape=(
                jax.ShapeDtypeStruct((b * h, n_pad_q, k_pad_dim), q.dtype),
                jax.ShapeDtypeStruct((b * h, 8, n_pad_q), jnp.float32)),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp)
        out = out[:, :n, :kdim].reshape(b, h, n, kdim)
        if not heads_major:
            out = out.transpose(0, 2, 1, 3)
        return out, lse

    dropout = None
    inputs = (qp, kp, vp)
    if rate is not None:
        dropout = (_keep_threshold(rate), 1.0 / (1.0 - rate))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (seed,) + inputs
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_kv=block_kv, seq_len=n,
                          dropout=dropout),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_tile,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad_q, k_pad_dim), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*inputs)

    out = out[:, :n, :kdim].reshape(b, h, n, kdim)
    if not heads_major:
        out = out.transpose(0, 2, 1, 3)
    return out


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
