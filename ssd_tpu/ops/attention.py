"""Paged-KV attention: cache scatter + gather-based reference implementations.

This module is the XLA-native equivalent of the reference's native attention
surface (SURVEY §2.2 N1-N3):
 - `store_kv`    ~ Triton store_kvcache_kernel (/root/reference/ssd/layers/attention.py:10-41)
 - `paged_attention` (Q=1)      ~ sgl_kernel flash_attn_with_kvcache decode
 - `paged_attention` (Q=K+1)    ~ multi-query verify/glue attention
 - `tree_attention`             ~ FlashInfer paged tree attention with custom mask
   (/root/reference/ssd/engine/model_runner.py:159-206), except the mask is
   computed analytically from (context_len, fan_idx, step) instead of a packed
   bitmask.

These are the *reference* jnp paths: correct for any backend, used for CPU
tests and as the numerics oracle. The Pallas TPU kernels in
`ssd_tpu.ops.pallas` implement the same contracts fused; the runner picks per
backend.

KV cache layout (per model): [L, H_kv, S, 2*hd] with S = num_blocks *
block_size flat slots and K/V INTERLEAVED on the minor axis (K in lanes
[0, hd), V in [hd, 2*hd)). slot_mapping indexes the S axis directly, the layer
dimension scans with the transformer layers, and every (head, page) is a
contiguous [block_size, 2*hd] tile. The interleaving makes the minor dimension
2*hd >= 128 for hd >= 64, which is what the TPU wants: Mosaic can only DMA
HBM slices whose minor dim is lane-tile (128) aligned, so a [page, hd=64]
slice is unDMA-able while [page, 128] streams at full bandwidth — and one
copy moves both K and V.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssd_tpu.ops.spec_math import tree_attention_mask

# int8 KV cache (Config.kv_quant="int8"): the cache is the pytree
# (data int8 [L, H_kv, S, 2*hd], scales f32 [L, H_kv, 2, S]) — symmetric
# per-(token, head, K/V-half) quantization, scale = amax/127. Halves the
# attention's HBM reads, which is what bounds decode at long context. Every
# op below accepts either form of `kv_layer` (one layer's slice); the Pallas
# kernels dequantize in-register with the scales pre-gathered per attended
# position (a ~6% byte overhead next to the halved KV reads).


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray):
    """[T, H, hd] x2 -> (qk, qv int8, sk, sv f32 [T, H])."""

    def q1(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)                 # [T, H]
        s = jnp.maximum(amax / 127.0, 1e-10)
        qx = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        return qx, s

    qk, sk = q1(k)
    qv, sv = q1(v)
    return qk, qv, sk, sv


def store_kv(
    kv_layer,                  # [H_kv, S, 2*hd] | (int8 data, scales) tuple
    k: jnp.ndarray,            # [T, H_kv, hd]
    v: jnp.ndarray,            # [T, H_kv, hd]
    slot_mapping: jnp.ndarray,  # [T] int32; negative = ghost (skip)
):
    """Scatter new [K|V] rows into flat cache slots; ghost slots are dropped.

    Negative slots are remapped out-of-bounds so XLA's scatter `drop` mode
    skips them (the reference kernel's slot==-1 semantics). One scatter moves
    both K and V thanks to the interleaved layout.
    """
    if isinstance(kv_layer, tuple):
        data, scales = kv_layer
        S = data.shape[1]
        slots = jnp.where(slot_mapping < 0, S, slot_mapping)
        qk, qv, sk, sv = quantize_kv(k, v)
        val = jnp.concatenate([qk, qv], axis=-1).transpose(1, 0, 2)
        data = data.at[:, slots].set(val, mode="drop")
        sval = jnp.stack([sk, sv], axis=-1).transpose(1, 2, 0)  # [H, 2, T]
        scales = scales.at[:, :, slots].set(sval, mode="drop")
        return (data, scales)
    S = kv_layer.shape[1]
    slots = jnp.where(slot_mapping < 0, S, slot_mapping)
    val = jnp.concatenate([k, v], axis=-1).transpose(1, 0, 2)  # [H, T, 2hd]
    return kv_layer.at[:, slots].set(val, mode="drop")


def gather_pages(
    kv_layer,                   # [H_kv, S, 2*hd] | (int8 data, scales)
    block_tables: jnp.ndarray,  # [B, M] int32 (entries may be -1 padding)
    block_size: int,
    ctx_pad: int,               # static gather length (multiple of block_size)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the first ctx_pad context slots per sequence.

    Returns (k, v) each [B, ctx_pad, H_kv, hd] (dequantized f32 for the int8
    cache). Out-of-table positions gather block -1 -> clamped; callers must
    mask by context_lens.
    """
    data = kv_layer[0] if isinstance(kv_layer, tuple) else kv_layer
    hd = data.shape[-1] // 2
    pos = jnp.arange(ctx_pad, dtype=jnp.int32)
    blk_idx = pos // block_size
    blk_off = pos % block_size
    blk_ids = block_tables[:, blk_idx]                  # [B, ctx_pad]
    slots = jnp.clip(blk_ids, 0) * block_size + blk_off  # [B, ctx_pad]
    kv = data[:, slots].transpose(1, 2, 0, 3)            # [B, ctx_pad, H, 2hd]
    if isinstance(kv_layer, tuple):
        s = kv_layer[1][:, :, slots].transpose(2, 3, 0, 1)  # [B, C, H, 2]
        kvf = kv.astype(jnp.float32)
        return kvf[..., :hd] * s[..., 0:1], kvf[..., hd:] * s[..., 1:2]
    return kv[..., :hd], kv[..., hd:]


def gather_scales(
    kv_layer,                   # (int8 data, scales) tuple
    block_tables: jnp.ndarray,  # [B, M]
    block_size: int,
    ctx_pad: int,
) -> jnp.ndarray:
    """Per-attended-position scales [B, H_kv, 2, ctx_pad] f32 for the Pallas
    int8 kernels (the kernels DMA the int8 pages themselves; the scales ride
    this one small XLA gather — lane-aligned blocks, ~6% of the int8 KV
    bytes)."""
    scales = kv_layer[1]
    pos = jnp.arange(ctx_pad, dtype=jnp.int32)
    blk_ids = block_tables[:, pos // block_size]
    slots = jnp.clip(blk_ids, 0) * block_size + pos % block_size  # [B, C]
    return scales[:, :, slots].transpose(2, 0, 1, 3)     # [B, Hkv, 2, C]


def dense_pages(
    kv_layer,                   # [H_kv, S, 2*hd] | (int8 data, scales)
    pages: jnp.ndarray,         # [P] flat page ids (may be -1)
    block_size: int,
) -> jnp.ndarray:
    """Dense packed per-page context stream [H_kv, P*block_size, 2*hd]
    (dequantized for the int8 cache) — the one-gather front end of the
    prefill attention paths."""
    if isinstance(kv_layer, tuple):
        data, scales = kv_layer
        Hkv, S, hd2 = data.shape
        hd = hd2 // 2
        p = jnp.clip(pages, 0)
        dq = data.reshape(Hkv, S // block_size, block_size, hd2)[
            :, p
        ].reshape(Hkv, pages.shape[0] * block_size, hd2).astype(jnp.float32)
        s = scales.reshape(Hkv, 2, S // block_size, block_size)[
            :, :, p
        ].reshape(Hkv, 2, pages.shape[0] * block_size)
        return jnp.concatenate(
            [dq[..., :hd] * s[:, 0, :, None], dq[..., hd:] * s[:, 1, :, None]],
            axis=-1,
        )
    Hkv, S, hd2 = kv_layer.shape
    return kv_layer.reshape(Hkv, S // block_size, block_size, hd2)[
        :, jnp.clip(pages, 0)
    ].reshape(Hkv, pages.shape[0] * block_size, hd2)


def _gqa_scores(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q: [B, Q, Hq, hd], k: [B, C, Hkv, hd] -> scores [B, Hq, Q, C] fp32."""
    B, Q, Hq, hd = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(B, Q, Hkv, G, hd)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bqhgd,bchd->bhgqc", qf, kf) * scale
    return scores.reshape(B, Hkv * G, Q, -1)


def _weighted_values(probs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """probs: [B, Hq, Q, C], v: [B, C, Hkv, hd] -> out [B, Q, Hq, hd]."""
    B, Hq, Q, C = probs.shape
    Hkv = v.shape[2]
    hd = v.shape[3]
    G = Hq // Hkv
    pf = probs.reshape(B, Hkv, G, Q, C)
    vf = v.astype(jnp.float32)
    out = jnp.einsum("bhgqc,bchd->bqhgd", pf, vf)
    return out.reshape(B, Q, Hq, hd)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis with a boolean mask (True = attend), fp32.

    Fully-masked rows produce zeros (not NaN)."""
    neg = jnp.asarray(-1e30, scores.dtype)
    scores = jnp.where(mask, scores, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(mask, e, 0.0)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.clip(s, min=1e-30)


def paged_attention(
    q: jnp.ndarray,             # [B, Q, Hq, hd]
    kv_layer: jnp.ndarray,      # [2, S, Hkv, hd]
    block_tables: jnp.ndarray,  # [B, M]
    context_lens: jnp.ndarray,  # [B] total attended length (incl. new tokens)
    block_size: int,
    ctx_pad: int,
    scale: float,
    qeff: jnp.ndarray | None = None,  # [B] true queries per seq (default Q)
) -> jnp.ndarray:
    """Causal multi-query paged attention.

    Query i of a sequence (i in [0,Q)) attends to context positions
    [0, context_len - qeff + i]; Q=1 is single-token decode, Q=K+1 is verify /
    glue decode, Q=2K+1 with per-seq qeff is the EAGLE packed glue (padding
    queries i >= qeff produce well-defined garbage the caller discards). New
    tokens must already be in the cache (store_kv first), matching the
    reference ordering (attention.py:82-83).
    """
    B, Q, Hq, hd = q.shape
    k, v = gather_pages(kv_layer, block_tables, block_size, ctx_pad)
    scores = _gqa_scores(q, k, scale)  # [B, Hq, Q, C]

    qe = jnp.full((B,), Q, jnp.int32) if qeff is None else qeff
    pos = jnp.arange(ctx_pad)[None, None, :]                       # [1,1,C]
    limit = (context_lens[:, None] - qe[:, None] + jnp.arange(Q)[None, :])
    mask = (pos <= limit[:, :, None]) & (pos < context_lens[:, None, None])
    probs = masked_softmax(scores, mask[:, None, :, :])
    out = _weighted_values(probs, v)                               # [B,Q,Hq,hd]
    return out.astype(q.dtype)


def prefill_attention(
    q: jnp.ndarray,             # [1, S_new, Hq, hd] one sequence's new tokens
    kv_layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # [1, M]
    context_len: jnp.ndarray,   # [] total length incl. new tokens
    num_new: jnp.ndarray,       # [] true number of new tokens (<= S_new)
    block_size: int,
    ctx_pad: int,
    scale: float,
) -> jnp.ndarray:
    """Causal prefill attention for one (possibly prefix-cached) sequence.

    New token j (j in [0,num_new)) sits at absolute position
    context_len - num_new + j and attends to [0, that position]. Padding
    queries (j >= num_new) are masked but produce well-defined zeros.
    """
    S_new = q.shape[1]
    k, v = gather_pages(kv_layer, block_tables, block_size, ctx_pad)
    scores = _gqa_scores(q, k, scale)  # [1, Hq, S_new, C]
    pos = jnp.arange(ctx_pad)[None, None, :]
    q_abs = context_len - num_new + jnp.arange(S_new)              # [S_new]
    mask = pos <= q_abs[None, :, None]
    probs = masked_softmax(scores, mask[:, None, :, :])
    out = _weighted_values(probs, v)
    return out.astype(q.dtype)


def tree_attention(
    q: jnp.ndarray,             # [B, MQ_LEN, Hq, hd]
    kv_layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, M]
    context_lens: jnp.ndarray,  # [B] attended length at this step
    fan_idx_rows: jnp.ndarray,  # [B, MQ_LEN] glue depth per tree row
    step: int,
    K: int,
    block_size: int,
    ctx_pad: int,
    scale: float,
) -> jnp.ndarray:
    """Draft tree-decode attention over N = B * MQ_LEN forks sharing trunk KV.

    The mask (prefix-ones | glue-tril | per-step diagonals) is computed
    analytically from four integers per row — no packed bitmask.
    """
    MQ_LEN = q.shape[1]
    k, v = gather_pages(kv_layer, block_tables, block_size, ctx_pad)
    scores = _gqa_scores(q, k, scale)
    mask = tree_attention_mask(context_lens, step, fan_idx_rows, K, MQ_LEN, ctx_pad)
    probs = masked_softmax(scores, mask[:, None, :, :])
    out = _weighted_values(probs, v)
    return out.astype(q.dtype)


def flat_prefill_attention(
    q: jnp.ndarray,         # [T, Hq, hd] flat new tokens of the whole batch
    dense_kv: jnp.ndarray,  # [Hkv, Cflat, 2*hd] packed per-seq context runs
    row_lo: jnp.ndarray,    # [T] first flat context index each token sees
    row_hi: jnp.ndarray,    # [T] one past the last (its own causal position)
    scale: float,
) -> jnp.ndarray:
    """jnp oracle for the flat-packed ragged prefill: every token attends the
    half-open flat-context interval [row_lo, row_hi) — the interval encodes
    BOTH the same-sequence restriction (each sequence's pages occupy a
    contiguous run of the packed stream) and causality (hi = run start +
    causal limit + 1). Padding tokens carry lo == hi == 0 and produce zeros.
    Replaces the reference's flash_attn_varlen_func cu_seqlens contract
    (/root/reference/ssd/layers/attention.py:90-93) in packed-page form."""
    T, Hq, hd = q.shape
    Hkv = dense_kv.shape[0]
    G = Hq // Hkv
    k = dense_kv[..., :hd]                                   # [Hkv, C, hd]
    v = dense_kv[..., hd:]
    qg = q.reshape(T, Hkv, G, hd)
    scores = jnp.einsum(
        "thgd,hcd->thgc", qg.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale                                                # [T,Hkv,G,C]
    col = jnp.arange(dense_kv.shape[1])[None, :]
    mask = (col >= row_lo[:, None]) & (col < row_hi[:, None])  # [T, C]
    s = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    # Rows with empty intervals (padding) would softmax to NaN; zero them.
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask[:, None, None, :].any(-1, keepdims=True), p, 0.0)
    out = jnp.einsum("thgc,hcd->thgd", p, v.astype(jnp.float32))
    return out.reshape(T, Hq, hd).astype(q.dtype)
